"""BPE merge induction: the learned merge sequence must equal a
pure-Python Sennrich reference exactly (ties included), be
partitioning-independent, and encoding must reproduce the reference
segmentation losslessly with token counts shrinking as merges grow."""

from __future__ import annotations

import re
from collections import Counter

from big_data_analytics_final_project_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    word_counts,
)

from .conftest import require_classic


def _ref_tokens(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return [w for w in t.split(" ") if w]


def _replace_lr(sym: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _ref_train(docs, n_merges, min_freq):
    wc: Counter = Counter()
    for _, text in docs:
        wc.update(_ref_tokens(text))
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, c in wc.items():
            sym = vocab[w]
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        best, w_best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if w_best < min_freq:
            break
        merges.append(best)
        a, b = best
        for w in vocab:
            vocab[w] = _replace_lr(vocab[w], a, b)
    return merges


def _ref_encode(word: str, merges) -> list[str]:
    sym = list(word)
    for a, b in merges:
        sym = _replace_lr(sym, a, b)
    return sym


_DOCS = [
    (0, "low lower lowest slow slower"),
    (1, "new newer newest news renew"),
    (2, "low low low new new slow"),
    (3, "the newest lower news is slow"),
]


def _df(spark, docs, n_partitions=8):
    return spark.createDataFrame(
        docs, "doc_id: bigint, text: string"
    ).repartition(n_partitions)


def test_merge_sequence_matches_reference_exactly(spark):
    for n_merges, min_freq in ((8, 2), (20, 1), (5, 4)):
        got = bpe_train(_df(spark, _DOCS), "text", n_merges, min_freq)
        want = _ref_train(_DOCS, n_merges, min_freq)
        assert got == want, (n_merges, min_freq, got, want)


def test_merges_partitioning_independent(spark):
    one = bpe_train(_df(spark, _DOCS, 1), "text", 10, 2)
    many = bpe_train(_df(spark, _DOCS, 16), "text", 10, 2)
    assert one == many


def test_local_and_distributed_training_identical(spark):
    """r18 two-level training: the size-gated driver-local path and
    the distributed merge rounds (forced via local_max_words=0) must
    produce bit-identical merge sequences — same argmax tie-break,
    same left-to-right merge semantics."""
    df = _df(spark, _DOCS)
    for n_merges, min_freq in ((8, 2), (20, 1), (5, 4)):
        local = bpe_train(df, "text", n_merges, min_freq)
        dist = bpe_train(
            df, "text", n_merges, min_freq, local_max_words=0
        )
        want = _ref_train(_DOCS, n_merges, min_freq)
        assert local == dist == want, (n_merges, min_freq)


def test_encode_matches_reference_and_is_lossless(spark):
    merges = bpe_train(_df(spark, _DOCS), "text", 12, 2)
    enc = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_encode(_df(spark, _DOCS), "doc_id", "text", merges).collect()
    }
    for doc_id, text in _DOCS:
        want = []
        for w in _ref_tokens(text):
            want.extend(_ref_encode(w, merges))
        assert enc[doc_id] == want, doc_id
        # lossless: concatenation reproduces the normalized words
        assert "".join(enc[doc_id]) == "".join(_ref_tokens(text))


def test_more_merges_fewer_tokens(spark):
    df = _df(spark, _DOCS)
    m4 = bpe_train(df, "text", 4, 1)
    m16 = bpe_train(df, "text", 16, 1)

    def total(merges):
        enc = bpe_encode(df, "doc_id", "text", merges)
        return enc.selectExpr("sum(size(bpe_tokens)) AS n").collect()[0].n

    assert total(m16) < total(m4)
    # merge lists are prefix-consistent: the greedy argmax path is
    # unique given the deterministic tie-break
    assert m16[:4] == m4


def test_corpus_bpe_merges_matches_reference_at_both_scales(spark):
    """The r12-slated ROWS-ONLY graded twin (queries/text.py
    corpus_bpe_merges): its (rank, a, b) relation must equal the
    pure-Python Sennrich reference run on the SAME real corpus, at
    both registry scales — the strongest check available for a query
    whose iterative induction has no relational oracle."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.text import (
        _BPE_N_MERGES,
        corpus_bpe_merges,
    )

    from .conftest import SF_CORRECT, SF_SMOKE

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        ref_docs = con.execute(
            f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
        ).fetchall()
        con.close()
        want = _ref_train(ref_docs, _BPE_N_MERGES, min_freq=2)
        rows = corpus_bpe_merges(spark, sf).collect()
        assert [r.rank for r in rows] == list(range(1, len(want) + 1))
        assert [(r.a, r.b) for r in rows] == want, sf


def test_real_documents_train_encode_smoke(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    merges = bpe_train(docs, "text", n_merges=16, min_freq=2)
    assert len(merges) == 16  # real text has ≥16 frequent pairs
    enc = bpe_encode(docs, "doc_id", "text", merges)
    wc = word_counts(docs, "text").selectExpr(
        "sum(cnt * length(word)) AS chars"
    ).collect()[0].chars
    n_tok = enc.selectExpr("sum(size(bpe_tokens)) AS n").collect()[0].n
    assert 0 < n_tok < wc  # strictly compressed vs character tokens
    # lossless on a sample of docs
    sample = enc.limit(50).collect()
    texts = {
        r.doc_id: r.text
        for r in docs.filter(
            docs.doc_id.isin([r.doc_id for r in sample])
        ).collect()
    }
    for r in sample:
        assert "".join(r.bpe_tokens) == "".join(_ref_tokens(texts[r.doc_id]))


def test_train_leaves_no_persisted_blocks(spark):
    """The per-round localCheckpoint must free the previous round's
    blocks: without the unpersist hook, n_merges vocab-sized block
    sets pile up in storage memory for the life of the session
    (measured 3-4x slowdowns on unrelated queries sharing the bench
    session)."""
    require_classic(spark)
    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    merges = bpe_train(_df(spark, _DOCS), "text", 10, 2)
    assert merges  # trained something, so checkpoints did happen
    # <= (not ==): an unrelated pre-existing persisted RDD may be
    # ContextCleaner-collected mid-train in a shared session
    assert n_persistent() <= before


def test_frozen_merge_list_matches_sf0001_training(spark):
    """`corpus_bpe_encode`'s frozen tokenizer model must BE the live
    training output on the sf0.001 corpus — the pin that lets the
    encode twin's driver-graded oracle row vouch transitively for
    `corpus_bpe_merges` (whose induction has no relational oracle)."""
    from big_data_analytics_final_project_spark.queries.text import (
        _BPE_FROZEN_MERGES,
        _BPE_N_MERGES,
    )

    from .conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    live = bpe_train(docs, "text", n_merges=_BPE_N_MERGES, min_freq=2)
    assert live == list(_BPE_FROZEN_MERGES)


def test_sql_bracket_encode_equals_encode_word():
    """The oracle's bracketed-symbol replace chain (queries/text.py
    _bpe_encode_word_sql) must segment exactly like the engine's
    `_encode_word` greedy loop, for every word — property-swept over
    random corpora whose merge lists come from the pure-Python
    trainer (so each list is VALID: parts exist when learned, the
    precondition of the rank-order-pass equivalence argument)."""
    import duckdb

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from big_data_analytics_final_project_spark.operators.bpe import (
        _encode_word,
    )
    from big_data_analytics_final_project_spark.queries import text as qt

    word = st.text(alphabet="abc01", min_size=1, max_size=8)

    @settings(max_examples=30, deadline=None)
    @given(
        corpus=st.lists(word, min_size=1, max_size=30),
        probes=st.lists(word, min_size=1, max_size=10),
        n_merges=st.integers(min_value=1, max_value=12),
    )
    def check(corpus, probes, n_merges):
        merges = _ref_train(
            [(0, " ".join(corpus))], n_merges, min_freq=1
        )
        ranks = {m: i for i, m in enumerate(merges)}
        # point _bpe_encode_word_sql at THIS merge list
        old = qt._BPE_FROZEN_MERGES
        qt._BPE_FROZEN_MERGES = tuple(merges)
        try:
            expr = qt._bpe_encode_word_sql("w")
        finally:
            qt._BPE_FROZEN_MERGES = old
        con = duckdb.connect()
        got = con.execute(
            f"SELECT string_split(trim({expr}, '<>'), '><')"
            " FROM (SELECT unnest(?) AS w)",
            [probes],
        ).fetchall()
        con.close()
        for w, (g,) in zip(probes, got):
            assert g == _encode_word(w, ranks), (w, merges)

    check()
