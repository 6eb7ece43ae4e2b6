"""Bigram LM scoring: bit-exact agreement of the integer NLL totals
with a pure-Python reference (same LUT, same smoothing — the
cross-engine contract), CCNet-style separation of gibberish from
corpus-like text, short-doc semantics, and the real-documents smoke."""

from __future__ import annotations

import re

from big_data_analytics_final_project_spark.operators.lm import (
    UNK,
    lm_score,
    lm_train,
    lm_train_score,
)
from big_data_analytics_final_project_spark.queries.text import (
    _QLOG_LUT,
    _QLOG_SCALE,
)


def _ref_qlog2(c: int) -> int:
    s = max(c.bit_length() - 11, 0)
    return _QLOG_LUT[(c >> s) - 1] + s * _QLOG_SCALE


def _ref_tokens(text: str) -> list[str]:
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")


def _ref_scores(docs: list[tuple[int, str]], vocab_k: int):
    """Mirror of lm_train_score: top-V vocab (freq desc, token asc),
    <unk> mapping, add-one bigrams, LUT NLL."""
    bgs = {
        d: list(zip(t, t[1:]))
        for d, t in ((d, _ref_tokens(x)) for d, x in docs)
    }
    from collections import Counter

    tok_counts = Counter()
    for pairs in bgs.values():
        for w1, w2 in pairs:
            tok_counts[w1] += 1
            tok_counts[w2] += 1
    vocab = {
        t
        for t, _ in sorted(tok_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_k
        ]
    }
    m = lambda w: w if w in vocab else UNK
    c12 = Counter()
    for pairs in bgs.values():
        for w1, w2 in pairs:
            c12[(m(w1), m(w2))] += 1
    c1 = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    # V' from the REALIZED vocab, not the requested vocab_k: on a
    # low-diversity corpus the fitted vocab is smaller, and smoothing
    # over phantom tokens would break per-context normalization.
    vp = len(vocab) + 1
    out = {}
    for d, pairs in bgs.items():
        if not pairs:
            out[d] = (0, None)
            continue
        total = sum(
            _ref_qlog2(c1[m(w1)] + vp) - _ref_qlog2(c12[(m(w1), m(w2))] + 1)
            for w1, w2 in pairs
        )
        out[d] = (len(pairs), total)
    return out


_CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug"),
    (2, "the cat and the dog sat"),
    (3, "on the mat sat the cat"),
    (4, "zq xv qqj zzk vxw plf"),  # gibberish: all-OOV at small V
    (5, "word"),  # 1 token -> 0 bigrams
    (6, ""),  # empty -> 1 empty token -> 0 bigrams
]


def _spark_scores(spark, docs, vocab_k):
    df = spark.createDataFrame(docs, "doc_id: bigint, text: string")
    rows = lm_train_score(df, vocab_k=vocab_k).collect()
    return {r.doc_id: (r.n_bigrams, r.nll_nanobits_total) for r in rows}


def test_matches_pure_python_reference_exactly(spark):
    # 64 and 4096 both exceed the corpus's ~15 distinct tokens, so they
    # pin the V'-from-realized-vocab rule (a vocab_k-derived V' would
    # smooth over phantom tokens and diverge from the reference here).
    for vocab_k in (4, 8, 64, 4096):
        got = _spark_scores(spark, _CORPUS, vocab_k)
        want = _ref_scores(_CORPUS, vocab_k)
        assert got == want, vocab_k


def test_gibberish_scores_worse(spark):
    """CCNet posture: train on the clean reference corpus, score
    held-out docs — corpus-like text must beat gibberish (a SELF-
    trained tiny-vocab model would launder gibberish through frequent
    <unk>-<unk> bigrams, which is why train and score are separate
    surfaces)."""
    train = spark.createDataFrame(
        [r for r in _CORPUS if r[0] <= 3], "doc_id: bigint, text: string"
    )
    vocab_k = 16
    vocab, unigrams, bigrams = lm_train(train, "doc_id", "text", vocab_k)
    held_out = spark.createDataFrame(
        [(10, "the cat sat on the rug"), (11, "zq xv qqj zzk vxw plf")],
        "doc_id: bigint, text: string",
    )
    rows = {
        r.doc_id: r.avg_nll_bits
        for r in lm_score(
            held_out, "doc_id", "text", vocab, unigrams, bigrams
        ).collect()
    }
    assert rows[11] > rows[10], rows


def test_short_docs_null_score(spark):
    got = _spark_scores(spark, _CORPUS, 8)
    assert got[5] == (0, None)
    assert got[6] == (0, None)


def test_train_invariants(spark):
    """Unigram counts are the bigram row-sums (so each smoothed context
    distribution normalizes), and vocab is exactly top-V deterministic."""
    df = spark.createDataFrame(_CORPUS, "doc_id: bigint, text: string")
    vocab, unigrams, bigrams = lm_train(df, "doc_id", "text", vocab_k=4)
    v = sorted(r.token for r in vocab.collect())
    # 'the' (8), 'sat' (~7), 'on' ... — just pin determinism + size
    assert len(v) == 4 and "the" in v
    uni = {r.w1: r.c1 for r in unigrams.collect()}
    from collections import Counter

    agg = Counter()
    for r in bigrams.collect():
        agg[r.w1] += r.c12
    assert uni == dict(agg)


def test_vocab_is_materialized_local(spark):
    """lm_train hands back the fitted vocab as a LOCAL relation (the
    r10-advice fix): its plan must not reach back to the corpus, so
    lm_score's V' count and the 4 mapping broadcasts cost nothing.
    A lazy vocab would show the bigram explode + aggregate here."""
    df = spark.createDataFrame(_CORPUS, "doc_id: bigint, text: string")
    vocab, _, _ = lm_train(df, "doc_id", "text", vocab_k=4)
    plan = vocab._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "ExistingRDD" in plan, plan
    assert "Generate" not in plan and "HashAggregate" not in plan, plan


def test_doc_lm_perplexity_matches_oracle(spark):
    """The r12-slated graded twin (queries/text.py doc_lm_perplexity):
    bit-exact against the full-pipeline DuckDB replay (top-V vocab,
    <unk> mapping, add-one bigrams, LUT NLL) at both scales — the
    registry bar, held here until its registration clears the
    rotation budget."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.text import (
        DOC_LM_PERPLEXITY_SQL,
        doc_lm_perplexity,
    )

    from .conftest import SF_CORRECT, SF_SMOKE
    from .parity import compare

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        compare(
            doc_lm_perplexity(spark, sf), con.sql(DOC_LM_PERPLEXITY_SQL)
        )
        con.close()


def test_real_documents_smoke(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = lm_train_score(docs, vocab_k=512)
    rows = out.collect()
    assert len(rows) == docs.count()
    scored = [r for r in rows if r.n_bigrams > 0]
    assert scored, "no scored docs"
    assert all(r.avg_nll_bits is not None and r.avg_nll_bits >= 0 for r in scored)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_lm_train_score_lazy_twin_row_identical(spark):
    """The r15 single-checkpointed-token-pass posture (lm_train_score
    materialize=True, documents scanned ONCE) must be value-identical
    to the lazy multi-scan shape plan tooling sees (lazy_results) —
    the same differential pin the curation capstone carries. Sorted
    collect compare: any drift the checkpoint introduces breaks here
    before it reaches the oracle gate."""
    from big_data_analytics_final_project_spark.operators.checkpoints import (
        lazy_results,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mat = lm_train_score(docs, vocab_k=64).orderBy("doc_id").collect()
    with lazy_results():
        lazy = lm_train_score(docs, vocab_k=64).orderBy("doc_id").collect()
    assert mat == lazy
