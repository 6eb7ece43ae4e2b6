"""BPE merge induction — corpus-scale tokenizer training (Sennrich,
Haddow & Birch, "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016), the step the tokenizer-adjacent queries stop short
of (queries/text.py `doc_bpe_token_stats` counts with a BPE-ish regex;
`corpus_bigram_topk` ranks merge CANDIDATES; this learns the actual
ordered merge list).

The scale trick is the classic one and it is what makes this a Spark
job instead of a driver loop: BPE statistics depend only on the
DISTINCT-WORD frequency relation, so one corpus scan builds
``(word, cnt)`` and every training round thereafter runs on that
vocab-sized frame — at 100 TB the corpus has ~10^11 tokens but ~10^7
distinct words; rounds never rescan the corpus. Each round is:

1. adjacent-pair counts: explode zip_with(symbols[:-1], symbols[1:])
   weighted by cnt — one hash agg on a vocab-sized frame;
2. argmax pair with DETERMINISTIC tie-break (count desc, then (a, b)
   lexicographic) — a 1-row TakeOrdered collect per round, the
   k-means per-iteration pattern (COLLECT_ALLOW-reasoned);
3. apply the merge: a left-to-right non-overlapping replace inside
   each word's symbol stream — the state is a DELIMITED STRING
   (every symbol wrapped in its own ``\\x01`` pair; tokens are
   [a-z0-9]+ so the separator cannot collide), which makes the merge
   ONE literal substring ``replace`` — map-only on the vocab frame,
   JVM expressions, no Python. (r17: formerly an ``F.aggregate``
   struct fold over a symbol array — per-round codegen of that fold
   was the largest driver-side cost of training, and its per-element
   struct allocation the largest executor-side one; the replace form
   measured ~1.4x faster end-to-end with bit-identical merges.)

Training is bit-deterministic (integer counts + total tie-break), so
the learned merge sequence equals a pure-Python Sennrich reference
exactly (test-pinned) and is partitioning-independent.

Encoding applies the ranked merges per word. That loop is inherently
sequential per word with data-dependent length — the genuinely-not-
expressible case — so `bpe_encode` runs it inside Arrow
``mapInPandas`` with a per-partition distinct-word cache (each
distinct word is encoded once per partition, the same skew-robust
shape as the dedup folds). A chained-expression encode would build an
n_merges-deep tree per row — the driver-analysis failure mode the LUT
migration measured (queries/text.py r9 notes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokens
from .checkpoints import unpersist_local_checkpoint


def _chars(word: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, 1),
    )


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """One corpus scan → the distinct-word frequency relation
    ``(word, cnt)`` BPE trains on. Empty-string tokens (blank docs
    normalize to one empty token) are excluded."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# Symbol-stream separator for the string-encoded training state (r17).
# Tokens are [a-z0-9]+ by construction (functions/text.py norm_text),
# and every BPE symbol is a concatenation of token characters, so a
# control character can never occur inside a symbol.
_SEP = "\x01"


def _encode_state(sym: Column) -> Column:
    """Symbol array → the delimited string state: each symbol wrapped
    in its own separators (``\\x01s1\\x01\\x01s2\\x01…``), so an
    adjacent pair (a, b) appears as the unambiguous substring
    ``\\x01a\\x01\\x01b\\x01`` and its merge is a plain substring
    replace."""
    return F.concat(F.lit(_SEP), F.array_join(sym, _SEP + _SEP), F.lit(_SEP))


def _decode_state(s: Column) -> Column:
    """Delimited string state → symbol array."""
    return F.split(
        s.substr(F.lit(2), F.length(s) - F.lit(2)), _SEP + _SEP
    )


def _apply_merge(s: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replace of adjacent (a, b) with
    a+b inside a string-encoded symbol stream — one literal substring
    `replace` (r17; formerly a per-element `F.aggregate` struct fold
    over the symbol array, whose generated code was the most expensive
    thing Catalyst compiled each round and whose per-element struct
    allocation dominated the round's executor time). SQL `replace`
    scans left-to-right and continues AFTER each replacement, which is
    exactly Sennrich's one-round merge semantics (tests/test_bpe.py
    pins bit-equality against the pure-Python reference): because each
    symbol is wrapped in its OWN separator pair, consuming one match
    leaves the following symbol's leading separator intact, so chained
    occurrences ([b,b,b] → [bb,b]) resolve identically."""
    return F.replace(
        s,
        F.lit(_SEP + a + _SEP + _SEP + b + _SEP),
        F.lit(_SEP + a + b + _SEP),
    )


#: `bpe_train` trains driver-locally when the distinct-word relation
#: has at most this many rows (gate measured by a bounded limit+collect,
#: never an unbounded count): BPE's per-round state is MODEL-sized (the
#: distinct-word vocabulary), and when that model fits the driver the
#: distributed rounds pay ~0.25s of scheduler/plan latency per merge to
#: aggregate a few thousand rows — 16 merges cost ~4s of cluster jobs
#: for microseconds of work. 64k words × ~8 symbols × 32 rounds keeps
#: the local loop in the low milliseconds-per-round range; a natural-
#: language 100 TB corpus (10^6-10^7 distinct normalized words) stays
#: on the distributed path.
LOCAL_TRAIN_MAX_WORDS = 65536


def _replace_lr(sym: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge of adjacent (a, b) — the
    Sennrich one-round semantics, bit-identical to `_apply_merge`'s
    string `replace` (tests/test_bpe.py pins both against the same
    reference)."""
    out, i = [], 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _train_local(
    rows: list[tuple[str, int]], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Driver-local Sennrich training over a collected (word, cnt)
    relation — the same argmax (count desc, then (a, b) lexicographic;
    Python tuple order on str equals Spark's UTF8String order because
    UTF-8 byte order is code-point order) and the same left-to-right
    merge, so the sequence is bit-identical to the distributed rounds
    (test-pinned)."""
    vocab = [(list(w), c) for w, c in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for sym, c in vocab:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best, w_best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if w_best < min_freq:
            break
        merges.append(best)
        a, b = best
        vocab = [
            (_replace_lr(sym, a, b) if len(sym) >= 2 else sym, c)
            for sym, c in vocab
        ]
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 32,
    min_freq: int = 2,
    local_max_words: int = LOCAL_TRAIN_MAX_WORDS,
) -> list[tuple[str, str]]:
    """Learn the ordered BPE merge list from a corpus.

    Stops early when the best remaining pair's weighted count drops
    below ``min_freq``. Returns ``[(a, b), ...]`` in merge order —
    a+b is the new symbol each round. Deterministic: ties broken by
    (a, b) lexicographic, so the sequence is partitioning-independent
    and equals the pure-Python reference exactly.

    TWO-LEVEL (r18, guide §1.2 "the distributed algorithm first"):
    training state is the distinct-word frequency relation — model-
    sized, never corpus-sized — so after the ONE corpus-scan
    aggregation the size gate picks where the merge rounds run. A
    vocabulary within ``local_max_words`` is collected once (bounded
    by construction: limit ``local_max_words + 1`` — the k-means
    centroid COLLECT_ALLOW class) and trained on the driver, where a
    round costs microseconds; larger vocabularies run the distributed
    rounds below, whose per-round cluster cost is what amortizes a
    10^7-word state. Both paths are bit-identical (test-pinned, same
    argmax and merge semantics). Pass ``local_max_words=0`` to force
    the distributed path.
    """
    wc = word_counts(docs, text_col)
    merges: list[tuple[str, str]] = []
    # checkpoints whose blocks have not been freed yet, oldest first;
    # the try/finally guarantees none of them outlives the call even
    # when a round's job fails mid-training (the leak class
    # operators/checkpoints.py documents must not return on the error
    # path)
    live: list[DataFrame] = []
    try:
        if local_max_words > 0:
            # Gate + (maybe) the whole training from ONE
            # materialization: the vocab relation is checkpointed
            # lazily, the bounded limit+collect materializes it, and
            # whichever path runs next reads the blocks — the
            # big-vocab path never pays a second corpus pass for the
            # gate.
            wc = wc.localCheckpoint(eager=False)
            live.append(wc)
            head = wc.limit(local_max_words + 1).collect()
            if len(head) <= local_max_words:
                return _train_local(
                    [(r["word"], r["cnt"]) for r in head],
                    n_merges,
                    min_freq,
                )
        state = wc.select(
            _encode_state(_chars(F.col("word"))).alias("s"), F.col("cnt")
        )
        for _ in range(n_merges):
            # localCheckpoint each round: the merge nests one replace
            # per round, and a lineage carrying r nested replaces
            # bloats driver analysis/codegen long before data does —
            # the checkpoint materializes the vocab-sized frame and
            # keeps the per-round plan depth CONSTANT (kmeans keeps
            # depth constant by re-deriving from literal centroids;
            # BPE's state is the symbol stream itself, so truncation
            # is the only lever).
            # LAZY (eager=False): the argmax job below is the round's
            # first action and materializes the checkpoint as it runs
            # — an eager checkpoint would spend a whole extra job per
            # round (schedule + write blocks + re-read them) to
            # persist state the very next job consumes anyway. At
            # sf0.1 the saving is within box noise; at scale it
            # removes one full pass over the vocab frame per round.
            state = state.localCheckpoint(eager=False)
            live.append(state)
            # decode once per row into its own projection (Catalyst
            # does no CSE across lambda boundaries), then pair up
            n = F.size("sym")
            pairs = (
                state.select("cnt", _decode_state(F.col("s")).alias("sym"))
                .filter(n >= 2)
                .select(
                    "cnt",
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("sym"), 1, n - 1),
                            F.slice(F.col("sym"), 2, n - 1),
                            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                        )
                    ).alias("p"),
                )
            )
            # 1-row argmax: count desc, then (a, b) — the per-round
            # model-sized collect (kmeans precedent, COLLECT_ALLOW).
            # TakeOrdered reads every partition, so after this action
            # the lazy checkpoint is fully materialized.
            best = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("w"))
                .orderBy(F.col("w").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            # The PREVIOUS round's blocks are freed only NOW — after
            # the argmax materialized this round's checkpoint (their
            # one and only reader) — otherwise n_merges vocab-sized
            # block sets pile up in storage memory for the session's
            # life.
            while len(live) > 1:
                unpersist_local_checkpoint(live.pop(0))
            if not best or best[0]["w"] < min_freq:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            state = state.select(
                _apply_merge(F.col("s"), a, b).alias("s"), "cnt"
            )
    finally:
        while live:
            unpersist_local_checkpoint(live.pop())
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word)
    while len(sym) >= 2:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = sym[best_i], sym[best_i + 1]
        # apply THIS merge left-to-right non-overlapping (the same
        # round semantics training used)
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def _encode_fold(merges: list[tuple[str, str]], doc_id_col: str):
    ranks = {m: i for i, m in enumerate(merges)}

    def fold(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks_out = []
            for words in pdf["_words"]:
                doc_toks: list[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    doc_toks.extend(got)
                toks_out.append(doc_toks)
            yield pd.DataFrame(
                {
                    doc_id_col: pdf[doc_id_col],
                    "bpe_tokens": pd.Series(toks_out, dtype="object"),
                }
            )

    return fold


def bpe_encode(
    docs: DataFrame,
    doc_id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize each document with a learned merge list:
    ``(doc_id, bpe_tokens array<string>)``. Arrow fold with a
    per-partition distinct-word cache — each distinct word is encoded
    once per partition regardless of how often it repeats."""
    id_field = docs.schema[doc_id_col]
    schema = T.StructType(
        [
            T.StructField(doc_id_col, id_field.dataType),
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
        ]
    )
    # r18: width-heal the corpus scan (operators/spread.py, guide
    # §2.5) so a single-row-group zone file doesn't serialize the
    # Arrow encode fold onto one core; the heal moves the raw docs
    # once, before tokenization, and is a no-op on healthy layouts.
    from .spread import heal_scan_width

    staged = heal_scan_width(docs).select(
        F.col(doc_id_col),
        F.filter(
            tokens(F.col(text_col)), lambda t: F.length(t) > 0
        ).alias("_words"),
    )
    return staged.mapInPandas(
        _encode_fold(merges, doc_id_col), schema=schema
    )
