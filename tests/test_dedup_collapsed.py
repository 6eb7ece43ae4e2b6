"""Dedup-first Jaccard composition (`jaccard_pairs_collapsed`).

The r8 scale smoke showed plain `jaccard_pairs` on a 10x-replicated
corpus is output-bound (every doc gains 9 verbatim copies; ~1000x true
pairs). The collapsed composition runs the PPJoin candidate generator
on DISTINCT texts only and re-expands through the duplicate groups —
these tests pin that it is ROW-IDENTICAL to the base operator on
duplicate-heavy corpora, and that the compact (expand=False) output
accounts for every expanded pair exactly.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_pairs_collapsed,
)

BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the old river bank",
    "the quick brown fox jumps over the lazy dog near the new river bank",
    "the quick brown fox jumps over the lazy dog",
    "spark partitions and shuffles explained for data engineers today",
    "spark partitions and shuffles explained for data engineers tomorrow",
    "completely unrelated text about gardening tulips and spring rain",
    "completely unrelated text about gardening roses and spring rain",
    "short text",
    "short text again",
    "",  # empty term set: must never pair, even with its own copies
    "   ",  # whitespace-only: empty term set too
]


def _dup_heavy_corpus(seed: int = 7) -> list[tuple[int, str]]:
    """Each base text replicated 1-4x verbatim, ids shuffled so reps
    (min id per group) interleave arbitrarily with members."""
    rng = random.Random(seed)
    rows = []
    for t in BASE_TEXTS:
        rows.extend(t for _ in range(rng.randint(1, 4)))
    rows.extend(["", "   "])  # extra empty copies
    ids = list(range(len(rows)))
    rng.shuffle(ids)
    return list(zip(ids, rows))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_collapsed_equals_plain_words(spark):
    docs = spark.createDataFrame(
        _dup_heavy_corpus(), schema="doc_id long, text string"
    )
    plain = _rows(jaccard_pairs(docs, threshold=0.6))
    collapsed = _rows(jaccard_pairs_collapsed(docs, threshold=0.6))
    assert plain  # non-vacuous: near-dup AND exact-dup pairs exist
    assert collapsed == plain


def test_collapsed_equals_plain_shingles(spark):
    docs = spark.createDataFrame(
        _dup_heavy_corpus(seed=11), schema="doc_id long, text string"
    )
    plain = _rows(jaccard_pairs(docs, threshold=0.5, use_shingles=True))
    collapsed = _rows(
        jaccard_pairs_collapsed(docs, threshold=0.5, use_shingles=True)
    )
    assert plain
    assert collapsed == plain


def test_collapsed_string_ids(spark):
    """least/greatest expansion must respect the id ordering the base
    operator uses — exercised with string ids."""
    docs = spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in _dup_heavy_corpus(seed=3)],
        schema="doc_id string, text string",
    )
    plain = _rows(jaccard_pairs(docs, threshold=0.6))
    collapsed = _rows(jaccard_pairs_collapsed(docs, threshold=0.6))
    assert collapsed == plain


def test_empty_ish_docs_agree_with_base(spark):
    """`tokens` is a split, so blank/punct-only text normalizes to the
    one-element token set {""} — the base operator pairs all such docs
    (they share the "" token, jaccard exactly 1.0) and the collapsed
    composition must reproduce that, across AND within hash groups
    ("", "", "   ", "!!!" are three distinct md5 groups here)."""
    docs = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "   "), (4, "!!!"), (5, "real words here")],
        schema="doc_id long, text string",
    )
    plain = _rows(jaccard_pairs(docs, threshold=0.5))
    collapsed = _rows(jaccard_pairs_collapsed(docs, threshold=0.5))
    assert plain == [
        (a, b, 1, 1.0) for a, b in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    ]
    assert collapsed == plain


def test_compact_accounts_for_every_expanded_pair(spark):
    docs = spark.createDataFrame(
        _dup_heavy_corpus(), schema="doc_id long, text string"
    )
    expanded = jaccard_pairs_collapsed(docs, threshold=0.6)
    compact = jaccard_pairs_collapsed(docs, threshold=0.6, expand=False)
    rows = compact.collect()
    # sum of multiplicities == expanded row count, exactly
    assert sum(r.n_pairs for r in rows) == expanded.count()
    # within-group rows are the rep self-pairs with jaccard exactly 1.0
    for r in rows:
        if r.doc_a == r.doc_b:
            assert r.jaccard == 1.0 and r.n_pairs >= 1
    # cross rows reproduce the rep-level pair set
    reps = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
        .select("doc_id", "text")
    )
    rep_pairs = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in jaccard_pairs(reps, threshold=0.6).collect()
    }
    cross = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in rows
        if r.doc_a != r.doc_b
    }
    assert cross == rep_pairs


def test_collapsed_oracle_parity(spark):
    """Registry bar for the r9-slated `dedup_jaccard_collapsed` query
    (queries/dedup.py): bit-exact Spark==DuckDB at both the smoke and
    the grading scale, against the SAME oracle as the graded
    `dedup_jaccard_pairs` — a differential proof that the collapse-
    first plan and the plain plan agree on real testdata too."""
    import duckdb

    from big_data_analytics_final_project_spark.operators.dedup import (
        jaccard_pairs_sql,
    )
    from big_data_analytics_final_project_spark.queries.dedup import (
        JACCARD_THRESHOLD,
        dedup_jaccard_collapsed_q,
    )

    from .conftest import SF_CORRECT, SF_SMOKE
    from .parity import compare

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        compare(
            dedup_jaccard_collapsed_q(spark, sf),
            con.sql(jaccard_pairs_sql(JACCARD_THRESHOLD, use_shingles=True)),
        )
        con.close()


def test_candidate_generation_sees_only_distinct_texts(spark):
    """The scale property itself: the PPJoin stage inside the collapsed
    plan receives one row per DISTINCT text, regardless of duplication
    factor — pinned by counting the rep frame, not by timing."""
    corpus = _dup_heavy_corpus()
    docs = spark.createDataFrame(corpus, schema="doc_id long, text string")
    n_distinct = len({t for _, t in corpus})
    reps = docs.groupBy(F.md5("text")).agg(F.min("doc_id"))
    assert reps.count() == n_distinct < len(corpus)
