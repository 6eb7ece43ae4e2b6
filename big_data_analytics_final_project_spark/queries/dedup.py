"""Dedup queries over the `documents` zone (see operators/dedup.py for
the algorithms and their 100 TB strategies)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    DEDUP_EXACT_SQL,
    dedup_exact,
    jaccard_pairs,
    jaccard_pairs_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
    simhash_pairs,
    simhash_pairs_sql,
)
from ..sources import load_table
from . import QuerySpec

JACCARD_THRESHOLD = 0.8
MINHASH_THRESHOLD = 0.8
SIMHASH_MAX_HAMMING = 3


def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(load_table(spark, sf_dir, "documents"))


def dedup_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-shingle) Jaccard — shingles, not word unigrams:
    the corpus vocabulary is tiny (~31 words, every token in ~78% of
    docs) so unigram sets are near-identical across all docs and any
    exact algorithm degenerates to all-pairs; 3-gram shingles are
    distinctive (df ≈ 8), which is what makes the prefix-filtered
    inverted index sparse."""
    return jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=JACCARD_THRESHOLD,
        use_shingles=True,
    )


def dedup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=MINHASH_THRESHOLD
    )


def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=SIMHASH_MAX_HAMMING
    )


QUERIES: dict[str, QuerySpec] = {
    "dedup_exact": QuerySpec(dedup_exact_q, DEDUP_EXACT_SQL),
    "dedup_jaccard_pairs": QuerySpec(
        dedup_jaccard_q, jaccard_pairs_sql(JACCARD_THRESHOLD, use_shingles=True)
    ),
    "dedup_minhash_lsh": QuerySpec(
        dedup_minhash_q, minhash_lsh_pairs_sql(MINHASH_THRESHOLD)
    ),
    "dedup_simhash": QuerySpec(dedup_simhash_q, simhash_pairs_sql(SIMHASH_MAX_HAMMING)),
}
