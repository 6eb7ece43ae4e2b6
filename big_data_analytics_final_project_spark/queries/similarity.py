"""Similarity-search queries over the `embeddings` zone
(see operators/similarity.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.kmeans import kmeans_assign, kmeans_assign_sql
from ..operators.similarity import (
    ann_hyperplane_lsh,
    ann_hyperplane_lsh_sql,
    ann_ivf,
    ann_ivf_sql,
    embedding_near_dup,
    embedding_near_dup_sql,
    knn_bruteforce,
    knn_bruteforce_sql,
)
from ..sources import load_table
from . import QuerySpec

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_K_EXACT = 5
_K_ANN = 3
# the corpus has no planted duplicates (max pairwise cosine ≈ 0.48);
# 0.3 keeps the near-dup result non-trivial while staying selective
_NEAR_DUP_T = 0.3


def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_bruteforce(emb, lambda c: c < _N_QUERIES, k=_K_EXACT)


def ann_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_hyperplane_lsh(emb, lambda c: c < _N_QUERIES, k=_K_ANN)


def ann_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ivf(emb, lambda c: c < _N_QUERIES, k=_K_ANN)


QUERIES: dict[str, QuerySpec] = {
    "knn_bruteforce": QuerySpec(
        knn_bruteforce_q, knn_bruteforce_sql(f"_id < {_N_QUERIES}", _K_EXACT)
    ),
    "ann_hyperplane_lsh": QuerySpec(
        ann_lsh_q, ann_hyperplane_lsh_sql(f"_id < {_N_QUERIES}", _K_ANN)
    ),
    "ann_ivf": QuerySpec(ann_ivf_q, ann_ivf_sql(f"_id < {_N_QUERIES}", _K_ANN)),
    "embedding_near_dup": QuerySpec(
        lambda spark, sf_dir: embedding_near_dup(
            load_table(spark, sf_dir, "embeddings"), threshold=_NEAR_DUP_T
        ),
        embedding_near_dup_sql(_NEAR_DUP_T),
    ),
    # iterative Lloyd's k-means, deterministic end-to-end — the trained
    # upgrade of ann_ivf's first-k codebook, and the semantic-bucketing
    # op itself (operators/kmeans.py)
    "embedding_kmeans": QuerySpec(
        lambda spark, sf_dir: kmeans_assign(
            load_table(spark, sf_dir, "embeddings"), n_clusters=8, n_iters=3
        ),
        kmeans_assign_sql(n_clusters=8, n_iters=3),
    ),
}
