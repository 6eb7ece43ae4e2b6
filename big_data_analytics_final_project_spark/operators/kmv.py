"""KMV (k-minimum-values / bottom-k) sketch: set cardinality AND
set-overlap estimation from fixed-size summaries.

The sketch-algebra member the others can't cover: HLL answers "how
many distinct" but two HLLs cannot estimate an INTERSECTION except by
inclusion-exclusion (whose error explodes when the overlap is small —
precisely the interesting case for contamination screening); CMS
answers point frequencies; Misra-Gries answers heavy hitters. A KMV
sketch — the k smallest values of a uniform hash over the DISTINCT
keys — supports, from two k-row relations alone:

- distinct-count estimate:  n̂ = (k-1) / h_(k)   (h normalized to [0,1))
- LOSSLESS union:           KMV(A ∪ B) = bottom-k(KMV(A) ∪ KMV(B))
- Jaccard / intersection:   among the bottom-k of the union, the
  fraction present in BOTH sketches estimates J(A,B) (it is a uniform
  size-k sample of A ∪ B); intersection ≈ J · |A ∪ B|.

The 100 TB use: "how much of this new crawl is already in the corpus"
or "does the training set leak the eval set" as a two-sketch desk
check — each corpus is scanned once, ever, and every pairwise overlap
question afterwards costs two k-row frames. Relative error ~1/sqrt(k)
(Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD 2007).

Determinism, same discipline as the CMS/bloom family: the hash is the
first 60 bits of md5 (15 hex chars → BIGINT, engine-portable:
``('0x' || substr(md5(k), 1, 15))::BIGINT``), so sketches — and every
estimate derived from them — are bit-identical across engines and
partitionings, and a DuckDB oracle can reproduce them exactly.

Scale shape: construction folds each partition to its ≤ k smallest
DISTINCT hashes inside Arrow ``mapInPandas`` (vectorized
unique+nsmallest per batch, the Misra-Gries fold precedent at
operators/sketches.py — a per-partition bottom-k has no builtin
expression form that avoids a full shuffle), so the one shuffle
carries ≤ k rows per partition instead of the distinct key space.
Everything downstream operates on ≤ k-row frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: hash domain size: md5's first 15 hex chars = 60 bits
HASH_DOMAIN = float(1 << 60)

_H_SCHEMA = T.StructType([T.StructField("h", T.LongType())])


def _kmv_fold(k: int):
    def fold(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: set[int] = set()
        for pdf in it:
            best.update(int(v) for v in pdf["h"].dropna().unique())
            if len(best) > 8 * k:  # amortized prune, keeps the fold O(k)
                best = set(sorted(best)[:k])
        yield pd.DataFrame({"h": pd.Series(sorted(best)[:k], dtype="int64")})

    return fold


def kmv_sketch(df: DataFrame, key_col: str, k: int = 1024) -> DataFrame:
    """The ≤ k smallest distinct 60-bit md5 hashes of `key_col`, as a
    single-column relation ``(h bigint)`` — persistable, mergeable,
    and the input to every estimator below. NULL keys are excluded."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    local = (
        df.filter(F.col(key_col).isNotNull())
        .select(h.alias("h"))
        .mapInPandas(_kmv_fold(k), schema=_H_SCHEMA)
    )
    # global bottom-k over ≤ k rows/partition: TakeOrdered shape
    return local.distinct().orderBy("h").limit(k)


def kmv_distinct_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """1-row ``(n_sketch, distinct_est)``. Exact (= n_sketch) while the
    set is smaller than k — the sketch then IS the distinct hash set —
    and (k-1)/h_(k) beyond, with h_(k) the largest retained hash
    normalized into [0,1)."""
    return sketch.agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("h").alias("_hk"),
    ).select(
        "n_sketch",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            (F.col("n_sketch") - 1) / (F.col("_hk") / F.lit(HASH_DOMAIN))
        )
        .alias("distinct_est"),
    )


def kmv_merge(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """Lossless union: bottom-k of the merged hash sets is EXACTLY the
    sketch a single pass over A ∪ B would build (test-pinned)."""
    return sk_a.union(sk_b).distinct().orderBy("h").limit(k)


def kmv_overlap(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """Jaccard / union / intersection estimates from two sketches.

    Returns 1 row: ``(n_union_sketch, jaccard_est, union_est,
    intersection_est)``. The bottom-K of the union sketch (K = min(k,
    its size)) is a uniform K-sample of A ∪ B; the fraction of it
    flagged present in both inputs estimates J(A,B), and
    intersection = J · |A∪B|. Everything here runs on ≤ 2k rows.
    """
    a = sk_a.select("h", F.lit(True).alias("_in_a"))
    b = sk_b.select("h", F.lit(True).alias("_in_b"))
    both = (
        a.join(b, "h", "full_outer")
        .select(
            "h",
            F.coalesce("_in_a", F.lit(False)).alias("_in_a"),
            F.coalesce("_in_b", F.lit(False)).alias("_in_b"),
        )
        .orderBy("h")
        .limit(k)
    )
    est = both.agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.max("h").alias("_hk"),
        F.sum((F.col("_in_a") & F.col("_in_b")).cast("long")).alias("_both"),
    )
    return est.select(
        "n_union_sketch",
        (F.col("_both") / F.col("n_union_sketch")).alias("jaccard_est"),
        F.when(
            F.col("n_union_sketch") < k,
            F.col("n_union_sketch").cast("double"),
        )
        .otherwise(
            (F.col("n_union_sketch") - 1)
            / (F.col("_hk") / F.lit(HASH_DOMAIN))
        )
        .alias("union_est"),
    ).select(
        "n_union_sketch",
        "jaccard_est",
        "union_est",
        (F.col("jaccard_est") * F.col("union_est")).alias(
            "intersection_est"
        ),
    )


def _kmv_group_fold(k: int, group_col: str):
    def fold(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[str, set[int]] = {}
        for pdf in it:
            sub = pdf.dropna(subset=[group_col, "h"])
            for g, hs in sub.groupby(group_col)["h"]:
                cur = best.setdefault(str(g), set())
                cur.update(int(v) for v in hs.unique())
                if len(cur) > 8 * k:
                    best[str(g)] = set(sorted(cur)[:k])
        groups, hashes = [], []
        for g, cur in best.items():
            kept = sorted(cur)[:k]
            groups.extend([g] * len(kept))
            hashes.extend(kept)
        yield pd.DataFrame(
            {
                group_col: pd.Series(groups, dtype="object"),
                "h": pd.Series(hashes, dtype="int64"),
            }
        )

    return fold


def kmv_sketch_by(
    df: DataFrame, group_col: str, key_col: str, k: int = 1024
) -> DataFrame:
    """Per-group KMV sketches in one pass: ``(group, h)`` with ≤ k rows
    per group. The fold keeps a bounded per-group candidate set per
    partition (the Misra-Gries dict discipline), so the shuffle
    carries ≤ k rows per (partition, group) — never the distinct key
    space — and the global bottom-k per group is a k-bounded window
    over those candidates. NULL groups and NULL keys are excluded."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    local = (
        df.filter(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).cast("string").alias(group_col), h.alias("h"))
        .mapInPandas(
            _kmv_group_fold(k, group_col),
            schema=T.StructType(
                [
                    T.StructField(group_col, T.StringType()),
                    T.StructField("h", T.LongType()),
                ]
            ),
        )
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        local.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_overlap_matrix(sketches: DataFrame, group_col: str, k: int) -> DataFrame:
    """Pairwise overlap between every group pair from per-group
    sketches alone: ``(group_a, group_b, jaccard_est, union_est,
    intersection_est)`` for group_a < group_b.

    The provenance dedup planner: "which sources duplicate each
    other" across n sources costs n·k sketch rows total — the n²
    pairwise answers never rescan a corpus. Per pair it is the same
    bottom-K-of-union estimator as `kmv_overlap`, computed set-wise:
    a self-join on h restricted to the union's bottom-K via a
    per-pair rank window over ≤ 2k rows."""
    # the distinct group list (n rows, broadcastable) crossed into
    # ordered (ga < gb) pairs; each pair's hash union is then flagged
    # per side and cut to its bottom-K
    groups = sketches.select(
        F.col(group_col).alias("ga")
    ).distinct()
    gpairs = (
        groups.join(
            groups.select(F.col("ga").alias("gb")),
            F.col("ga") < F.col("gb"),
        )
    )
    sk = sketches.select(group_col, "h")
    left = gpairs.join(
        sk.select(F.col(group_col).alias("ga"), F.col("h").alias("h")),
        "ga",
    ).select("ga", "gb", "h", F.lit(True).alias("_in_a"))
    right = gpairs.join(
        sk.select(F.col(group_col).alias("gb"), F.col("h").alias("h")),
        "gb",
    ).select("ga", "gb", "h", F.lit(True).alias("_in_b"))
    union = (
        left.join(right, ["ga", "gb", "h"], "full_outer")
        .select(
            "ga",
            "gb",
            "h",
            F.coalesce("_in_a", F.lit(False)).alias("_in_a"),
            F.coalesce("_in_b", F.lit(False)).alias("_in_b"),
        )
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    bottom = union.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    est = bottom.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.max("h").alias("_hk"),
        F.sum((F.col("_in_a") & F.col("_in_b")).cast("long")).alias("_both"),
    )
    return est.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        (F.col("_both") / F.col("n_union_sketch")).alias("jaccard_est"),
        F.when(
            F.col("n_union_sketch") < k,
            F.col("n_union_sketch").cast("double"),
        )
        .otherwise(
            (F.col("n_union_sketch") - 1) / (F.col("_hk") / F.lit(HASH_DOMAIN))
        )
        .alias("union_est"),
    ).select(
        "group_a",
        "group_b",
        "jaccard_est",
        "union_est",
        (F.col("jaccard_est") * F.col("union_est")).alias("intersection_est"),
    )
