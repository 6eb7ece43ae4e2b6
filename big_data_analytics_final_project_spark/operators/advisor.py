"""Join-strategy advisor: the pre-flight a 100 TB join runs BEFORE
choosing a physical plan, composing this repo's planning primitives —
per-key skew stats (operators/skew.py's diagnosis lives in
queries/drift.py join_key_skew_report), CMS join-cardinality
estimation (operators/sketches.py cms_join_size_estimate), and the
bloom semi-join reduction (operators/bloomjoin.py) — into one
decision row per join edge.

Decision table (every threshold a named argument, every input column
reported next to the verdict so the recommendation is auditable):

1. ``broadcast``      — build side has ≤ broadcast_rows distinct keys:
                        ship it; no shuffle at all.
2. ``skew``           — probe side's hottest key holds > skew_tau of
                        its rows: AQE skew-join handles the common
                        case, salt (operators/skew.py) the pathological.
3. ``bloom_shuffle``  — build side too big to broadcast AND the
                        estimated matched fraction of the probe side
                        < bloom_tau: a 125 MB-of-bits pre-filter cuts
                        the probe shuffle to ~the match rate
                        (operators/bloomjoin.py); estimate from two
                        CMS sketches, never a real join.
4. ``shuffle``        — otherwise: plain co-partitioned hash/sort-merge
                        join; AQE right-sizes it.

Cost: two single-pass key-count aggregates (map-side combinable), two
depth×width CMS sketches, and arithmetic over sketch-sized frames —
the advisor NEVER executes the join it advises on. Output is
deterministic (exact counts + md5-bucketed CMS), so it is oracle-able
end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import cms_join_size_estimate, count_min_sketch


def join_advisor(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    label: str = "join",
    broadcast_rows: int = 1_000_000,
    skew_tau: float = 0.20,
    bloom_tau: float = 0.30,
    cms_depth: int = 5,
    cms_width: int = 1 << 17,
) -> DataFrame:
    """One decision row for ``probe JOIN build ON probe_key = build_key``:

    ``(edge, probe_rows, probe_keys, probe_top_key_share, build_keys,
    est_join_rows, est_matched_frac, recommendation)``

    ``est_matched_frac`` upper-bounds the probe fraction surviving a
    semi-join: CMS inner products overestimate only (collision terms),
    and est_join_rows ≥ matched probe rows for a key-unique build side
    — so a ``bloom_shuffle`` verdict is conservative (the filter helps
    at least as much as estimated). NULL keys are excluded on both
    sides (they never equi-join)."""
    p = probe.filter(F.col(probe_key).isNotNull()).select(
        F.col(probe_key).cast("string").alias("k")
    )
    b = build.filter(F.col(build_key).isNotNull()).select(
        F.col(build_key).cast("string").alias("k")
    )
    per_key = p.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    probe_stats = per_key.agg(
        F.sum("c").alias("probe_rows"),
        F.count(F.lit(1)).alias("probe_keys"),
        F.max("c").alias("_top"),
    ).select(
        "probe_rows",
        "probe_keys",
        (F.col("_top") / F.col("probe_rows")).alias("probe_top_key_share"),
    )
    build_stats = b.agg(
        F.count_distinct(F.col("k")).alias("build_keys")
    )
    est = cms_join_size_estimate(
        count_min_sketch(p, "k", depth=cms_depth, width=cms_width),
        count_min_sketch(
            b.distinct(), "k", depth=cms_depth, width=cms_width
        ),
        depth=cms_depth,
    ).select("join_size_est")
    stats = (
        probe_stats.crossJoin(F.broadcast(build_stats))
        .crossJoin(F.broadcast(est))
        .select(
            F.lit(label).alias("edge"),
            "probe_rows",
            "probe_keys",
            "probe_top_key_share",
            "build_keys",
            F.col("join_size_est").alias("est_join_rows"),
            (F.col("join_size_est") / F.col("probe_rows")).alias(
                "est_matched_frac"
            ),
        )
    )
    rec = (
        F.when(F.col("build_keys") <= broadcast_rows, F.lit("broadcast"))
        .when(
            F.col("probe_top_key_share") > skew_tau, F.lit("skew")
        )
        .when(
            F.col("est_matched_frac") < bloom_tau, F.lit("bloom_shuffle")
        )
        .otherwise(F.lit("shuffle"))
    )
    return stats.withColumn("recommendation", rec)
