"""Range (interval) join: match right-side rows whose timestamp falls in
a bounded window around each left row's timestamp.

The reference has no range join (SURVEY.md §2.4 "not present") — this is
a capability upgrade alongside the as-of join (operators/asof.py). The
naive formulation is an equi-join on the key plus a range residual;
Spark executes that as a join with a non-equi condition whose per-key
fan-out is the full key group — O(|L_k|·|R_k|) comparisons per key even
when the window matches almost nothing.

Scale shape used here — **time binning**: pick a bucket width equal to
the window span; each right row lands in exactly one bucket
(floor(ts/w)), each left row probes the (at most two) buckets its
window overlaps via a tiny `explode(sequence(...))`. The join becomes a
pure equi-join on (keys..., bucket) — shuffle-partitionable, AQE-skew-
splittable — followed by the exact window filter. Comparisons are now
O(rows sharing a bucket), i.e. proportional to temporal locality, not
to key cardinality. At 100 TB this is the difference between a
broadcast-nested-loop catastrophe and a well-behaved shuffled hash
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _floordiv(col: Column, w: int) -> Column:
    """Exact floor division of a long column — float `/`+`floor` can
    misplace exact-boundary timestamps by one bucket."""
    return ((col - F.pmod(col, F.lit(w))) / w).cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = -3600.0,
    upper_s: float = 0.0,
    closed: str = "left",
) -> DataFrame:
    """Inner-join rows where ``right_ts − left_ts ∈ window``.

    ``window`` is [lower_s, upper_s] seconds; ``closed`` picks boundary
    inclusion: "both" ⇒ [lo, hi], "left" ⇒ [lo, hi), "right" ⇒ (lo, hi],
    "neither" ⇒ (lo, hi). Output: left columns + right's non-key
    columns prefixed ``r_``.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)
    w = max(hi_us - lo_us, 1)

    # cast: unix_micros rejects TIMESTAMP_NTZ inputs; no-op for
    # TIMESTAMP, value-preserving for NTZ under the pinned-UTC session.
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    lhs = left.withColumn("_l_us", l_us).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _floordiv(F.col("_l_us") + lo_us, w),
                _floordiv(F.col("_l_us") + hi_us, w),
            )
        ),
    )
    rhs = right.withColumn("_r_us", r_us).withColumn(
        "_bucket", _floordiv(F.col("_r_us"), w)
    )
    renames = {c: f"r_{c}" for c in right.columns if c not in on}
    for old, new in renames.items():
        rhs = rhs.withColumnRenamed(old, new)

    delta = F.col("_r_us") - F.col("_l_us")
    lo_ok = delta > lo_us if closed in ("right", "neither") else delta >= lo_us
    hi_ok = delta < hi_us if closed in ("left", "neither") else delta <= hi_us
    return (
        lhs.join(rhs, [*on, "_bucket"])
        .filter(lo_ok & hi_ok)
        .drop("_bucket", "_l_us", "_r_us")
    )
