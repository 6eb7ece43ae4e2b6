"""As-of (most-recent-prior) join — a capability the reference lacks
(SURVEY.md §2.4 lists range/as-of joins as absent) and Spark has no
built-in for.

Implemented as the union+window formulation rather than a range join:
tag left/right rows, union them, and carry the right side's payload
forward with `last(..., ignorenulls=True)` over a
(keys, time, side)-ordered running window. One shuffle on the join
keys, state bounded by one row — no time-bucket explosion and no
per-row range probe, which is what makes it safe at 100 TB (a naive
`left.ts >= right.ts` theta join is quadratic per key).

Right rows sort BEFORE left rows at equal timestamps, so a match at
exactly t is taken (inclusive as-of, same as DuckDB's ASOF JOIN
`ON l.ts >= r.ts`, which is the oracle used by the query wrapper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with the same `on` keys and right.ts <= left.ts (inclusive).

    `right` must be unique per (on, ts) — pre-aggregate otherwise; the
    carried-forward value is then deterministic (left rows at equal
    timestamps all see the same right row, and ignorenulls skips other
    left rows in the frame)."""
    lcols = left.columns
    tagged_l = left.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in on and c != ts_col],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
    )
    tagged_r = right.select(
        *on,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on and c != ts_col],
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_l.unionByName(tagged_r).select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload_cols
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *on,
            ts_col,
            *[c for c in lcols if c not in on and c != ts_col],
            *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in payload_cols],
        )
    )
