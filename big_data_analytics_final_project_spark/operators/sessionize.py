"""Sessionization: derive sessions from a raw event log.

The reference doesn't compute sessions — its generator synthesizes them
(reference data_generator.py:252-321) and HBase stores them time-
ordered. The engine recomputes the same artifact from events, two ways:

1. `sessionize` (batch): gaps-and-islands with window functions —
   lag → new-session flag → running count → per-session aggregate.
   SQL-expressible, hence oracle-checkable.
2. `sessionize_stream` lives in streaming/ and uses the built-in
   `session_window` with a watermark (SURVEY.md §7.6) — same concept,
   incremental state-store execution.

Scale: one shuffle on user_id (window partition), then the per-session
aggregate reuses the same partitioning — Catalyst plans no second
exchange. Timestamps are compared in integer microseconds
(`unix_micros`) so the gap test is exact and portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign session sequence numbers and roll up per-session stats.

    Returns one row per (user, session): session_seq (1-based),
    session_start/end, n_events, duration_s. Pass a unique
    ``tiebreak_col`` if timestamps can collide within a user — the lag
    and running-sum need a total order to be deterministic.
    """
    gap_us = gap_seconds * 1_000_000
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    w_running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = (
        # cast: unix_micros rejects TIMESTAMP_NTZ inputs; for TIMESTAMP
        # the cast is a no-op, for NTZ it is value-preserving under the
        # engine's pinned-UTC session (sources.load_table).
        events.withColumn("_ts_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .withColumn("_prev_us", F.lag("_ts_us").over(w))
        .withColumn(
            "_new_session",
            F.when(
                F.col("_prev_us").isNull()
                | ((F.col("_ts_us") - F.col("_prev_us")) > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn("session_seq", F.sum("_new_session").over(w_running))
    )
    return (
        flagged.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            ((F.max("_ts_us") - F.min("_ts_us")) / 1_000_000.0).alias("duration_s"),
        )
        .orderBy(user_col, "session_seq")
    )


def sessionize_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> str:
    """DuckDB oracle twin of `sessionize` (epoch_us == unix_micros)."""
    gap_us = gap_seconds * 1_000_000
    order = ts_col + (f", {tiebreak_col}" if tiebreak_col else "")
    extra = f"{tiebreak_col}, " if tiebreak_col else ""
    return f"""
WITH flagged AS (
  SELECT {user_col}, {ts_col}, {extra}epoch_us({ts_col}) AS ts_us,
         CASE WHEN lag(epoch_us({ts_col})) OVER w IS NULL
                OR epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_session
  FROM {table}
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {order})
),
numbered AS (
  -- CAST: DuckDB SUM(int) yields HUGEINT; Spark's running sum is BIGINT.
  SELECT *, CAST(SUM(new_session) OVER (
    PARTITION BY {user_col} ORDER BY {order}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT {user_col}, session_seq,
       min({ts_col}) AS session_start,
       max({ts_col}) AS session_end,
       count(*) AS n_events,
       (max(ts_us) - min(ts_us)) / 1000000.0 AS duration_s
FROM numbered
GROUP BY {user_col}, session_seq
ORDER BY {user_col}, session_seq
"""
