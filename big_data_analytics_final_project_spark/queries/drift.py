"""Observability / drift-detection family: the monitoring pass a
production data pipeline runs BESIDE the analytics — "did this hour's
volume spike?" and "has the value distribution shifted since the
reference period?". The reference has nothing like it (its pipeline is
batch one-shot); at 100 TB training-data scale these are the checks
that catch a broken upstream crawler or a re-weighted source mix
before a corpus ships (complementing the row-level checks in
queries/quality.py — FK integrity, rollup reconciliation — with
DISTRIBUTION-level ones).

Cross-engine exactness discipline (the repo's standing rule): every
statistic is accumulated in exact integer/decimal arithmetic — window
sums of counts, integer-micro value buckets, the `_QLOG_LUT`
quantized log2 from queries/text.py — and doubles appear only in a
final, fixed-order IEEE expression both engines evaluate identically
(int→double casts and +,-,*,/,sqrt are all correctly rounded, so
identical inputs give identical bits; no libm transcendentals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import QuerySpec
from .text import _QLOG_LUT, _QLOG_SCALE, _qlog2_nano_col, _qlog2_nano_sql

_WARMUP = 12  # trailing buckets required before a z-score is judged
_Z_THRESH = 3.0
_N_BINS = 10
_PSI_DRIFT_BITS = 0.25  # ~0.17 nats; conventional "action" PSI ~ 0.25


def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection on hourly event
    volume: each hour's count is judged against the mean/stddev of the
    24 trailing hourly buckets (self-excluded — ROWS BETWEEN 24
    PRECEDING AND 1 PRECEDING — so a spike can't dilute its own
    baseline), with a 12-bucket warm-up before anything is flagged.
    A zero-variance baseline leaves z NULL, but any deviation from a
    perfectly flat window still flags (infinite-sigma case). Hours
    with ZERO events never materialize a row (the frame is observed
    hours, not a calendar spine) — to catch outage-shaped anomalies,
    compose with the `events_gap_filled_hourly` spine first.

    Exactness: the trailing sum and sum-of-squares are BIGINT window
    aggregates over exact counts; variance comes from the integer
    numerator n·Σx² − (Σx)² (no float cancellation), and the closing
    mean/z expressions are the same fixed-order IEEE double ops on
    both engines, so even the doubles hash-match.

    Scale: the event-level aggregation is a distributed hash agg (one
    shuffle); the trailing window then runs over the HOURLY frame —
    one row per hour, ~10^5 rows per decade, never event-sized — the
    same bounded-frame two-level pattern as `events_gap_filled_hourly`
    (allowlisted in plans/lint.py with that reason)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))

    w = Window.orderBy("hour").rowsBetween(-24, -1)
    n = F.col("n_events")
    s = F.sum("n_events").over(w).alias("s")
    sq = F.sum(n * n).over(w).alias("sq")
    cnt = F.count("n_events").over(w).alias("n_trail")
    t = hourly.select("hour", "n_events", cnt, s, sq)

    var_num = F.col("n_trail") * F.col("sq") - F.col("s") * F.col("s")
    mean = F.when(
        F.col("n_trail") > 0,
        F.col("s").cast("double") / F.col("n_trail"),
    )
    z = F.when(
        (F.col("n_trail") >= _WARMUP) & (var_num > 0),
        (n.cast("double") - F.col("s").cast("double") / F.col("n_trail"))
        / F.sqrt(
            var_num.cast("double")
            / (F.col("n_trail") * F.col("n_trail")).cast("double")
        ),
    )
    # zero-variance baseline: z is undefined (NULL), but ANY deviation
    # from a perfectly flat trailing window is infinite-sigma — flag it
    flat_dev = (
        (F.col("n_trail") >= _WARMUP)
        & (var_num == 0)
        & (n * F.col("n_trail") != F.col("s"))
    )
    return t.select(
        "hour",
        "n_events",
        "n_trail",
        mean.alias("trail_mean"),
        z.alias("z"),
        (F.coalesce(F.abs(z) > _Z_THRESH, F.lit(False)) | flat_dev).alias(
            "is_anomaly"
        ),
    ).orderBy("hour")


EVENTS_HOURLY_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY 1
),
t AS (
  SELECT hour, n_events,
         count(n_events) OVER w AS n_trail,
         CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT) AS s,
         CAST(coalesce(sum(n_events * n_events) OVER w, 0) AS BIGINT) AS sq
  FROM hourly
  WINDOW w AS (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT CAST(hour AS TIMESTAMP) AS hour,
       n_events,
       n_trail,
       CASE WHEN n_trail > 0
            THEN CAST(s AS DOUBLE) / n_trail END AS trail_mean,
       CASE WHEN n_trail >= {_WARMUP} AND (n_trail * sq - s * s) > 0
            THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / n_trail)
                 / sqrt(CAST(n_trail * sq - s * s AS DOUBLE)
                        / CAST(n_trail * n_trail AS DOUBLE))
       END AS z,
       coalesce(abs(
         CASE WHEN n_trail >= {_WARMUP} AND (n_trail * sq - s * s) > 0
              THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / n_trail)
                   / sqrt(CAST(n_trail * sq - s * s AS DOUBLE)
                          / CAST(n_trail * n_trail AS DOUBLE))
         END) > {_Z_THRESH}, FALSE)
       OR (n_trail >= {_WARMUP} AND (n_trail * sq - s * s) = 0
           AND n_events * n_trail != s) AS is_anomaly
FROM t
ORDER BY hour
"""


def segment_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the `value` distribution per
    event type, reference period (first half of the time range by day)
    vs current (second half) — the standard drift score a feature
    store / corpus-mix monitor computes per segment per release:
    PSI = Σ_bins (p_i − q_i)·log(p_i/q_i), here in BITS (log2).

    Construction, kept engine-exact end to end (the LUT rides as
    broadcast DATA — a 1-row array frame, exactly the SQL twin's
    `lut` CTE — not as an inline literal: four 2047-element literals
    in the expression tree cost ~4.5s of driver-side Catalyst
    analysis per build, vs 0.1s of actual execution):
    - the split day and the value range come from ONE scalar aggregate
      (broadcast back — the benign 1-row attach);
    - values bucket into {_N_BINS} equal-width bins by INTEGER
      arithmetic on micro-units (floor(v·1e6+0.5), then integer
      div — no float boundary can disagree);
    - every (type, bin) gets +1 smoothing (so empty bins are
      defined); bins that never materialize are folded in analytically
      (their smoothed term is a per-type constant);
    - NULL-valued events are excluded up front: a NULL bin row would
      silently distort the missing-bin fold on BOTH engines (the one
      failure mode parity can't catch);
    - log2(p_i/q_i) = qlog2(a_i'·B') − qlog2(b_i'·A') via the shared
      `_QLOG_LUT` literal (queries/text.py) — no libm on either
      engine; each PSI term is a DECIMAL(38,0) product of exact
      integers, so the sum is order-independent;
    - the closing normalization is one fixed-order double expression.

    Scale: one events scan → tiny scalar agg + one (type, bin) hash
    agg ({_N_BINS}·|types| rows); everything after the aggregate is
    constant-sized. The per-type totals ride a window over the
    (type, bin) frame — bounded rows, partitioned by type."""
    # broadcast-LUT qlog2 (shared helper — see _qlog2_nano_col's note
    # on the driver-side analysis cost of inline literals)
    qlog2 = _qlog2_nano_col
    lut_df = spark.createDataFrame([(_QLOG_LUT,)], "_lut: array<bigint>")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type", F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("vmicro"),
        )
    )
    bounds = ev.agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.min("vmicro").alias("v0"),
        F.max("vmicro").alias("v1"),
    ).select(
        F.expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))").alias(
            "mid_day"
        ),
        "v0",
        "v1",
    )
    b = ev.crossJoin(F.broadcast(bounds)).selectExpr(
        "event_type",
        "day < mid_day AS is_ref",
        # `div` = exact integer division (DuckDB `//`) — a double `/`
        # could round across a bin boundary
        f"least(((vmicro - v0) * {_N_BINS}) div (v1 - v0 + 1), "
        f"{_N_BINS - 1}) AS bin",
    )
    counts = b.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("bb"),
    )
    # Empty bins never materialize: a missing bin's smoothed counts are
    # a1=b1=1, so its PSI term is the CONSTANT (tb−ta)·(qlog2(tb)−
    # qlog2(ta)) — added analytically, (bins−present)·that, instead of
    # via a type×bin grid join (which would re-scan the corpus for the
    # distinct types). Totals likewise fold in the smoothing:
    # ta = Σa + bins regardless of which bins are present.
    # (Totals are named "ta"/"tb", NOT "A1"/"B1": Spark's DEFAULT
    # case-insensitive resolution would make withColumn("A1", ...)
    # silently replace a column named a1.)
    wt = Window.partitionBy("event_type")
    full = (
        counts.withColumn(
            "ta", F.sum("a").over(wt) + F.lit(_N_BINS)
        )
        .withColumn("tb", F.sum("bb").over(wt) + F.lit(_N_BINS))
        .withColumn("a1", F.col("a") + 1)
        .withColumn("b1", F.col("bb") + 1)
        .crossJoin(F.broadcast(lut_df))
    )
    # PSI·ta·tb·1e9 = Σ (a1·tb − b1·ta)·(qlog2(a1·tb) − qlog2(b1·ta)),
    # every factor an exact integer; DECIMAL(38,0) keeps the product
    # exact at any graded scale
    dec = "decimal(19,0)"
    term = (
        (F.col("a1") * F.col("tb") - F.col("b1") * F.col("ta")).cast(dec)
        * (
            qlog2(F.col("a1") * F.col("tb"))
            - qlog2(F.col("b1") * F.col("ta"))
        ).cast(dec)
    )
    agg = full.groupBy("event_type").agg(
        (F.first("ta") - F.lit(_N_BINS)).alias("n_ref"),
        (F.first("tb") - F.lit(_N_BINS)).alias("n_cur"),
        F.sum(term).alias("_sp"),
        F.count(F.lit(1)).alias("_present"),
        F.first("ta").alias("_ta"),
        F.first("tb").alias("_tb"),
    ).crossJoin(F.broadcast(lut_df))
    missing_term = (
        ((F.lit(_N_BINS) - F.col("_present")) * (F.col("_tb") - F.col("_ta")))
        .cast(dec)
        * (qlog2(F.col("_tb")) - qlog2(F.col("_ta"))).cast(dec)
    )
    total = F.col("_sp") + missing_term
    psi = total.cast("double") / (
        F.col("_ta").cast("double")
        * F.col("_tb").cast("double")
        * F.lit(float(_QLOG_SCALE))
    )
    return agg.select(
        "event_type",
        "n_ref",
        "n_cur",
        psi.alias("psi_bits"),
        (psi > _PSI_DRIFT_BITS).alias("is_drifted"),
    ).orderBy("event_type")


SEGMENT_VALUE_PSI_SQL = f"""
WITH lut AS (SELECT {_QLOG_LUT} AS l),
ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vmicro
  FROM events WHERE value IS NOT NULL
),
bounds AS (
  SELECT min(day) + CAST(date_diff('day', min(day), max(day)) // 2 AS INT)
           AS mid_day,
         min(vmicro) AS v0, max(vmicro) AS v1
  FROM ev
),
b AS (
  SELECT event_type, day < mid_day AS is_ref,
         least((vmicro - v0) * {_N_BINS} // (v1 - v0 + 1),
               {_N_BINS - 1}) AS bin
  FROM ev CROSS JOIN bounds
),
counts AS (
  SELECT event_type, bin,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS bb
  FROM b GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, bin, a + 1 AS a1, bb + 1 AS b1,
         CAST(sum(a) OVER (PARTITION BY event_type) + {_N_BINS}
              AS BIGINT) AS At,
         CAST(sum(bb) OVER (PARTITION BY event_type) + {_N_BINS}
              AS BIGINT) AS Bt
  FROM counts
),
agg AS (
  SELECT event_type,
         CAST(first(At) - {_N_BINS} AS BIGINT) AS n_ref,
         CAST(first(Bt) - {_N_BINS} AS BIGINT) AS n_cur,
         sum(CAST(a1 * Bt - b1 * At AS HUGEINT)
             * CAST({_qlog2_nano_sql("CAST(a1 * Bt AS BIGINT)")}
                    - {_qlog2_nano_sql("CAST(b1 * At AS BIGINT)")}
               AS HUGEINT)) AS sp,
         count(*) AS present,
         first(At) AS At1,
         first(Bt) AS Bt1
  FROM tot CROSS JOIN lut
  GROUP BY event_type
),
closed AS (
  SELECT event_type, n_ref, n_cur,
         CAST(sp + CAST(({_N_BINS} - present) * (Bt1 - At1) AS HUGEINT)
                   * CAST({_qlog2_nano_sql("Bt1")}
                          - {_qlog2_nano_sql("At1")} AS HUGEINT)
              AS DOUBLE) AS s,
         CAST(At1 AS DOUBLE) AS Ad,
         CAST(Bt1 AS DOUBLE) AS Bd
  FROM agg CROSS JOIN lut
)
SELECT event_type, n_ref, n_cur,
       s / (Ad * Bd * {float(_QLOG_SCALE)}) AS psi_bits,
       s / (Ad * Bd * {float(_QLOG_SCALE)}) > {_PSI_DRIFT_BITS}
         AS is_drifted
FROM closed
ORDER BY event_type
"""


def user_spend_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement-trend regression — the third drift-family
    member: an exact ordinary-least-squares slope of daily spend over
    the day index, flagging users whose spend is declining (the churn
    signal a retention monitor computes per account per week).
    Authored r8 (held to the registry bar by tests/test_trend.py while
    the window was full), registered r9.

    Exactness: with x = epoch-day (int) and y = daily spend in
    micro-units (Σ of floor(v·1e6+0.5) — exact), the closed form
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) has an exact
    DECIMAL(38,0) numerator and denominator (products of day-scale ×
    micro-scale sums overflow BIGINT at ~sf10, so decimals from the
    start), and the single closing division is the same IEEE op on
    both engines. Users with one active day have an undefined slope
    (denominator 0) → NULL, never a division blow-up.

    Scale: two hash aggregates sharing the user_id partitioning
    ((user, day) roll-up, then per-user sums) — at 100 TB the first
    agg is map-side combinable and the second reuses the shuffle;
    nothing is corpus-global."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("x"),
            F.floor(F.col("value") * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("vmicro"),
        )
    )
    daily = ev.groupBy("user_id", "x").agg(
        F.sum("vmicro").alias("y")
    )
    dec = "decimal(19,0)"
    agg = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("y").alias("_sy"),
        F.sum("x").alias("_sx"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("_sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("_sxy"),
    )
    num = (
        F.col("n_days").cast(dec) * F.col("_sxy")
        - F.col("_sx").cast(dec) * F.col("_sy").cast(dec)
    )
    den = (
        F.col("n_days").cast(dec) * F.col("_sxx")
        - F.col("_sx").cast(dec) * F.col("_sx").cast(dec)
    )
    slope = F.when(
        den > 0, num.cast("double") / den.cast("double")
    )
    return agg.select(
        "user_id",
        "n_days",
        (F.col("_sy").cast("double") / F.lit(1e6)).alias("total_spend"),
        (slope / F.lit(1e6)).alias("slope_per_day"),
        # sign test on the exact integer numerator, not the double
        # quotient — identical on both engines by construction
        F.coalesce(F.when(den > 0, num < 0), F.lit(False)).alias(
            "is_declining"
        ),
    ).orderBy("user_id")


USER_SPEND_TREND_SQL = """
WITH ev AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vmicro
  FROM events WHERE value IS NOT NULL
),
daily AS (
  SELECT user_id, x, CAST(sum(vmicro) AS BIGINT) AS y
  FROM ev GROUP BY user_id, x
),
agg AS (
  SELECT user_id,
         count(*) AS n_days,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x) AS BIGINT) AS sx,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
  FROM daily GROUP BY user_id
),
c AS (
  SELECT user_id, n_days, sy,
         CAST(n_days AS HUGEINT) * sxy
           - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS num,
         CAST(n_days AS HUGEINT) * sxx
           - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS den
  FROM agg
)
SELECT user_id,
       n_days,
       CAST(sy AS DOUBLE) / 1e6 AS total_spend,
       CASE WHEN den > 0
            THEN (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) / 1e6
       END AS slope_per_day,
       coalesce(CASE WHEN den > 0 THEN num < 0 END, FALSE) AS is_declining
FROM c
ORDER BY user_id
"""


_SKEW_EDGES = (
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)
_SKEW_PPM = 1_000_000


def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic over the registry's three hottest join
    columns — the operational pass that decides, BEFORE a 100 TB join
    runs, whether a key needs salting, AQE skew splitting, or a
    broadcast instead: per (table, key), row/key counts, the heaviest
    key's absolute count and parts-per-million share, and how many
    keys run hotter than 2x / 10x the mean key load. Authored r8
    (held to the registry bar by tests/test_trend.py while the window
    was full), registered r9.

    Exactness: every statistic is integer arithmetic — the mean-load
    comparisons CROSS-MULTIPLY (c·n_keys > factor·n_rows) instead of
    dividing, and the top share is integer ppm (max·1e6 div rows) —
    not a single double in the output.

    Scale: per edge, one count-per-key hash aggregate (map-side
    combinable), a 1-row total, and a second pass over the key-count
    frame against the broadcast total. The two passes share one
    physical shuffle (identical groupBy subtrees → ReuseExchange;
    the per-key frame is |keys|-sized, never |rows|-sized). No global
    window — a millions-of-keys frame through one task would be the
    very skew this query hunts."""
    parts = []
    for table, key in _SKEW_EDGES:
        per_key = (
            load_table(spark, sf_dir, table)
            .filter(F.col(key).isNotNull())
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        tot = per_key.agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_key_rows"),
        )
        hot = (
            per_key.crossJoin(F.broadcast(tot))
            .agg(
                F.first("n_rows").alias("n_rows"),
                F.first("n_keys").alias("n_keys"),
                F.first("max_key_rows").alias("max_key_rows"),
                F.sum(
                    F.when(
                        F.col("c") * F.col("n_keys") > 2 * F.col("n_rows"),
                        1,
                    ).otherwise(0)
                ).alias("keys_gt_2x_mean"),
                F.sum(
                    F.when(
                        F.col("c") * F.col("n_keys") > 10 * F.col("n_rows"),
                        1,
                    ).otherwise(0)
                ).alias("keys_gt_10x_mean"),
            )
            .select(
                F.lit(table).alias("table_name"),
                F.lit(key).alias("key_col"),
                "n_rows",
                "n_keys",
                "max_key_rows",
                F.expr(
                    f"max_key_rows * {_SKEW_PPM} div n_rows"
                ).alias("top_share_ppm"),
                "keys_gt_2x_mean",
                "keys_gt_10x_mean",
            )
        )
        parts.append(hot)
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.orderBy("table_name")


def _skew_edge_sql(table: str, key: str) -> str:
    return f"""(
  WITH pk AS (
    SELECT {key} AS k, count(*) AS c
    FROM {table} WHERE {key} IS NOT NULL GROUP BY {key}
  ),
  tot AS (
    SELECT CAST(sum(c) AS BIGINT) AS nr, count(*) AS nk,
           CAST(max(c) AS BIGINT) AS mx
    FROM pk
  )
  SELECT '{table}' AS table_name, '{key}' AS key_col,
         CAST(first(nr) AS BIGINT) AS n_rows,
         CAST(first(nk) AS BIGINT) AS n_keys,
         CAST(first(mx) AS BIGINT) AS max_key_rows,
         CAST(first(mx) * {_SKEW_PPM} // first(nr) AS BIGINT)
           AS top_share_ppm,
         CAST(sum(CASE WHEN c * nk > 2 * nr THEN 1 ELSE 0 END) AS BIGINT)
           AS keys_gt_2x_mean,
         CAST(sum(CASE WHEN c * nk > 10 * nr THEN 1 ELSE 0 END) AS BIGINT)
           AS keys_gt_10x_mean
  FROM pk CROSS JOIN tot
)"""


JOIN_KEY_SKEW_REPORT_SQL = (
    "\nUNION ALL\n".join(_skew_edge_sql(t, k) for t, k in _SKEW_EDGES)
    + "\nORDER BY table_name\n"
)


# --- rolling histogram quantiles --------------------------------------
# Frozen monitor config (the fixed-edge requirement from
# operators/sketches.py histogram_daily_sketches: edges must agree
# across days or the merge is meaningless). [0, 512) covers the
# events.value domain at every generated SF; width 512/128 = 4.0 is a
# power of two, so the bin arithmetic is IEEE-exact in both engines.
_HQ_LO = 0.0
_HQ_HI = 512.0
_HQ_BINS = 128
_HQ_WINDOW = 7
_HQ_QS = (0.5, 0.95, 0.99)


def events_rolling_value_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling 7-day p50/p95/p99 of events.value from mergeable
    per-day fixed-edge histograms (operators/sketches.py) — the
    graded batch anchor for the standing streaming monitor
    (streaming/quantiles.py calls the SAME two operators on its
    maintained zone, so this row transitively vouches for the
    monitor's read side).

    Why not percentile_approx per window: GK state is not a storable,
    mergeable relation — a rolling percentile would rescan 7 days of
    raw values per output day. The histogram IS mergeable (counts
    add), so at 100 TB each day's events are scanned once into a
    ≤ 128-row sketch and every downstream step — the 7-day fan-out,
    the cumulative walk, the quantile interpolation — runs on
    day×bin-sized frames, scale-free against event volume. Estimate
    error is bounded by one bin width (4.0), an explicit contract.

    Deterministic: integer bin counts + closed-form type-1
    (ceil-rank) quantile with linear interpolation in the hit bin;
    doubles appear only in the final fixed-order IEEE expression, so
    the DuckDB oracle reproduces every bit.
    """
    from ..operators.sketches import (
        histogram_daily_sketches,
        histogram_rolling_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = histogram_daily_sketches(
        ev, "ts", "value", _HQ_LO, _HQ_HI, _HQ_BINS
    )
    return histogram_rolling_quantiles(
        daily, list(_HQ_QS), _HQ_LO, _HQ_HI, _HQ_BINS, _HQ_WINDOW
    ).orderBy("day", "q")


_HQ_WIDTH = (_HQ_HI - _HQ_LO) / _HQ_BINS
_HQ_QS_SQL = ", ".join(f"CAST({q!r} AS DOUBLE)" for q in _HQ_QS)

EVENTS_ROLLING_VALUE_QUANTILES_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         least({_HQ_BINS - 1}, greatest(0,
           CAST(floor((value - {_HQ_LO!r}) / {_HQ_WIDTH!r}) AS INTEGER)
         )) AS bin,
         count(*) AS cnt
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
), fanned AS (
  SELECT d.day + CAST(r.o AS INTEGER) AS target_day, d.day, d.bin, d.cnt
  FROM daily d, unnest(range(0, {_HQ_WINDOW})) AS r(o)
), merged AS (
  SELECT target_day, bin, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM fanned GROUP BY 1, 2
), ndays AS (
  SELECT target_day, count(DISTINCT day) AS n_days_merged
  FROM fanned GROUP BY 1
), cum AS (
  SELECT target_day, bin, cnt,
         CAST(sum(cnt) OVER (
           PARTITION BY target_day ORDER BY bin
         ) AS BIGINT) AS c_cum,
         CAST(sum(cnt) OVER (PARTITION BY target_day) AS BIGINT) AS c_total
  FROM merged
), hit AS (
  SELECT c.target_day, c.bin, c.cnt,
         c.c_cum - c.cnt AS c_prev, c.c_cum, q.q,
         greatest(CAST(1 AS BIGINT), least(c.c_total,
           CAST(ceil(q.q * c.c_total) AS BIGINT))) AS c_rank
  FROM cum c, (SELECT unnest([{_HQ_QS_SQL}]) AS q) q
)
SELECT h.target_day AS day, n.n_days_merged, h.q,
       {_HQ_LO!r} + {_HQ_WIDTH!r}
         * (h.bin + (h.c_rank - h.c_prev) / h.cnt) AS estimate
FROM hit h
JOIN (SELECT DISTINCT day FROM daily) o ON o.day = h.target_day
JOIN ndays n ON n.target_day = h.target_day
WHERE h.c_prev < h.c_rank AND h.c_rank <= h.c_cum
ORDER BY day, q
"""


QUERIES: dict[str, QuerySpec] = {
    "events_hourly_anomaly": QuerySpec(
        events_hourly_anomaly, EVENTS_HOURLY_ANOMALY_SQL
    ),
    "segment_value_psi": QuerySpec(segment_value_psi, SEGMENT_VALUE_PSI_SQL),
    # registered r9 (authored-and-parity-tested in r8 — the window was
    # full; tests/test_trend.py held both to the registry bar since) —
    "user_spend_trend": QuerySpec(user_spend_trend, USER_SPEND_TREND_SQL),
    "join_key_skew_report": QuerySpec(
        join_key_skew_report, JOIN_KEY_SKEW_REPORT_SQL
    ),
    # registered r15 (authored + parity-tested r13 at both scales,
    # tests/test_histogram_rollup.py; held in the queue until the
    # rotation budget opened a slot): the rolling histogram-quantile
    # monitor's graded batch anchor —
    "events_rolling_value_quantiles": QuerySpec(
        events_rolling_value_quantiles, EVENTS_ROLLING_VALUE_QUANTILES_SQL
    ),
}
