"""Histogram quantile rollup: lossless merge (rolling from daily
sketches == histogramming the raw window), one-bin-width accuracy
against the true windowed quantile, exact equality with a pure-Python
reference of the binned estimator on hypothesis-generated streams, and
partitioning independence."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.sketches import (
    histogram_daily_sketches,
    histogram_rolling_quantiles,
)

LO, HI, BINS = 0.0, 100.0, 50
WIDTH = (HI - LO) / BINS
BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _df(spark, day_values, n_partitions=8):
    """day_values: {day_offset: [floats]} -> (ts, v) frame."""
    rows = [
        (BASE + dt.timedelta(days=off), float(v))
        for off, vals in day_values.items()
        for v in vals
    ]
    return spark.createDataFrame(
        rows, "ts: timestamp, v: double"
    ).repartition(n_partitions)


def _rolling(spark, day_values, qs, w):
    daily = histogram_daily_sketches(
        _df(spark, day_values), "ts", "v", LO, HI, BINS
    )
    out = histogram_rolling_quantiles(daily, qs, LO, HI, BINS, w).collect()
    return {
        (r.day.isoformat(), r.q): (r.n_days_merged, r.estimate) for r in out
    }


def _ref_estimate(values, q):
    """Pure-Python reference of the SAME binned type-1 + interpolation
    estimator (clamped bins, ceil rank)."""
    bins = [0] * BINS
    for v in values:
        b = min(BINS - 1, max(0, math.floor((v - LO) / WIDTH)))
        bins[b] += 1
    total = sum(bins)
    rank = max(1, min(total, math.ceil(q * total)))
    cum = 0
    for b, c in enumerate(bins):
        if cum < rank <= cum + c:
            return LO + WIDTH * (b + (rank - cum) / c)
        cum += c
    raise AssertionError("rank not reached")


def _true_quantile(values, q):
    s = sorted(values)
    rank = max(1, min(len(s), math.ceil(q * len(s))))
    return s[rank - 1]


def test_rolling_merge_is_lossless(spark):
    """A 3-day window's estimate equals the estimate from
    histogramming the raw union of those 3 days directly — the
    pre-aggregation costs nothing."""
    day_values = {
        0: [5.0, 7.0, 93.0],
        1: [15.0] * 10 + [55.0],
        2: [33.0, 34.0, 35.0, 90.0],
        3: [1.0, 99.0],
    }
    got = _rolling(spark, day_values, [0.5, 0.9], w=3)
    for target_off in range(4):
        window_vals = [
            v
            for off, vals in day_values.items()
            for v in vals
            if target_off - 2 <= off <= target_off
        ]
        day = (BASE + dt.timedelta(days=target_off)).date().isoformat()
        for q in (0.5, 0.9):
            n_days, est = got[(day, q)]
            assert n_days == len(
                [o for o in day_values if target_off - 2 <= o <= target_off]
            )
            assert est == _ref_estimate(window_vals, q), (day, q)


def test_estimate_within_one_bin_width(spark):
    """For in-range data the estimate sits within one bin width of the
    true (type-1) windowed quantile."""
    day_values = {
        0: [float(i % 97) for i in range(500)],
        1: [float((i * 7) % 89) + 0.5 for i in range(400)],
    }
    got = _rolling(spark, day_values, [0.1, 0.5, 0.95], w=2)
    day1 = (BASE + dt.timedelta(days=1)).date().isoformat()
    window_vals = day_values[0] + day_values[1]
    for q in (0.1, 0.5, 0.95):
        _, est = got[(day1, q)]
        assert abs(est - _true_quantile(window_vals, q)) <= WIDTH, q


def test_out_of_range_values_clamp_to_edge_bins(spark):
    """Values below lo / above hi land in the edge bins: estimates
    stay inside [lo, hi] and become bounds at the edges."""
    day_values = {0: [-50.0, -20.0, 50.0, 500.0, 600.0]}
    got = _rolling(spark, day_values, [0.01, 0.5, 0.99], w=1)
    day0 = BASE.date().isoformat()
    for q in (0.01, 0.5, 0.99):
        _, est = got[(day0, q)]
        assert LO <= est <= HI
    assert got[(day0, 0.5)][1] == _ref_estimate(day_values[0], 0.5)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vals0=st.lists(
        st.floats(min_value=0.0, max_value=99.9, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    vals1=st.lists(
        st.floats(min_value=0.0, max_value=99.9, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    q=st.sampled_from([0.0, 0.25, 0.5, 0.75, 0.9, 1.0]),
)
def test_matches_pure_python_reference_exactly(spark, vals0, vals1, q):
    """Bit-exact agreement with the reference estimator on arbitrary
    streams — the determinism a DuckDB oracle would grade."""
    day_values = {0: vals0, 1: vals1}
    got = _rolling(spark, day_values, [q], w=2)
    day1 = (BASE + dt.timedelta(days=1)).date().isoformat()
    _, est = got[(day1, q)]
    assert est == _ref_estimate(vals0 + vals1, q)


def test_partitioning_independent(spark):
    """Same estimates at 1 and 16 input partitions (exact integer
    counts; no accumulation-order sensitivity)."""
    day_values = {0: [float((i * 13) % 83) for i in range(300)]}
    daily_1 = histogram_daily_sketches(
        _df(spark, day_values, n_partitions=1), "ts", "v", LO, HI, BINS
    )
    daily_16 = histogram_daily_sketches(
        _df(spark, day_values, n_partitions=16), "ts", "v", LO, HI, BINS
    )
    r1 = sorted(
        histogram_rolling_quantiles(daily_1, [0.5], LO, HI, BINS, 1).collect()
    )
    r16 = sorted(
        histogram_rolling_quantiles(
            daily_16, [0.5], LO, HI, BINS, 1
        ).collect()
    )
    assert r1 == r16


def test_plan_is_jvm_only(spark):
    """Inspect the LAZY (declarative) form — the materialized default
    returns a checkpointed-RDD scan whose plan would pass vacuously."""
    from big_data_analytics_final_project_spark.operators.checkpoints import (
        lazy_results,
    )

    day_values = {0: [1.0, 2.0], 1: [3.0]}
    daily = histogram_daily_sketches(
        _df(spark, day_values), "ts", "v", LO, HI, BINS
    )
    with lazy_results():
        out = histogram_rolling_quantiles(daily, [0.5], LO, HI, BINS, 7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_rolling_materialize_scans_input_once(spark):
    """The scan-once contract: `daily` has three consumers (merge
    fan-out, day counter, observed join) and column pruning
    specializes each branch past exchange reuse, so the LAZY plan
    embeds the daily derivation (and any corpus scan under it) three
    times; the materialized default must instead checkpoint daily
    once — result plan reads ONLY the checkpointed RDDs — and free
    the intermediate, leaving at most the result's own block set."""
    import re

    from big_data_analytics_final_project_spark.operators.checkpoints import (
        lazy_results,
    )

    from .conftest import require_classic

    require_classic(spark)
    spark.catalog.clearCache()
    day_values = {0: [1.0, 2.0, 50.0], 1: [3.0, 9.0], 3: [70.0]}
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    def build():
        daily = histogram_daily_sketches(
            _df(spark, day_values), "ts", "v", LO, HI, BINS
        )
        return histogram_rolling_quantiles(daily, [0.5], LO, HI, BINS, 7)

    out = build()
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert len(re.findall(r"Scan ExistingRDD", plan)) == 1, plan
    assert "Scan parquet" not in plan
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after - before <= 1  # daily's checkpoint freed, result kept
    with lazy_results():
        lazy = build()
    lazy.collect()
    lazy_plan = (
        lazy._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # the lazy twin proves the hazard is real: the daily source
    # subtree appears once per consumer branch there
    n_src = len(re.findall(r"Scan ExistingRDD|LocalTableScan", lazy_plan))
    assert n_src >= 2, lazy_plan
    key = lambda r: (r.day.isoformat(), r.q)  # noqa: E731
    assert sorted(lazy.collect(), key=key) == sorted(out.collect(), key=key)


def test_segmented_rollup_equals_per_segment_runs(spark):
    """by=[segment]: each segment's rolling estimates are EXACTLY what
    a standalone (filtered) run produces — segmentation is pure
    partitioning, no cross-segment bleed."""
    rows = [
        (BASE + dt.timedelta(days=off), seg, float(v))
        for off, seg, vals in (
            (0, "a", [5.0, 7.0, 93.0]),
            (0, "b", [50.0] * 5),
            (1, "a", [15.0] * 7 + [55.0]),
            (1, "b", [60.0, 61.0]),
            (2, "a", [33.0, 90.0]),
        )
        for v in vals
    ]
    df = spark.createDataFrame(
        rows, "ts: timestamp, seg: string, v: double"
    ).repartition(8)
    daily = histogram_daily_sketches(
        df, "ts", "v", LO, HI, BINS, by=["seg"]
    )
    got = {
        (r.seg, r.day.isoformat(), r.q): (r.n_days_merged, r.estimate)
        for r in histogram_rolling_quantiles(
            daily, [0.5, 0.9], LO, HI, BINS, 2, by=["seg"]
        ).collect()
    }
    for seg in ("a", "b"):
        solo_daily = histogram_daily_sketches(
            df.filter(F.col("seg") == seg), "ts", "v", LO, HI, BINS
        )
        solo = {
            (seg, r.day.isoformat(), r.q): (r.n_days_merged, r.estimate)
            for r in histogram_rolling_quantiles(
                solo_daily, [0.5, 0.9], LO, HI, BINS, 2
            ).collect()
        }
        for k, v in solo.items():
            assert got[k] == v, k
    # segment b has no day-2 row: no phantom output for it
    day2 = (BASE + dt.timedelta(days=2)).date().isoformat()
    assert ("b", day2, 0.5) not in got


def test_events_rolling_value_quantiles_matches_oracle(spark):
    """The r14/r15-queued graded surface at the registry bar:
    bit-exact at both scales, plus the semantic pins — one row per
    (observed day, q), a full 7-day window once warmed up, and every
    estimate inside the frozen [lo, hi) bounds (values clamp into the
    edge bins, so an estimate outside the bounds is arithmetic
    breakage, not data drift)."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.drift import (
        EVENTS_ROLLING_VALUE_QUANTILES_SQL,
        _HQ_HI,
        _HQ_LO,
        _HQ_QS,
        events_rolling_value_quantiles,
    )

    from .conftest import SF_CORRECT, SF_SMOKE
    from .parity import compare

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        res = events_rolling_value_quantiles(spark, sf)
        compare(res, con.sql(EVENTS_ROLLING_VALUE_QUANTILES_SQL))
        con.close()
        rows = res.collect()
        days = {r.day for r in rows}
        assert len(rows) == len(days) * len(_HQ_QS)
        assert max(r.n_days_merged for r in rows) == 7
        assert all(_HQ_LO <= r.estimate < _HQ_HI for r in rows)


def test_events_rolling_value_quantiles_one_bin_accuracy(spark):
    """Estimator QUALITY pin for the r14/r15-queued query (the
    determinism side is the bit-exact oracle): each (day, q) estimate
    must sit within ONE BIN WIDTH (4.0) of the TRUE windowed quantile
    computed from raw rows — the operator's explicit error contract.
    sf0.001 only: its value range fits [0, 512) so no edge-bin
    clamping weakens the bound."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.drift import (
        _HQ_BINS,
        _HQ_HI,
        _HQ_LO,
        _HQ_WINDOW,
        events_rolling_value_quantiles,
    )

    from .conftest import SF_SMOKE

    width = (_HQ_HI - _HQ_LO) / _HQ_BINS
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'")
    lo_v, hi_v = con.sql(
        "SELECT min(value), max(value) FROM events"
    ).fetchone()
    assert _HQ_LO <= lo_v and hi_v < _HQ_HI  # no clamped values here
    true_q = {}
    for q in (0.5, 0.95, 0.99):
        for d, v in con.sql(f"""
            WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
            SELECT d.day, quantile_disc(e.value, {q}) AS trueq
            FROM days d
            JOIN events e
              ON CAST(e.ts AS DATE) BETWEEN d.day - {_HQ_WINDOW - 1} AND d.day
            WHERE e.value IS NOT NULL
            GROUP BY 1
        """).fetchall():
            true_q[(d.isoformat(), q)] = v
    con.close()
    rows = events_rolling_value_quantiles(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        t = true_q[(r.day.isoformat(), r.q)]
        assert abs(r.estimate - float(t)) <= width + 1e-9, (
            r.day, r.q, r.estimate, t,
        )
