"""Semantic tests for the observability/drift family (queries/drift.py).

The DuckDB oracle twins prove CROSS-ENGINE equality, but both sides
share the formula — a formula that never flags anything would still
hash-match. These tests prove the DETECTORS detect: an injected volume
spike must raise `is_anomaly`, an injected distribution shift must
raise `is_drifted`, and undisturbed data must stay quiet (checked on
the real testdata in the parity suite; here on controlled synthetics
written in the events-table shape so the registered query functions
run unmodified)."""

from __future__ import annotations

import datetime as dt

import pytest

from big_data_analytics_final_project_spark.queries.drift import (
    events_hourly_anomaly,
    segment_value_psi,
)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def _steady_hours(n_hours, per_hour, spike_hour=None, spike_factor=20,
                  jitter=0):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(n_hours):
        n = per_hour * (spike_factor if h == spike_hour else 1) + (
            h % 3 if jitter else 0
        )
        for i in range(n):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(hours=h, seconds=i % 3600),
                    eid % 7,
                    "click",
                    1.0,
                    None,
                )
            )
            eid += 1
    return rows


def test_hourly_anomaly_flags_injected_spike(spark, tmp_path):
    """40 steady hours at 30 events/h with hour 30 spiked 20x: exactly
    that hour must flag; the warm-up hours and the steady tail must
    not. Also pins the self-excluding frame: the hour AFTER the spike
    sees the spike in its baseline (inflated mean/var) and must stay
    quiet rather than flag as a 'dip'."""
    sf = _write_events(
        spark, tmp_path, _steady_hours(40, 30, spike_hour=30, jitter=1)
    )
    rows = {r["hour"].hour + 24 * (r["hour"].day - 1): r
            for r in events_hourly_anomaly(spark, sf).collect()}
    assert len(rows) == 40
    assert rows[30]["is_anomaly"], rows[30]
    assert rows[30]["z"] > 3
    quiet = [h for h, r in rows.items() if r["is_anomaly"] and h != 30]
    assert not quiet, f"false positives at hours {quiet}"
    # warm-up: first 12 hours can never flag (n_trail < 12)
    assert all(not rows[h]["is_anomaly"] for h in range(12))


def test_hourly_anomaly_constant_stream_has_zero_variance(spark, tmp_path):
    """Perfectly constant traffic: variance numerator is exactly 0, so
    z must be NULL (never a division blow-up) and nothing flags."""
    sf = _write_events(spark, tmp_path, _steady_hours(30, 25))
    out = events_hourly_anomaly(spark, sf).collect()
    assert all(r["z"] is None for r in out)
    assert all(not r["is_anomaly"] for r in out)
    # trailing mean still reported once the frame is non-empty
    assert out[5]["trail_mean"] == 25.0


def _two_period_values(n_per_half, cur_shift):
    """Days 0-13 low-valued reference, days 15-28 current (the skipped
    day keeps the integer midpoint — day 14 — strictly between the
    halves, so n_ref/n_cur are exactly n_per_half each)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day0, shift in ((0, 0.0), (15, cur_shift)):
        for i in range(n_per_half):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(days=day0 + (i % 14), hours=i % 24),
                    eid % 5,
                    "click",
                    float(i % 100) + shift,
                    None,
                )
            )
            eid += 1
    return rows


def test_psi_flags_injected_shift_and_stays_quiet_without(spark, tmp_path):
    """Values uniform on [0,100) in the reference half vs shifted to
    [400,500) in the current half: total separation, PSI must exceed
    the 0.25-bit drift threshold by a wide margin. The unshifted twin
    (same generator, shift 0) must report near-zero PSI and no flag —
    same query, only the data moved."""
    drifted = _write_events(
        spark, tmp_path / "a", _two_period_values(800, 400.0)
    )
    out = {r["event_type"]: r for r in segment_value_psi(spark, drifted).collect()}
    assert out["click"]["is_drifted"], out["click"]
    assert out["click"]["psi_bits"] > 1.0
    assert out["click"]["n_ref"] == 800 and out["click"]["n_cur"] == 800

    quiet = _write_events(
        spark, tmp_path / "b", _two_period_values(800, 0.0)
    )
    out2 = {r["event_type"]: r for r in segment_value_psi(spark, quiet).collect()}
    assert not out2["click"]["is_drifted"], out2["click"]
    assert abs(out2["click"]["psi_bits"]) < 0.05


def test_psi_smoothing_keeps_empty_bins_defined(spark, tmp_path):
    """All mass in one bin on both sides: 9 empty bins per half must
    not produce NULL/inf PSI (the +1 smoothing term) — PSI is finite
    and tiny, not NaN."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(days=(28 if i % 2 else 1)), i, "view", 5.0, None)
        for i in range(200)
    ]
    sf = _write_events(spark, tmp_path, rows)
    [r] = segment_value_psi(spark, sf).collect()
    assert r["psi_bits"] is not None
    assert r["psi_bits"] == pytest.approx(0.0, abs=1e-6)
    assert not r["is_drifted"]


def test_hourly_anomaly_spike_over_flat_baseline(spark, tmp_path):
    """Zero-variance baseline + a spike: z is undefined (NULL) but the
    infinite-sigma branch must still flag the deviating hour."""
    sf = _write_events(
        spark, tmp_path, _steady_hours(40, 30, spike_hour=30)
    )
    rows = {r["hour"].hour + 24 * (r["hour"].day - 1): r
            for r in events_hourly_anomaly(spark, sf).collect()}
    assert rows[30]["z"] is None
    assert rows[30]["is_anomaly"]
    # the spike then sits in later hours' baselines: variance is now
    # positive there, and steady 30s are within 3 sigma - quiet
    quiet = [h for h, r in rows.items() if r["is_anomaly"] and h != 30]
    assert not quiet, f"false positives at hours {quiet}"


def test_psi_excludes_null_values(spark, tmp_path):
    """NULL-valued events must not reach the binning: a NULL bin row
    would distort the analytic missing-bin fold identically on both
    engines — the one failure mode the oracle can't catch — so the
    exclusion is pinned here: counts match the non-null subset."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(120):
        v = None if i % 3 == 0 else float(i % 50)
        rows.append(
            (i, base + dt.timedelta(days=(20 if i % 2 else 2)), i, "view", v, None)
        )
    sf = _write_events(spark, tmp_path, rows)
    [r] = segment_value_psi(spark, sf).collect()
    assert r["n_ref"] + r["n_cur"] == 80  # 120 minus the 40 NULLs
