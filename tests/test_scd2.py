"""scd2_collapse semantics: intervals tile each key's timeline, adjacent
versions really differ, and the collapse matches a brute-force pure-
Python reference on adversarial shapes (NULL attribute flips, repeated
timestamps broken by a tiebreak, single-observation keys)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_analytics_final_project_spark.operators.scd2 import scd2_collapse

_BASE = datetime(2024, 1, 1)


def _brute(rows):
    """rows: (key, seq, attr) sorted fold — independent reference."""
    by_key: dict = {}
    for k, seq, attr in sorted(rows, key=lambda r: (r[0], r[1])):
        by_key.setdefault(k, []).append((seq, attr))
    out = []
    for k, obs in by_key.items():
        versions = []
        for seq, attr in obs:
            if not versions or versions[-1]["attr"] != attr:
                versions.append({"attr": attr, "from": seq, "n": 1})
            else:
                versions[-1]["n"] += 1
        for i, v in enumerate(versions):
            out.append(
                (
                    k,
                    i + 1,
                    v["attr"],
                    v["from"],
                    versions[i + 1]["from"] if i + 1 < len(versions) else None,
                    i + 1 == len(versions),
                    v["n"],
                )
            )
    return sorted(out)


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key (few keys -> collisions)
        st.integers(min_value=0, max_value=40),  # seq -> ts offset
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # attr
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: (r[0], r[1]),  # unique (key, ts): deterministic fold
)


@given(rows=rows_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_scd2_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [
            (k, _BASE + timedelta(hours=seq), attr)
            for k, seq, attr in rows
        ],
        "key: long, ts: timestamp, attr: string",
    )
    got = sorted(
        (
            r["key"],
            r["version"],
            r["attr"],
            int((r["valid_from"] - _BASE).total_seconds() // 3600),
            None
            if r["valid_to"] is None
            else int((r["valid_to"] - _BASE).total_seconds() // 3600),
            r["is_current"],
            r["n_observations"],
        )
        for r in scd2_collapse(df, ["key"], "ts", ["attr"]).collect()
    )
    assert got == _brute(rows)


def test_scd2_multi_attr_and_tiebreak(spark):
    """Two tracked attributes (either flipping opens a version) and a
    repeated timestamp resolved by the tiebreak column."""
    rows = [
        (1, _BASE, 0, "gold", "US"),
        (1, _BASE + timedelta(days=1), 0, "gold", "US"),
        (1, _BASE + timedelta(days=2), 0, "gold", "DE"),  # country flips
        (1, _BASE + timedelta(days=3), 0, "silver", "DE"),  # tier flips
        # same ts, tiebreak orders the flip-back AFTER the flip
        (1, _BASE + timedelta(days=4), 0, "gold", "DE"),
        (1, _BASE + timedelta(days=4), 1, "silver", "DE"),
    ]
    df = spark.createDataFrame(
        rows, "key: long, ts: timestamp, seq: int, tier: string, country: string"
    )
    out = {
        r["version"]: r
        for r in scd2_collapse(
            df, ["key"], "ts", ["tier", "country"], tiebreak_col="seq"
        ).collect()
    }
    assert len(out) == 5
    assert (out[1]["tier"], out[1]["country"], out[1]["n_observations"]) == (
        "gold",
        "US",
        2,
    )
    assert out[2]["country"] == "DE" and out[2]["tier"] == "gold"
    assert out[3]["tier"] == "silver"
    assert out[4]["tier"] == "gold"
    assert out[5]["tier"] == "silver" and out[5]["is_current"]
    # intervals chain: each valid_to equals the next valid_from
    for v in range(1, 5):
        assert out[v]["valid_to"] == out[v + 1]["valid_from"]
    assert out[5]["valid_to"] is None


def test_scd2_single_shuffle_for_the_heavy_pass(spark):
    """Plan shape: the change-flag window, version numbering, and the
    collapse aggregate share one key-partitioned exchange; only the
    tiny collapsed-frame lead() adds a second."""
    from big_data_analytics_final_project_spark.plans import count_shuffles

    df = spark.range(0, 1000).selectExpr(
        "id % 10 AS key",
        "TIMESTAMP'2024-01-01' + make_interval(0, 0, 0, 0, CAST(id AS INT), 0, 0) AS ts",
        "CAST(id % 3 AS STRING) AS attr",
    )
    out = scd2_collapse(df, ["key"], "ts", ["attr"])
    assert count_shuffles(out) <= 2


def test_purchase_pit_order_status_matches_oracle(spark):
    """The r17-queued graded surface at the registry bar: the
    as-of/SCD2 point-in-time join must hash-match DuckDB's native
    ASOF LEFT JOIN over the same version CTE at BOTH grading scales,
    with both matched and never-ordered (NULL-feature) purchases
    present — a vacuous all-NULL or all-matched relation would grade
    nothing."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.windows import (
        PURCHASE_PIT_ORDER_STATUS_SQL,
        purchase_pit_order_status,
    )

    from .conftest import SF_CORRECT, SF_SMOKE
    from .parity import compare

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        for t in ("events", "orders"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        res = purchase_pit_order_status(spark, sf)
        compare(res, con.sql(PURCHASE_PIT_ORDER_STATUS_SQL))
        con.close()
        rows = res.collect()
        n_matched = sum(1 for r in rows if r["status_version"] is not None)
        assert 0 < n_matched  # PIT matches exist
        # leakage check on the Spark side: every attached version was
        # valid AT OR BEFORE the event (the property the join exists
        # to guarantee) — recompute valid_from per (user, version)
        scd2 = {
            (r["o_custkey"], r["version"]): r["valid_from"]
            for r in __import__(
                "big_data_analytics_final_project_spark.queries.windows",
                fromlist=["customer_status_scd2"],
            ).customer_status_scd2(spark, sf).collect()
        }
        for r in rows:
            if r["status_version"] is not None:
                vf = scd2[(r["user_id"], r["status_version"])]
                assert vf <= r["ts"], (r, vf)
