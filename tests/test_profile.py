"""The table profiler (operators/profile.py): hand-computable stats on
a synthetic frame with NULLs (the testdata has none), the
exact-vs-approx plan contract, and the r10-slated graded query's
oracle parity at both scales (the registry bar, held here until its
registration clears the rotation budget)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.profile import (
    table_profile,
)
from big_data_analytics_final_project_spark.queries.quality import (
    CUSTOMER_K_ANONYMITY_SQL,
    LINEITEM_PROFILE_SQL,
    ORDERS_PROFILE_DRIFT_SQL,
    customer_k_anonymity,
    lineitem_profile,
    orders_profile_drift,
)

from .conftest import SF_CORRECT, SF_SMOKE
from .parity import compare


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 2.5, "b", "2024-01-02T00:00:00"),
            (2, None, "a", "2024-01-01T00:00:00"),
            (3, 7.5, None, None),
            (4, 2.5, "c", "2024-01-03T12:00:00"),
            (None, -1.0, "a", "2024-01-01T00:00:00"),
        ],
        "k: bigint, v: double, s: string, t: string",
    ).withColumn("t", F.col("t").cast("timestamp"))


def test_stats_by_hand(frame):
    rows = {r["column_name"]: r for r in table_profile(frame).collect()}
    assert set(rows) == {"k", "v", "s", "t"}
    assert all(r["n_rows"] == 5 for r in rows.values())
    k, v, s, t = rows["k"], rows["v"], rows["s"], rows["t"]
    # nulls counted per column; distinct EXCLUDES nulls and dedups
    assert (k["n_nulls"], k["n_distinct"]) == (1, 4)
    assert (v["n_nulls"], v["n_distinct"]) == (1, 3)  # 2.5 twice
    assert (s["n_nulls"], s["n_distinct"]) == (1, 3)  # 'a' twice
    assert (t["n_nulls"], t["n_distinct"]) == (1, 3)
    # typed min/max land in their kind's slot, others NULL
    assert (k["min_num"], k["max_num"]) == (1.0, 4.0)
    assert (v["min_num"], v["max_num"]) == (-1.0, 7.5)
    assert (s["min_str"], s["max_str"]) == ("a", "c")
    assert k["min_str"] is None and v["min_us"] is None
    assert t["min_num"] is None and t["min_str"] is None
    assert t["max_us"] - t["min_us"] == 216_000_000_000  # 2.5 days in us


def test_unprofilable_and_unknown_columns_refused(frame):
    with pytest.raises(ValueError, match="unknown"):
        table_profile(frame, ["nope"])
    arr = frame.withColumn("a", F.array(F.lit(1)))
    with pytest.raises(ValueError, match="unprofilable"):
        table_profile(arr, ["a"])
    # default column selection just skips unprofilable types
    assert {r["column_name"] for r in table_profile(arr).collect()} == {
        "k",
        "v",
        "s",
        "t",
    }


def test_no_expand_in_either_mode(frame):
    """The scale contract: NEITHER mode may take Catalyst's
    multi-distinct Expand rewrite (n_cols-wide null-slotted partial-agg
    keys — measured 22s on 600k lineitem rows before the per-column
    union redesign). Exact mode plans one pruned-scan per-column
    branch over that column's (value, count) group relation (the r18
    fold — no count(distinct) expression appears at all); approx mode
    is a single scan of HLL partials."""
    exact = (
        table_profile(frame)._jdf.queryExecution().executedPlan().toString()
    )
    approx = (
        table_profile(frame, exact_distinct=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in exact
    assert "Expand" not in approx
    # the fold's shape: a Union of per-column branches, and no
    # count(distinct ...) expression anywhere (each branch counts the
    # non-null groups of its own distinct-value relation instead)
    assert "Union" in exact
    assert exact.count("count(distinct") == 0


def test_approx_matches_exact_counts_at_test_cardinality(frame):
    """HLL++ at default rsd is exact-in-practice at tiny cardinality;
    this pins the approx path's wiring (same schema, same non-distinct
    stats) rather than the sketch's error bound."""
    e = table_profile(frame).collect()
    a = table_profile(frame, exact_distinct=False).collect()
    assert [r.asDict() for r in e] == [r.asDict() for r in a]


def test_lineitem_profile_matches_oracle(spark):
    """Same bar as the registry gate: bit-exact at both scales. Own
    DuckDB connection — the session `duck` fixture's views must not
    be repointed."""
    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
        )
        compare(lineitem_profile(spark, sf), con.sql(LINEITEM_PROFILE_SQL))
        con.close()


def test_customer_k_anonymity_matches_oracle(spark):
    """The r13-queued privacy twin at the registry bar: bit-exact at
    both scales. k=6 is non-degenerate at both (the query docstring
    has the group counts) — pin that too, so a testdata regen that
    collapses the QI distribution fails loudly here instead of
    silently grading a trivial report."""
    for sf, below, groups in ((SF_SMOKE, 92, 93), (SF_CORRECT, 2, 125)):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW customer AS SELECT * FROM '{sf}/customer.parquet'"
        )
        compare(customer_k_anonymity(spark, sf), con.sql(CUSTOMER_K_ANONYMITY_SQL))
        con.close()
        r = customer_k_anonymity(spark, sf).collect()[0]
        assert (r["n_groups_below_k"], r["n_groups"]) == (below, groups)
        assert not r["is_k_anonymous"]


def test_orders_profile_drift_matches_oracle(spark):
    """The r13-queued drift twin at the registry bar: bit-exact at
    both scales, plus the semantic pin — the asymmetric profiled
    columns trip schema_drift, the later zone's keys/dates escape the
    reference range, and the no-null generator keeps null_drift
    quiet everywhere."""
    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'"
        )
        compare(orders_profile_drift(spark, sf), con.sql(ORDERS_PROFILE_DRIFT_SQL))
        con.close()
        d = {
            r["column_name"]: r
            for r in orders_profile_drift(spark, sf).collect()
        }
        assert d["o_orderstatus"]["schema_drift"] and not d["o_orderstatus"]["in_cur"]
        assert d["o_orderpriority"]["schema_drift"] and not d["o_orderpriority"]["in_ref"]
        assert d["o_orderdate"]["range_drift"]
        assert not any(r["null_drift"] for r in d.values())


def test_profile_diff_flags_each_drift_kind(spark):
    """Hand-built reference vs current zones, one drift per column:
    `gone`/`added` trip schema_drift, `v` trips null_drift (0 -> 40%),
    `k` trips distinct_drift (5 distinct -> 1 at equal rows), `s`
    trips range_drift ('d' > reference max 'c'), and nothing else
    flags."""
    from big_data_analytics_final_project_spark.operators.profile import (
        profile_diff,
    )

    ref_df = spark.createDataFrame(
        [(i, float(i), "abc"[i % 3], i) for i in range(5)],
        "k: bigint, v: double, s: string, gone: bigint",
    )
    cur_df = spark.createDataFrame(
        [
            (0, 1.0, "a", 7),
            (0, None, "b", 7),
            (0, 2.0, "c", 7),
            (0, None, "d", 7),
            (0, 3.0, "a", 7),
        ],
        "k: bigint, v: double, s: string, added: bigint",
    )
    d = {
        r["column_name"]: r
        for r in profile_diff(
            table_profile(ref_df), table_profile(cur_df)
        ).collect()
    }
    assert set(d) == {"k", "v", "s", "gone", "added"}
    assert d["gone"]["schema_drift"] and not d["gone"]["in_cur"]
    assert d["added"]["schema_drift"] and not d["added"]["in_ref"]
    assert d["v"]["null_drift"]  # 0 ppm -> 400000 ppm
    assert d["v"]["null_ppm_ref"] == 0 and d["v"]["null_ppm_cur"] == 400000
    assert d["k"]["distinct_drift"]  # 5 -> 1 distinct at equal rows
    assert d["s"]["range_drift"]  # 'd' escapes ['a','c']
    # no false positives on the clean dimensions
    assert not d["k"]["null_drift"] and not d["k"]["range_drift"]
    assert not d["s"]["schema_drift"] and not d["s"]["distinct_drift"]


def test_profile_diff_identical_profiles_all_quiet(spark, frame):
    from big_data_analytics_final_project_spark.operators.profile import (
        profile_diff,
    )

    p = table_profile(frame)
    for r in profile_diff(p, p).collect():
        assert not (
            r["schema_drift"]
            or r["null_drift"]
            or r["distinct_drift"]
            or r["range_drift"]
        ), r


def test_k_anonymity_report_by_hand(spark):
    """Hand-computable QI groups: ages x zips where one (34, '99999')
    row is unique and a NULL-zip pair anonymizes itself at k=2."""
    from big_data_analytics_final_project_spark.operators.profile import (
        k_anonymity_report,
    )

    rows = (
        [(30, "11111", i) for i in range(4)]
        + [(30, "22222", i) for i in range(2)]
        + [(34, "99999", 0)]
        + [(40, None, 1), (40, None, 2)]
    )
    df = spark.createDataFrame(rows, "age: int, zip: string, uid: int")
    r = k_anonymity_report(df, ["age", "zip"], k=2).collect()[0]
    assert r["n_rows"] == 9
    assert r["n_groups"] == 4
    assert r["n_groups_below_k"] == 1  # only the unique (34, 99999)
    assert r["n_rows_at_risk"] == 1
    assert r["min_group_size"] == 1
    assert not r["is_k_anonymous"] and r["k"] == 2
    # at k=3 the NULL-zip pair and the (30, 22222) pair fall below too
    r3 = k_anonymity_report(df, ["age", "zip"], k=3).collect()[0]
    assert r3["n_groups_below_k"] == 3 and r3["n_rows_at_risk"] == 5


def test_k_anonymity_validates_columns(spark):
    from big_data_analytics_final_project_spark.operators.profile import (
        k_anonymity_report,
    )

    df = spark.createDataFrame([(1,)], "a: int")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        k_anonymity_report(df, [])
    with _pytest.raises(ValueError, match="unknown"):
        k_anonymity_report(df, ["nope"])


def test_exact_distinct_branches_scan_one_column_each(spark):
    """The 'total IO = one full scan' claim, pinned: every exact-mode
    branch's parquet scan reads exactly ONE column (column-pruned
    ReadSchema), and there are exactly as many scans as profiled
    columns — since the r18 fold there is NO extra all-columns stats
    scan (each branch derives its full stat row from its own
    distinct-value relation), so the union reads each column once."""
    import re

    df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    cols = ["l_orderkey", "l_quantity", "l_returnflag"]
    plan = (
        table_profile(df, cols)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    col_counts = sorted(len(s.split(",")) for s in schemas)
    # three 1-column branches, nothing else
    assert col_counts == [1, 1, 1], schemas
