"""Misra-Gries frequent-items: the sketch's two-sided contract against
exact counts — every reported interval must contain the true count,
every sufficiently-heavy item must be reported — on skewed, uniform,
and adversarially small inputs across many partitions."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.sketches import (
    frequent_items_mg,
)


def _run(spark, values, capacity, n_partitions=8):
    df = (
        spark.createDataFrame([(v,) for v in values], "item: string")
        .repartition(n_partitions)
    )
    rows = frequent_items_mg(df, "item", capacity=capacity).collect()
    return {r.item: (r.count_lower, r.count_upper) for r in rows}


def _check_contract(got, values, capacity):
    exact = Counter(values)
    d = None
    for item, (lo, hi) in got.items():
        assert lo <= exact[item] <= hi, (item, lo, exact[item], hi)
        if d is None:
            d = hi - lo
        assert hi - lo == d  # one global error mass for every item
    # recall: anything heavier than the decremented mass is present
    if got:
        for item, c in exact.items():
            if c > d:
                assert item in got, (item, c, d)
    return d


def test_skewed_stream(spark):
    """One dominant key + a long uniform tail: the heavy hitter must
    survive with a tight interval even at a small capacity."""
    values = ["hot"] * 5000 + [f"cold_{i}" for i in range(2000)] * 2
    got = _run(spark, values, capacity=16)
    d = _check_contract(got, values, capacity=16)
    assert "hot" in got
    lo, hi = got["hot"]
    assert lo <= 5000 <= hi
    # total decremented mass is bounded by n/(capacity+1)
    assert d <= len(values) // (16 + 1) + 1


def test_low_cardinality_is_exact(spark):
    """Fewer distinct items than capacity: no decrements ever fire and
    the sketch degenerates to exact counts (lower == upper)."""
    values = [str(i % 5) for i in range(1000)]
    got = _run(spark, values, capacity=64)
    exact = Counter(values)
    assert set(got) == set(exact)
    for item, (lo, hi) in got.items():
        assert lo == hi == exact[item]


@given(
    data=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=300
    ),
    capacity=st.sampled_from([2, 4, 8]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_contract_fuzz(spark, data, capacity):
    values = [str(v) for v in data]
    got = _run(spark, values, capacity=capacity, n_partitions=3)
    _check_contract(got, values, capacity)


# ---------------------------------------------------------------- CMS


def test_cms_estimate_ge_true_and_exact_when_sparse(spark):
    """est >= true always; with width >> distinct keys and no
    collisions across all depth rows, est == true exactly."""
    from big_data_analytics_final_project_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    values = ["a"] * 50 + ["b"] * 30 + ["c"] * 7 + ["d"]
    df = spark.createDataFrame(
        [(v,) for v in values], "item: string"
    ).repartition(8)
    exact = Counter(values)
    keys = spark.createDataFrame(
        [(k,) for k in exact], "item: string"
    )
    for width in (8, 4096):
        sketch = count_min_sketch(df, "item", depth=3, width=width)
        got = {
            r.item: r.cms_est
            for r in cms_estimate(
                sketch, keys, "item", depth=3, width=width
            ).collect()
        }
        assert set(got) == set(exact)
        for k, c in exact.items():
            assert got[k] >= c, (width, k, got[k], c)
        if width == 4096:
            # 4 keys x 3 rows in 4096 buckets: md5 scatters them
            # collision-free (verified by this assertion itself)
            assert got == dict(exact)


def test_cms_merges_by_addition(spark):
    """sketch(A union B) == per-part sketches summed on (r, bucket) —
    the property that lets executors build sketches independently."""
    from big_data_analytics_final_project_spark.operators.sketches import (
        count_min_sketch,
    )

    a_vals = [f"k{i % 17}" for i in range(300)]
    b_vals = [f"k{i % 23}" for i in range(200)]
    mk = lambda vals: spark.createDataFrame(  # noqa: E731
        [(v,) for v in vals], "item: string"
    )
    whole = {
        (r.r, r.bucket): r.cnt
        for r in count_min_sketch(
            mk(a_vals + b_vals), "item", depth=3, width=32
        ).collect()
    }
    sa = count_min_sketch(mk(a_vals), "item", depth=3, width=32)
    sb = count_min_sketch(mk(b_vals), "item", depth=3, width=32)
    merged = {}
    for r in sa.unionByName(sb).groupBy("r", "bucket").agg(
        F.sum("cnt").alias("cnt")
    ).collect():
        merged[(r.r, r.bucket)] = r.cnt
    assert merged == whole


def test_cms_ignores_null_keys(spark):
    from big_data_analytics_final_project_spark.operators.sketches import (
        count_min_sketch,
    )

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "item: string"
    )
    total = (
        count_min_sketch(df, "item", depth=2, width=16)
        .groupBy("r")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    )
    # each depth row counts every non-null input exactly once
    assert {r.n for r in total} == {2}


def test_cms_oracle_parity(spark):
    """Registry bar for the r9-slated `user_freq_cms` query
    (queries/windows.py): bit-exact Spark==DuckDB at both the smoke
    and the grading scale — a FULL exact oracle (the estimates are
    deterministic), not an acceptance check."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.windows import (
        USER_FREQ_CMS_SQL,
        user_freq_cms,
    )

    from .conftest import SF_CORRECT, SF_SMOKE
    from .parity import compare

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        compare(user_freq_cms(spark, sf), con.sql(USER_FREQ_CMS_SQL))
        con.close()


def test_cms_collisions_do_occur_at_query_shape(spark):
    """The graded shape (width 64 < 150 users at sf0.01) must actually
    exercise collisions — a sketch with zero overestimate anywhere
    would make `est_ge_true` vacuous."""
    from big_data_analytics_final_project_spark.queries.windows import (
        user_freq_cms,
    )

    from .conftest import SF_CORRECT

    rows = user_freq_cms(spark, SF_CORRECT).collect()
    assert len(rows) == 10
    assert all(r.est_ge_true for r in rows)
    assert any(r.overestimate > 0 for r in rows)


# ------------------------------------------------------- HLL rollup


def test_hll_rollup_preagg_is_lossless(spark):
    """The pattern's load-bearing property: merging per-day sketches
    gives the SAME estimate as sketching each window's raw rows
    directly — HLL union is lossless over sketch state, so daily
    pre-aggregation costs no accuracy."""
    from big_data_analytics_final_project_spark.operators.sketches import (
        hll_daily_sketches,
        hll_rolling_distinct,
    )
    from big_data_analytics_final_project_spark.sources import load_table

    from .conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    daily = hll_daily_sketches(events, "ts", "user_id")
    got = {
        r.day: (r.n_days_merged, r.approx_distinct)
        for r in hll_rolling_distinct(daily, window_days=7).collect()
    }
    days = sorted(got)
    assert days  # non-vacuous
    import datetime as dt

    for day in days:
        lo = day - dt.timedelta(days=6)
        direct = (
            events.filter(
                (F.to_date("ts") >= F.lit(lo)) & (F.to_date("ts") <= F.lit(day))
            )
            .filter(F.col("user_id").isNotNull())
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg(F.col("user_id"), F.lit(12))
                ).alias("e")
            )
            .collect()[0]
            .e
        )
        assert got[day][1] == direct, (day, got[day], direct)


def test_hll_rollup_tracks_exact_within_5pct(spark):
    from big_data_analytics_final_project_spark.operators.sketches import (
        hll_daily_sketches,
        hll_rolling_distinct,
    )
    from big_data_analytics_final_project_spark.sources import load_table

    from .conftest import SF_CORRECT

    events = load_table(spark, SF_CORRECT, "events")
    daily = hll_daily_sketches(events, "ts", "user_id")
    approx = {
        r.day: r.approx_distinct
        for r in hll_rolling_distinct(daily, window_days=7).collect()
    }
    exact_rows = (
        events.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .collect()
    )
    import datetime as dt
    from collections import defaultdict

    by_day = defaultdict(set)
    for r in exact_rows:
        by_day[r.day].add(r.user_id)
    for day, est in approx.items():
        exact = len(
            set().union(
                *(
                    by_day.get(day - dt.timedelta(days=o), set())
                    for o in range(7)
                )
            )
        )
        assert abs(est - exact) <= max(1, 0.05 * exact), (day, est, exact)


def test_hll_rollup_day_coverage_and_warmup(spark):
    """One output row per observed day — no phantom days past the
    range — and n_days_merged ramps 1..7 then holds (contiguous
    testdata days)."""
    from big_data_analytics_final_project_spark.operators.sketches import (
        hll_daily_sketches,
        hll_rolling_distinct,
    )
    from big_data_analytics_final_project_spark.sources import load_table

    from .conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    daily = hll_daily_sketches(events, "ts", "user_id")
    obs = {r.day for r in daily.select("day").collect()}
    rows = hll_rolling_distinct(daily, window_days=7).collect()
    assert {r.day for r in rows} == obs
    import datetime as dt

    first = min(obs)
    for r in rows:
        want = min(7, (r.day - first).days + 1)
        assert r.n_days_merged == want, (r.day, r.n_days_merged, want)


def test_cms_join_size_upper_bound_and_exact_when_sparse(spark):
    """The inner-product estimator: est >= |A join B| always; with
    width >> keys (collision-free scatter) est == true exactly. True
    join size is sum over keys of cnt_A(k)*cnt_B(k)."""
    from big_data_analytics_final_project_spark.operators.sketches import (
        cms_join_size_estimate,
        count_min_sketch,
    )

    a_vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 7 + ["x"]
    b_vals = ["a"] * 4 + ["b"] * 10 + ["c"] * 2 + ["y"] * 5
    ca, cb = Counter(a_vals), Counter(b_vals)
    true_size = sum(ca[k] * cb[k] for k in ca.keys() & cb.keys())
    dfa = spark.createDataFrame([(v,) for v in a_vals], "k: string")
    dfb = spark.createDataFrame([(v,) for v in b_vals], "k: string")
    for width in (8, 4096):
        sa = count_min_sketch(dfa, "k", depth=3, width=width)
        sb = count_min_sketch(dfb, "k", depth=3, width=width)
        est = cms_join_size_estimate(sa, sb).collect()[0]["join_size_est"]
        assert est >= true_size, (width, est, true_size)
        if width == 4096:
            assert est == true_size
    # sanity: the real join agrees with the hand count
    assert dfa.join(dfb, "k").count() == true_size


def test_cms_join_size_zero_when_disjoint(spark):
    """Disjoint key sets: some hash row proves the join empty (no
    co-occupied bucket), and the estimator must return EXACTLY 0 even
    though the inner join drops that row from the per-row frame."""
    from big_data_analytics_final_project_spark.operators.sketches import (
        cms_join_size_estimate,
        count_min_sketch,
    )

    dfa = spark.createDataFrame([("a",), ("b",)], "k: string")
    dfb = spark.createDataFrame([("x",), ("y",)], "k: string")
    sa = count_min_sketch(dfa, "k", depth=3, width=4096)
    sb = count_min_sketch(dfb, "k", depth=3, width=4096)
    est = cms_join_size_estimate(sa, sb).collect()[0]["join_size_est"]
    assert est == 0


def test_cms_join_size_from_merged_sketches(spark):
    """Sketch algebra end to end: sketches built per-part and summed
    on (r, bucket) estimate the join of the UNIONED data — the
    1000-executor build path."""
    from big_data_analytics_final_project_spark.operators.sketches import (
        cms_join_size_estimate,
        count_min_sketch,
    )

    part1 = ["a"] * 5 + ["b"] * 3
    part2 = ["a"] * 2 + ["c"] * 4
    b_vals = ["a"] * 3 + ["c"] * 2
    dfu = spark.createDataFrame([(v,) for v in part1 + part2], "k: string")
    merged = (
        count_min_sketch(
            spark.createDataFrame([(v,) for v in part1], "k: string"), "k"
        )
        .unionByName(
            count_min_sketch(
                spark.createDataFrame([(v,) for v in part2], "k: string"),
                "k",
            )
        )
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = count_min_sketch(dfu, "k")
    sb = count_min_sketch(
        spark.createDataFrame([(v,) for v in b_vals], "k: string"), "k"
    )
    est_merged = cms_join_size_estimate(merged, sb).collect()[0][
        "join_size_est"
    ]
    est_whole = cms_join_size_estimate(whole, sb).collect()[0][
        "join_size_est"
    ]
    assert est_merged == est_whole


def test_join_size_cms_query_matches_oracle(spark):
    """The r10-slated graded twin at the registry bar: bit-exact at
    both scales (own DuckDB connection per scale)."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.windows import (
        JOIN_SIZE_CMS_SQL,
        join_size_cms,
    )

    from .conftest import SF_CORRECT, SF_SMOKE
    from .parity import compare

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        compare(join_size_cms(spark, sf), con.sql(JOIN_SIZE_CMS_SQL))
        con.close()


def test_groupwise_mg_contract_per_group(spark):
    """Per-group Misra-Gries: the two-sided contract held WITHIN each
    group — bounds contain the true within-group counts with one error
    mass per group, every group's guaranteed-heavy items are present,
    and a low-cardinality group degenerates to exact counts even while
    a high-cardinality sibling decrements."""
    from collections import Counter

    from big_data_analytics_final_project_spark.operators.sketches import (
        frequent_items_mg_by,
    )

    data = (
        [("en", "hot")] * 3000
        + [("en", f"cold_{i}") for i in range(1500)] * 2
        + [("de", str(i % 3)) for i in range(900)]  # 3 distinct: exact
        + [("fr", "dominant")] * 500
        + [("fr", f"tail_{i}") for i in range(800)]
    )
    df = spark.createDataFrame(
        data, "lang: string, tok: string"
    ).repartition(8)
    rows = frequent_items_mg_by(df, "lang", "tok", capacity=16).collect()
    got: dict[str, dict[str, tuple[int, int]]] = {}
    for r in rows:
        got.setdefault(r.group, {})[r.item] = (r.count_lower, r.count_upper)
    exact: dict[str, Counter] = {}
    for g, tok in data:
        exact.setdefault(g, Counter())[tok] += 1
    assert set(got) == {"en", "de", "fr"}
    for g, items in got.items():
        d = None
        for item, (lo, hi) in items.items():
            assert lo <= exact[g][item] <= hi, (g, item)
            if d is None:
                d = hi - lo
            assert hi - lo == d  # one error mass per group
        n_g = sum(exact[g].values())
        assert d <= n_g // (16 + 1) + 1, (g, d)
        for item, c in exact[g].items():
            if c > d:
                assert item in items, (g, item, c, d)
    # the 3-distinct group never decremented: exact counts
    for item, (lo, hi) in got["de"].items():
        assert lo == hi == exact["de"][item]
    assert "hot" in got["en"] and "dominant" in got["fr"]


def test_groupwise_mg_nulls_excluded(spark):
    from big_data_analytics_final_project_spark.operators.sketches import (
        frequent_items_mg_by,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), (None, "y"), ("b", "z")],
        "g: string, tok: string",
    )
    rows = frequent_items_mg_by(df, "g", "tok", capacity=4).collect()
    assert sorted((r.group, r.item) for r in rows) == [
        ("a", "x"),
        ("b", "z"),
    ]
