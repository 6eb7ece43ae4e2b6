"""Distributed exact ranking (operators/ranks.py) must be bit-identical
to the single-task global-window forms it replaces — checked across
partition counts, tie-heavy data, descending orders, and the N < n
ntile edge."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.ranks import (
    with_global_ntile,
    with_global_row_number,
)


def _frame(spark, n):
    # values collide heavily (mod 7) so ties must share a range
    # partition; id is the unique tiebreak making the order total.
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )


@pytest.mark.parametrize("n,parts", [(1, 4), (97, 4), (1000, 8)])
def test_row_number_matches_global_window(spark, n, parts):
    df = _frame(spark, n)
    order = [F.col("v").desc(), F.col("id")]
    got = with_global_row_number(df, order, out_col="r", num_partitions=parts)
    want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("n,tiles", [(5, 10), (97, 10), (1000, 7)])
def test_ntile_matches_global_window(spark, n, tiles):
    df = _frame(spark, n)
    order = [F.col("v"), F.col("id").desc()]
    got = with_global_ntile(df, tiles, order, out_col="t", num_partitions=4)
    want = df.withColumn("t", F.ntile(tiles).over(Window.orderBy(*order)))
    assert sorted(got.collect()) == sorted(want.collect())


def test_row_number_plan_has_no_unpartitioned_ranking_window(spark):
    """The whole point: no windowspec ordering the data frame globally.
    The only unpartitioned window runs over per-partition counts."""
    import re

    from big_data_analytics_final_project_spark.plans import physical_plan

    df = with_global_row_number(
        _frame(spark, 100), [F.col("v"), F.col("id")], num_partitions=4
    )
    plan = physical_plan(df)
    unpartitioned = re.findall(r"windowspecdefinition\((\w+)#\d+L? ASC", plan)
    assert unpartitioned and set(unpartitioned) == {"_rnk_pid"}, unpartitioned


def test_ntile_bucket_arithmetic_property(spark):
    """Hypothesis sweep of the q/r bucket arithmetic (q = N div n,
    r = N mod n; first r buckets get q+1 rows): random row counts,
    tile counts, and partition counts must all reproduce
    `ntile(n).over(global window)` bit-exactly — including N < n,
    N == n, and tie-heavy orders."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        n=st.integers(min_value=0, max_value=400),
        tiles=st.integers(min_value=1, max_value=23),
        parts=st.integers(min_value=1, max_value=9),
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(n, tiles, parts):
        df = _frame(spark, n)
        order = [F.col("v"), F.col("id")]
        got = with_global_ntile(
            df, tiles, order, out_col="t", num_partitions=parts
        )
        want = df.withColumn(
            "t", F.ntile(tiles).over(Window.orderBy(*order))
        )
        assert sorted(got.collect()) == sorted(want.collect())

    check()


def test_ntile_qr_arithmetic_property(spark):
    """Hypothesis-style sweep of the q/r bucket arithmetic (r4 verdict
    hardening): across awkward (n, tiles) pairs — n < tiles, n = tiles,
    tiles ∤ n, tiles = 1 — the two-level ntile must stay bit-identical
    to the global-window form."""
    from pyspark.sql import Window

    for n, tiles in [(1, 1), (2, 3), (3, 2), (12, 12), (13, 12), (11, 1),
                     (25, 4), (24, 4), (23, 4), (100, 33)]:
        df = _frame(spark, n)
        order = [F.col("v"), F.col("id")]
        got = with_global_ntile(
            df, tiles, order, out_col="t", num_partitions=3
        )
        want = df.withColumn(
            "t", F.ntile(tiles).over(Window.orderBy(*order))
        )
        assert sorted(got.collect()) == sorted(want.collect()), (n, tiles)
