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
