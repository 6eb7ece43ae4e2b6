"""Salting helpers must be RESULT-transparent: salted plans produce
exactly the rows the plain formulation produces — only the shuffle
distribution may differ."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.functions.numeric import DEC, exact_sum
from big_data_analytics_final_project_spark.operators.skew import (
    salted_agg,
    salted_join,
    with_salt,
)
from big_data_analytics_final_project_spark.sources import load_table

from .conftest import SF_SMOKE


def test_salted_agg_matches_plain(spark):
    events = load_table(spark, SF_SMOKE, "events")
    plain = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("value", "total"),
        F.max("event_id").alias("max_eid"),
    )
    salted = salted_agg(
        events,
        ["user_id"],
        {
            "n": (F.count(F.lit(1)).alias("n"), lambda c: F.sum(c)),
            # decimal partials stay decimal through stage 1; finalize in stage 2
            "total": (
                F.sum(F.col("value").cast(DEC)).alias("total"),
                lambda c: F.sum(c).cast("double"),
            ),
            "max_eid": (F.max("event_id").alias("max_eid"), lambda c: F.max(c)),
        },
        n_salts=16,
        identity_cols=["event_id"],
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    plain = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_partkey", "p_brand"
    )
    salted = salted_join(
        li.withColumnRenamed("l_partkey", "p_partkey"),
        part,
        on=["p_partkey"],
        n_salts=8,
        identity_cols=["l_orderkey", "p_partkey"],
    ).select("l_orderkey", F.col("p_partkey").alias("l_partkey"), "p_brand")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_rejects_dim_preserving_modes(spark):
    """right/full outer would emit unmatched dim rows once per salt copy;
    the operator refuses instead of silently multiplying rows."""
    import pytest

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey")
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(
                li.withColumnRenamed("l_partkey", "p_partkey"),
                part,
                on=["p_partkey"],
                n_salts=4,
                identity_cols=["p_partkey"],
                how=how,
            )


def test_salt_is_deterministic(spark):
    events = load_table(spark, SF_SMOKE, "events")
    s1 = with_salt(events, 16, ["event_id"]).select("event_id", "_salt")
    s2 = with_salt(events, 16, ["event_id"]).select("event_id", "_salt")
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
