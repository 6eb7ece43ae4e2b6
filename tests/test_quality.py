"""Invariant tests for the data-quality queries (queries/quality.py).

The oracle-parity sweep already proves cross-engine value equality;
these tests pin the SEMANTIC contracts — runs partition the event log,
the FK audit actually detects injected orphans, the reconciliation
classes partition the order-key universe — that a hash match alone
would not articulate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.queries.quality import (
    _integrity_check,
    order_totals_reconciliation,
    referential_integrity_audit,
)
from big_data_analytics_final_project_spark.queries.windows import (
    user_event_runs,
)

from .conftest import SF_SMOKE


def test_event_runs_partition_the_log(spark):
    """Runs are a PARTITION of events: per-user n_events sums to the
    user's event count, and run_ids are contiguous from 1."""
    runs = user_event_runs(spark, SF_SMOKE).cache()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    per_user = (
        runs.groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n"),
            F.min("run_id").alias("lo"),
            F.max("run_id").alias("hi"),
            F.count(F.lit(1)).alias("n_runs"),
        )
    )
    ev_counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    joined = per_user.join(ev_counts, "user_id", "full_outer")
    bad = joined.filter(
        (F.col("n") != F.col("n_ev"))
        | (F.col("lo") != 1)
        | (F.col("hi") != F.col("n_runs"))
        | F.col("n").isNull()
        | F.col("n_ev").isNull()
    )
    assert bad.count() == 0
    runs.unpersist()


def test_event_runs_are_maximal(spark):
    """No two CONSECUTIVE runs of one user share an event type —
    otherwise they'd be one run (maximality, the property that makes
    the collapse canonical)."""
    from pyspark.sql import Window

    runs = user_event_runs(spark, SF_SMOKE)
    w = Window.partitionBy("user_id").orderBy("run_id")
    glued = runs.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type") == F.col("event_type")
    )
    assert glued.count() == 0


def test_integrity_check_detects_injected_orphans(spark):
    """The audit primitive must actually fire: corrupt 3 FK values to
    keys no dimension row has, plus 2 nulls, and expect exactly those
    counts in their respective classes."""
    dim = spark.range(0, 10).select(F.col("id").alias("d_key"))
    fact = spark.createDataFrame(
        [(0,), (1,), (1,), (999,), (998,), (999,), (None,), (None,)],
        "f_key: long",
    )
    row = _integrity_check(
        "fact.f_key -> dim", fact, "f_key", dim, "d_key"
    ).collect()[0]
    assert row.fact_rows == 8
    assert row.null_keys == 2
    assert row.distinct_keys == 4  # 0, 1, 998, 999
    assert row.orphan_rows == 3  # the two 999s and the 998
    assert row.dup_dim_keys == 0


def test_integrity_check_reports_duplicated_dim_keys(spark):
    """A dimension with duplicated PKs is corruption the audit must
    REPORT, not amplify: counts stay grounded in fact rows (no join
    fan-out) and the excess dim rows land in dup_dim_keys."""
    dim = spark.createDataFrame(
        [(0,), (1,), (1,), (1,), (2,), (2,), (None,)], "d_key: long"
    )
    fact = spark.createDataFrame([(0,), (1,), (5,)], "f_key: long")
    row = _integrity_check(
        "fact.f_key -> dim", fact, "f_key", dim, "d_key"
    ).collect()[0]
    assert row.fact_rows == 3  # NOT inflated by the 3x key-1 rows
    assert row.null_keys == 0
    assert row.distinct_keys == 3
    assert row.orphan_rows == 1  # the 5
    assert row.dup_dim_keys == 3  # two extra 1s + one extra 2; null ignored


def test_audit_fact_rows_match_tables(spark):
    """Audit fact_rows column equals the audited tables' true counts
    (the report is grounded, not sampled)."""
    audit = {r.check_name: r for r in referential_integrity_audit(spark, SF_SMOKE).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert audit["lineitem.l_orderkey -> orders"].fact_rows == li
    assert audit["events.user_id -> customer"].fact_rows == ev
    assert audit["orders.o_custkey -> customer"].fact_rows == orders
    # synthetic star schema is referentially intact on its FK edges
    assert audit["lineitem.l_orderkey -> orders"].orphan_rows == 0
    assert audit["orders.o_custkey -> customer"].orphan_rows == 0


def test_reconciliation_classes_partition_order_keys(spark):
    """Every order key from EITHER side lands in exactly one class:
    class counts sum to |orders ∪ lineitem keys| (full-outer totality)."""
    recon = order_totals_reconciliation(spark, SF_SMOKE)
    total = recon.agg(F.sum("n_orders")).collect()[0][0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        F.col("o_orderkey").alias("k")
    )
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k")
    )
    universe = orders.union(li).distinct().count()
    assert total == universe
