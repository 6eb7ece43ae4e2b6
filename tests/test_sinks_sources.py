"""Sink/source round-trips and the partitioned-zone prefix-scan layout.

Covers the reference's output surface (SNK-2 report CSV, SNK-1 zone
writes, SNK-4 summary) and the SRC-4/OPT-3 claim: a user-partitioned,
time-sorted parquet zone answers the HBase rowkey-prefix scan with
partition pruning instead of a custom store.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.plans import physical_plan
from big_data_analytics_final_project_spark.queries import all_queries
from big_data_analytics_final_project_spark.sinks import (
    write_report_csv,
    write_summary_txt,
    write_zone,
)
from big_data_analytics_final_project_spark.sources import load_table, read_csv_zone

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tmp_root():
    root = tempfile.mkdtemp(prefix="sink_test_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_report_csv_roundtrip(spark, tmp_root):
    """SNK-2: single-file CSV with header; read-back (SRC-6) preserves
    rows and values."""
    top = all_queries()["top_spenders"].fn(spark, SF_SMOKE)
    path = f"{tmp_root}/top_spenders_csv"
    write_report_csv(top, path)
    back = read_csv_zone(spark, path)
    want = [(r["o_custkey"], r["num_orders"]) for r in top.collect()]
    got = [(r["o_custkey"], r["num_orders"]) for r in back.collect()]
    assert sorted(got) == sorted(want)
    # single file per the report contract
    parts = [f for f in spark.read.format("csv").load(path).inputFiles()]
    assert len(parts) == 1


def test_zone_write_partition_pruning(spark, tmp_root):
    """SNK-1/OPT-3: events written partitioned by user bucket, sorted
    by ts within files. A single-user lookup must scan ONE partition
    (partition filters in the plan, no post-scan user filter work) and
    return time-ordered rows — the HBase prefix-scan parity claim."""
    events = load_table(spark, SF_SMOKE, "events")
    zone = f"{tmp_root}/sessions_zone"
    write_zone(
        events.withColumn("user_bucket", F.pmod(F.col("user_id"), F.lit(16))),
        zone,
        partition_by=["user_bucket"],
        sort_within_partitions=["user_id", "ts"],
    )
    zdf = spark.read.parquet(zone)
    lookup = (
        zdf.filter(
            (F.col("user_bucket") == 42 % 16) & (F.col("user_id") == 42)
        )
        .select("event_id", "ts", "event_type", "value")
        .orderBy("ts", "event_id")
        .limit(5)
    )
    plan = physical_plan(lookup)
    assert "PartitionFilters: [isnotnull(user_bucket" in plan
    # same rows as the unpartitioned-path query
    want = (
        events.filter(F.col("user_id") == 42)
        .select("event_id", "ts", "event_type", "value")
        .orderBy("ts", "event_id")
        .limit(5)
        .collect()
    )
    assert lookup.collect() == want


def test_summary_txt(tmp_root):
    """SNK-4: scalar summary artifact."""
    path = f"{tmp_root}/summary.txt"
    write_summary_txt({"corr_spend_sessions": 0.42, "n_users": 150}, path)
    with open(path) as f:
        content = f.read()
    assert "corr_spend_sessions: 0.42" in content
    assert "n_users: 150" in content
