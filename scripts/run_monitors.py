#!/usr/bin/env python
"""Observability runner — the engine's standing-operations pass, the
counterpart of scripts/run_reports.py (analytics artifacts): one
SparkSession producing the monitoring artifacts a zone owner reviews
per drop, each backed by a graded query or a tested operator:

- `profile_<table>/`       per-column ANALYZE relation
                           (operators/profile.table_profile, exact)
- `profile_drift/`         reference-vs-current profile comparison on
                           a day split of events
                           (operators/profile.profile_diff)
- `hourly_anomalies/`      trailing z-score volume anomalies
                           (graded `events_hourly_anomaly`)
- `segment_psi/`           per-segment value-distribution drift
                           (graded `segment_value_psi`)
- `join_key_skew/`         per-join-key skew diagnostic
                           (graded `join_key_skew_report`)
- `k_anonymity.txt`        QI privacy verdict over (user_id-bucket,
                           event_type) — a deliberately coarse QI so
                           the report exercises both outcomes
- `rolling_quantiles/`     7-day rolling p50/p95/p99 of events.value
                           from mergeable daily histograms
                           (operators/sketches, streaming twin in
                           streaming/quantiles.py)
- `join_advisor/`          physical-strategy pre-flight per FK edge
                           (operators/advisor.join_advisor)
- `monitor_summary.txt`    one-line verdicts

Usage:

    python scripts/run_monitors.py [--sf-dir DIR] [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_analytics_final_project_spark import get_session
from big_data_analytics_final_project_spark.operators.advisor import (
    join_advisor,
)
from big_data_analytics_final_project_spark.operators.profile import (
    k_anonymity_report,
    profile_diff,
    table_profile,
)
from big_data_analytics_final_project_spark.operators.sketches import (
    histogram_daily_sketches,
    histogram_rolling_quantiles,
)
from big_data_analytics_final_project_spark.queries import all_queries
from big_data_analytics_final_project_spark.sinks import (
    write_report_csv,
    write_summary_txt,
)
from big_data_analytics_final_project_spark.sources import load_table


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out-dir", default="monitors_out")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    spark = get_session(
        app_name="run-monitors",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    specs = all_queries()
    summary: dict[str, object] = {}

    for table in ("events", "documents"):
        prof = table_profile(load_table(spark, args.sf_dir, table))
        write_report_csv(prof, os.path.join(args.out_dir, f"profile_{table}"))
        print(f"wrote {args.out_dir}/profile_{table}")

    # profile drift: first half of the event-day range as reference
    ev = load_table(spark, args.sf_dir, "events")
    mid = (
        ev.agg(
            F.min(F.to_date("ts")).alias("d0"),
            F.max(F.to_date("ts")).alias("d1"),
        )
        .selectExpr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT)) AS m")
        .collect()[0]["m"]
    )
    cols = ["event_id", "user_id", "event_type", "value"]
    diff = profile_diff(
        table_profile(ev.filter(F.to_date("ts") < F.lit(mid)), cols),
        table_profile(ev.filter(F.to_date("ts") >= F.lit(mid)), cols),
    )
    write_report_csv(diff, os.path.join(args.out_dir, "profile_drift"))
    drifted = [
        r["column_name"]
        for r in diff.collect()
        if r["schema_drift"]
        or r["null_drift"]
        or r["distinct_drift"]
        or r["range_drift"]
    ]
    summary["profile_drift_columns"] = drifted or "none"
    print(f"wrote {args.out_dir}/profile_drift")

    for name, query in (
        ("hourly_anomalies", "events_hourly_anomaly"),
        ("segment_psi", "segment_value_psi"),
        ("join_key_skew", "join_key_skew_report"),
    ):
        df = specs[query].fn(spark, args.sf_dir)
        write_report_csv(df, os.path.join(args.out_dir, name))
        print(f"wrote {args.out_dir}/{name}")
        if name == "hourly_anomalies":
            summary["anomalous_hours"] = df.filter("is_anomaly").count()
        elif name == "segment_psi":
            summary["drifted_segments"] = [
                r["event_type"] for r in df.collect() if r["is_drifted"]
            ] or "none"

    kan = k_anonymity_report(
        ev.select(
            (F.col("user_id") % 10).alias("user_bucket"), "event_type"
        ),
        ["user_bucket", "event_type"],
        k=5,
    ).collect()[0]
    summary["k_anonymity"] = (
        f"k={kan['k']} groups={kan['n_groups']} "
        f"below_k={kan['n_groups_below_k']} rows_at_risk="
        f"{kan['n_rows_at_risk']} verdict="
        f"{'PASS' if kan['is_k_anonymous'] else 'AT RISK'}"
    )
    write_summary_txt(
        {"k_anonymity": summary["k_anonymity"]},
        os.path.join(args.out_dir, "k_anonymity.txt"),
    )
    # rolling quantiles: the daily-histogram zone's batch read path
    # (frozen config 0..500 x 64 bins — the monitor's contract)
    daily = histogram_daily_sketches(ev, "ts", "value", 0.0, 500.0, 64)
    rq = histogram_rolling_quantiles(
        daily, [0.5, 0.95, 0.99], 0.0, 500.0, 64, 7
    )
    write_report_csv(
        rq.orderBy("day", "q"),
        os.path.join(args.out_dir, "rolling_quantiles"),
    )
    p95 = rq.filter(F.col("q") == 0.95)
    summary["p95_value_range"] = (
        f"{p95.agg(F.min('estimate')).collect()[0][0]:.1f}"
        f"..{p95.agg(F.max('estimate')).collect()[0][0]:.1f}"
    )
    print(f"wrote {args.out_dir}/rolling_quantiles")

    # join advisor: the physical-strategy pre-flight per FK edge
    li = load_table(spark, args.sf_dir, "lineitem")
    orders = load_table(spark, args.sf_dir, "orders")
    customer = load_table(spark, args.sf_dir, "customer")
    adv = join_advisor(
        li, orders, "l_orderkey", "o_orderkey", label="lineitem->orders"
    ).unionByName(
        join_advisor(
            orders, customer, "o_custkey", "c_custkey",
            label="orders->customer",
        )
    )
    write_report_csv(adv, os.path.join(args.out_dir, "join_advisor"))
    summary["join_recommendations"] = {
        r["edge"]: r["recommendation"] for r in adv.collect()
    }
    print(f"wrote {args.out_dir}/join_advisor")

    write_summary_txt(
        summary, os.path.join(args.out_dir, "monitor_summary.txt")
    )
    print(f"wrote {args.out_dir}/monitor_summary.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
