#!/usr/bin/env python
"""End-to-end report runner — the engine's replacement for BOTH of the
reference's batch entry points in one job:

- EP-1 `spark-submit spark_analysis.py --in-dir raw_data --out-dir
  spark_out` (reference spark_analysis.py:149-155): three flagship
  CSVs (revenue by group, top spenders, co-purchase pairs).
- EP-3 `python integrated_query_engagement_vs_spend.py --out-dir
  integrated_out` (reference integrated_query_engagement_vs_spend.py:
  136-259): engagement/spend CSVs plus `integrated_summary.txt` with
  correlations and segment counts.
- EP-2 `python plots_from_spark_outputs.py` + EP-4
  `python integratedplots_query.py` (reference
  plots_from_spark_outputs.py:75-127, integratedplots_query.py:16-43):
  three top-10 bar charts and the engagement-vs-spend scatter,
  rendered dependency-free as SVG (charts.py).

The reference needed Spark + a Thrift HBase scan + a Mongo pipeline +
pandas across four processes; here it is one SparkSession and five
declarative plans. Usage:

    python scripts/run_reports.py [--sf-dir DIR] [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_analytics_final_project_spark import get_session
from big_data_analytics_final_project_spark.charts import (
    bar_chart_svg,
    save_chart,
    scatter_chart_svg,
)
from big_data_analytics_final_project_spark.queries import all_queries
from big_data_analytics_final_project_spark.sinks import (
    write_report_csv,
    write_summary_txt,
)

# report name -> query registry name (reference output artifact parity:
# spark_analysis.py:83,106,143 and integrated:171,186,220)
REPORT_CSVS = {
    "revenue_by_group": "revenue_by_brand",
    "top_spenders": "top_spenders",
    "product_pairs": "also_bought_pairs",
    "user_engagement": "user_engagement",
    "engagement_vs_spend": "engagement_vs_spend",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out-dir", default="reports_out")
    args = ap.parse_args()

    spark = get_session(app_name="run-reports")
    specs = all_queries()

    for report, query in REPORT_CSVS.items():
        write_report_csv(
            specs[query].fn(spark, args.sf_dir), f"{args.out_dir}/{report}"
        )
        print(f"wrote {args.out_dir}/{report}")

    # chart artifacts (reference EP-2 bar charts + EP-4 scatter). Each
    # chart consumes a bounded top-N / per-user aggregate frame.
    os.makedirs(args.out_dir, exist_ok=True)
    rev = specs["revenue_by_brand"].fn(spark, args.sf_dir).limit(10).collect()
    save_chart(
        bar_chart_svg(
            rev, "p_brand", "revenue", "Top 10 Brands by Revenue",
            max_label_len=20,
        ),
        f"{args.out_dir}/01_revenue_by_group_top10.svg",
    )
    spend = specs["top_spenders"].fn(spark, args.sf_dir).collect()
    save_chart(
        bar_chart_svg(
            spend, "o_custkey", "total_spent", "Top 10 Customers by Total Spent"
        ),
        f"{args.out_dir}/02_top_spenders_top10.svg",
    )
    pairs = [
        {
            "pair": f"{r['product_x']} + {r['product_y']}",
            "co_purchase_count": r["co_purchase_count"],
        }
        for r in specs["also_bought_pairs"].fn(spark, args.sf_dir).limit(10).collect()
    ]
    save_chart(
        bar_chart_svg(
            pairs, "pair", "co_purchase_count",
            "Top 10 Products Bought Together (Pairs)", max_label_len=22,
        ),
        f"{args.out_dir}/03_also_bought_pairs_top10.svg",
    )
    engaged = (
        specs["engagement_vs_spend"].fn(spark, args.sf_dir)
        .filter("total_spent > 0")  # spenders only, as in the reference
        .collect()
    )
    save_chart(
        scatter_chart_svg(
            engaged, "sessions_count", "total_spent",
            "User Engagement vs Spending",
            x_label="Number of Sessions (Engagement)",
            y_label="Total Spent",
        ),
        f"{args.out_dir}/04_engagement_vs_spend.svg",
    )
    print(f"wrote {args.out_dir}/*.svg (4 charts)")

    # integrated_summary.txt (reference SNK-4, integrated:232-258):
    # correlations + segment counts as driver-side scalars.
    corr = specs["engagement_spend_correlation"].fn(spark, args.sf_dir).collect()[0]
    segments = specs["segment_counts"].fn(spark, args.sf_dir).collect()
    lines: dict[str, object] = {
        "corr_total_spent_vs_sessions_count": corr["corr_spent_sessions"],
        "corr_total_spent_vs_total_duration": corr["corr_spent_duration"],
    }
    for row in segments:
        lines[f"segment_count[{row['segment']}]"] = row["n_users"]
    write_summary_txt(lines, f"{args.out_dir}/integrated_summary.txt")
    print(f"wrote {args.out_dir}/integrated_summary.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
