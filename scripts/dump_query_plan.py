#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to files — the
before/after plan evidence an optimization round commits
(plans/r<N>/<query>_{before,after}.txt).

    python scripts/dump_query_plan.py <out_dir> <suffix> <query> [...]

Checkpointing operators are flipped lazy (operators/checkpoints.py
`lazy_results`) so the dump shows the real join/agg shapes instead of
an opaque ExistingRDD scan.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_analytics_final_project_spark import get_session
from big_data_analytics_final_project_spark.operators.checkpoints import lazy_results
from big_data_analytics_final_project_spark.queries import all_queries


def main() -> int:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    specs = all_queries()
    spark = get_session(app_name="plan-dump", extra_conf={"spark.ui.enabled": "false"})
    for name in names:
        with lazy_results():
            df = specs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
