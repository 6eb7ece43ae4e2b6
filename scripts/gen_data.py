#!/usr/bin/env python
"""Materialize the synthetic data model as parquet zones.

The engine's replacement for the reference's generate-then-bulk-load
pipeline (data_generator.py + mongoimport + load_hbase_sessions_stream
— three processes, chunked '8GB mode') as one distributed Spark job:

    python scripts/gen_data.py --out-dir /tmp/gen_zones --scale 0.01

scale=1.0 reproduces the reference's cardinalities (10k users / 5k
products / 25 categories / 100k transactions / 300k sessions); any
scale runs the same shuffle-free plan.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_analytics_final_project_spark import get_session  # noqa: E402
from big_data_analytics_final_project_spark.generator import (  # noqa: E402
    generate_all,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--scale", type=float, default=0.01)
    args = ap.parse_args()
    spark = get_session(app_name="gen-data")
    counts = generate_all(spark, args.out_dir, args.scale)
    for table, n in counts.items():
        print(f"{table}: {n} rows -> {args.out_dir}/{table}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
