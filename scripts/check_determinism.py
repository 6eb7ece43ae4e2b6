#!/usr/bin/env python
"""Partitioning-independence audit: run every registered query twice —
once on a narrow session (3 shuffle partitions, local[2]) and once on a
wide one (32 partitions, local[8]) — and require BIT-IDENTICAL results.

This is the engine's core numeric promise (functions/numeric.py): the
oracle gate proves Spark==DuckDB under ONE partitioning; this audit
proves the Spark side cannot drift under ANY partitioning (the property
that makes results stable between a laptop and a 1000-executor
cluster). An order-dependent float sum, a nondeterministic collect_list
without sort_array, or a tie-broken-by-partition window would fail
here even on days the oracle got lucky.

Two sequential SparkSessions (never concurrent); rows are canonicalized
exactly like tests/parity.py with tol=0. Usage:

    python scripts/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.parity import _canon


def _collect_all(master: str, shuffle: int, sf_dir: str, names, results: dict):
    from big_data_analytics_final_project_spark import get_session
    from big_data_analytics_final_project_spark.queries import all_queries

    spark = get_session(
        app_name=f"determinism-{shuffle}",
        master=master,
        shuffle_partitions=shuffle,
        extra_conf={"spark.ui.enabled": "false"},
    )
    specs = all_queries()
    for name in names:
        try:
            df = specs[name].fn(spark, sf_dir)
            rows = [
                tuple(_canon(v, 0.0) for v in row)
                for row in df.collect()
            ]
            results[name] = (sorted(df.columns), sorted(rows, key=repr))
        except Exception as exc:  # noqa: BLE001 — report every query
            results[name] = ("ERR", str(exc).splitlines()[:1])
    spark.stop()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from big_data_analytics_final_project_spark.queries import all_queries

    registered = sorted(all_queries())
    unknown = sorted(only - set(registered))
    if unknown:
        # mirror check_parity.py: a typo'd name must not report the
        # vacuous "0 failures" of an empty sweep
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    names = [n for n in registered if not only or n in only]

    narrow: dict = {}
    wide: dict = {}
    t0 = time.time()
    _collect_all("local[2]", 3, sf_dir, names, narrow)
    _collect_all("local[8]", 32, sf_dir, names, wide)

    failed = []
    for name in names:
        a, b = narrow[name], wide[name]
        if a == b and a[0] != "ERR":
            print(f"OK    {name}")
        else:
            failed.append(name)
            print(f"FAIL  {name}: narrow={str(a)[:120]} wide={str(b)[:120]}")
    print(f"\n{len(failed)} failures: {failed} ({time.time() - t0:.0f}s)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
