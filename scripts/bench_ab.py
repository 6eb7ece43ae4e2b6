#!/usr/bin/env python
"""One-query A/B adjudicator: HEAD vs a pinned commit, interleaved.

For bench-trend adjudications (e.g. the r12 verdict's
`media_gif_pixels` climb): run ONE query alternately at HEAD and at
`<commit>` (via the bench_serve coprocess in a detached worktree) in
a single session pairing, so box contention lands on both sides and
cancels in the min-of-N. Distinguishes "the old code is equally slow
today" (environment drift — GC, library versions, box state) from
"the head code regressed" (bisect it).

Usage: python scripts/bench_ab.py <query> <commit> [passes=5] [sf_dir]
Prints one JSON line: {"query", "commit", "head_runs", "head_min",
"control_runs_min", "ratio_head_over_control"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from big_data_analytics_final_project_spark import get_session  # noqa: E402
from big_data_analytics_final_project_spark.queries import all_queries  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    name, commit = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    warm_dir = "/root/testdata/sf0.001"
    specs = all_queries()
    if name not in specs:
        print(f"unknown query: {name}", file=sys.stderr)
        return 2
    # the coprocess runs whatever bench.PAIRED_QUERIES names — point
    # it at the adjudicated query only
    bench.PAIRED_QUERIES[:] = [name]

    spark = get_session(
        app_name="bench-ab", extra_conf={"spark.ui.enabled": "false"}
    )
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd", jvm.org.apache.logging.log4j.Level.ERROR
        )
    except Exception:  # noqa: BLE001 — cosmetic only
        pass
    # head warm-up BEFORE the control JVM exists (never two executing)
    specs[name].fn(spark, warm_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    ctl = bench.PairedControl(commit, sf_dir)
    ctl.start(warm_dir)
    head: list[float] = []
    for _ in range(passes):
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        head.append(round(time.perf_counter() - t0, 3))
        ctl.run_pass()
    res = ctl.finish()
    ctl_min = res.get("queries", {}).get(name)
    out = {
        "query": name,
        "commit": commit,
        "sf_dir": sf_dir,
        "head_runs": head,
        "head_min": min(head),
        "control_min": ctl_min,
        "ratio_head_over_control": (
            round(min(head) / ctl_min, 3) if ctl_min else None
        ),
        "control_error": res.get("error"),
        "control_errors": res.get("query_errors"),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
