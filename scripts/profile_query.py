#!/usr/bin/env python
"""Per-stage profiler for one or more registered queries (guide §1).

Runs each named query once at the warm SF then twice at the target SF
(timing the second), with the Spark UI enabled, and prints the top
stages of the timed run by task time from the UI REST API — the
empirical loop of spark_optimization_guide §1.1 without a browser.

Usage: python scripts/profile_query.py <query> [query ...] [--sf <dir>]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_analytics_final_project_spark import get_session  # noqa: E402
from big_data_analytics_final_project_spark.queries import all_queries  # noqa: E402


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    names = argv
    specs = all_queries()
    spark = get_session(app_name="profile", extra_conf={"spark.ui.enabled": "true"})
    warm = "/root/testdata/sf0.001"
    app_id = spark.sparkContext.applicationId
    for name in names:
        fn = specs[name].fn
        fn(spark, warm).write.format("noop").mode("overwrite").save()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j
            for j in _api(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(f"applications/{app_id}/stages/{sid}"):
                    stages.append(att)
            except Exception:
                pass
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, {len(stage_ids)} stages ===")
        for s in stages[:14]:
            sub = s.get("submissionTime", "")[-12:]
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"runTime={s.get('executorRunTime',0)/1000:7.2f}s "
                f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
                f"shR={s.get('shuffleReadBytes',0)>>20:>5}MB "
                f"shW={s.get('shuffleWriteBytes',0)>>20:>5}MB "
                f"in={s.get('inputBytes',0)>>20:>5}MB "
                f"sub={sub} | {s.get('name','')[:70]}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
