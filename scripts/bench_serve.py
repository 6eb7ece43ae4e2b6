#!/usr/bin/env python
"""Paired-control coprocess for bench.py (round-10 verdict #5).

Runs the PINNED control commit's query implementations from a git
worktree, one execution per command, so the parent bench can
INTERLEAVE head and control passes A/B/A/B in a single session —
a box-contention spike then lands on both sides of the pair and
cancels in the min-of-N, instead of corrupting whichever side ran
contiguously through it (the r9 dedup_jaccard/knn false alarm cost a
full verdict cycle to adjudicate).

Protocol (JSON lines over stdin/stdout — commands match the JSON
responses, so an sf_dir containing spaces survives; stderr is Spark
noise):
    -> {"ready": true}                              once the session is up
    <- {"cmd": "run", "sf_dir": ..., "name": ...}   one timed noop-sink run
    -> {"name": ..., "elapsed": s}                  (or {"name": ..., "error": ...})
    <- {"cmd": "exit"}                              stop the session and quit

The coprocess is IDLE (blocked on stdin) while the head side runs a
pass, and vice versa — the two JVMs coexist but never execute
concurrently, keeping the round-5 "two concurrent local[32] JVMs
contend and both lie" rule intact.

Usage: bench_serve.py <worktree_path> — imports the WORKTREE's
package (the pinned commit's code), not the live repo's.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    wt = os.path.abspath(sys.argv[1])
    os.chdir(wt)
    sys.path.insert(0, wt)
    from big_data_analytics_final_project_spark import get_session
    from big_data_analytics_final_project_spark.queries import all_queries

    spark = get_session(
        app_name="bench-control", extra_conf={"spark.ui.enabled": "false"}
    )
    specs = all_queries()

    def _resolve(name: str):
        """Registered queries first; else fall back to an
        authored-but-unregistered query function by name (the
        scale_smoke.py convention). Lets a layout query serve as its
        own control twin against a pinned commit where it was already
        AUTHORED but not yet REGISTERED (r17: zone_compaction's r18
        control would otherwise need a commit that can't exist —
        registration and control-pinning land in the same round)."""
        if name in specs:
            return specs[name].fn
        import importlib

        for mod in ("maintenance", "windows", "quality", "text", "drift",
                    "batch"):
            try:
                m = importlib.import_module(
                    f"big_data_analytics_final_project_spark.queries.{mod}"
                )
            except ImportError:
                continue
            fn = getattr(m, name, None)
            if callable(fn):
                return fn
        raise KeyError(name)

    spark.range(1).count()  # force the JVM fully up before "ready"
    print(json.dumps({"ready": True}), flush=True)
    for line in sys.stdin:
        if not line.strip():
            continue
        try:
            cmd = json.loads(line)
        except json.JSONDecodeError:
            print(json.dumps({"error": f"bad command: {line!r}"}), flush=True)
            continue
        if cmd.get("cmd") == "exit":
            break
        if cmd.get("cmd") != "run" or "sf_dir" not in cmd or "name" not in cmd:
            print(json.dumps({"error": f"bad command: {line!r}"}), flush=True)
            continue
        sf_dir, name = cmd["sf_dir"], cmd["name"]
        t0 = time.perf_counter()
        try:
            _resolve(name)(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out = {
                "name": name,
                "elapsed": round(time.perf_counter() - t0, 3),
            }
        except Exception as exc:  # noqa: BLE001 — report, keep serving
            out = {"name": name, "error": f"{type(exc).__name__}: {exc}"[:300]}
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
