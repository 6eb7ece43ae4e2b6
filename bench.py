#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the `noop` sink (full execution,
no driver-side materialization — the same shape a real write has).
Usage: `python bench.py [query ...]` to bench a subset; `--all` for
every registered query.

PAIRED BOX-STATE CONTROL (round-5 verdict #5; INTERLEAVED since
round 11 per the r10 verdict #5): by default every run also benches a
PINNED SNAPSHOT commit (the round-2 bench baseline, `3a7624c`) in a
throwaway git worktree, on a small fixed query set shared unchanged
since round 2, and attaches its timings as a `control` key in the
same JSON line. The control runs as a COPROCESS whose passes
alternate with the head's (head-pass-1, ctl-pass-1, head-pass-2, ...)
so a box-contention spike lands on BOTH sides of the pair and cancels
in the min-of-3 — the r9 contiguous-block spike took two rounds to
adjudicate. Round-over-round readers divide out shared-VM drift (the
r4→r5 "1.75× regression" was ~1.2–1.35× box state) without a hand-run
counter-measurement. `--paired <commit>` overrides the snapshot;
`--no-paired` (or env SPARK_GRAFT_PAIRED=0) skips the control.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_analytics_final_project_spark import get_session
from big_data_analytics_final_project_spark.operators.kmeans import kmeans_assign
from big_data_analytics_final_project_spark.queries import QuerySpec, all_queries
from big_data_analytics_final_project_spark.sources import load_table

# Bench-only twins, named honestly so round-over-round comparisons
# never silently compare different work. `embedding_kmeans` (3 Lloyd's
# rounds = 4 corpus passes) was 14% of the round-4 headline total and
# would mask regressions in the other queries; the 1-iteration twin
# exercises the identical plan shape (map-only assignment, one
# (cluster,dim) partial-agg shuffle, k*d collect) per pass. The full
# 3-round form stays under correctness grading.
BENCH_VARIANTS: dict[str, QuerySpec] = {
    "embedding_kmeans_1iter": QuerySpec(
        lambda spark, sf_dir: kmeans_assign(
            load_table(spark, sf_dir, "embeddings"), n_clusters=8, n_iters=1
        )
    ),
}

# Headline set: the reference's flagship analytics (SURVEY.md §2 / §7.3
# M1-M2) plus one representative of each extension family (dedup,
# similarity, text, windows/streaming-batch). Kept deliberately to the
# queries a reference user actually runs, not the whole registry.
# The box-state control: the round-2 snapshot (BENCH_COUNTER_r5.md's
# A-B-A baseline) on queries unchanged-by-name since round 2 that do
# NOT read `events` (the r2 code predates the driver's events.parquet
# NTZ relayout and cannot read today's file).
PAIRED_COMMIT = "3a7624c"
PAIRED_QUERIES = [
    "pricing_summary",
    "revenue_by_brand",
    "also_bought_pairs",
    "dedup_jaccard_pairs",
    "knn_bruteforce",
    "doc_quality_score",
]

# Layout-class control (r16 verdict #1 / next-round #4): the write-path
# queries (z-order today; compaction/ORC when they register) are priced
# like the layout jobs they are — the most expensive headline entries —
# and had no interleaved entry to cancel session noise against, so a
# round-over-round move could not be adjudicated ENVIRONMENT the way
# segment_value_psi's was. They cannot join PAIRED_QUERIES (the r2
# pinned commit predates them), so they get their own coprocess pinned
# at the first commit that contains zone_zorder_prune's registered
# state (the r16 close). Same interleave, separate `layout_control`
# key in the JSON line.
#
# r18 (r17 verdict #4): segment_value_psi and waiting_supplier join
# this control set. Both spiked 2-3x in r17 with ZERO relevant code
# change (drift/batch paths untouched since long before add331f, so
# the pinned commit runs identical code) and neither was in any paired
# set, so the round could not adjudicate ENVIRONMENT vs real
# in-artifact — the same one-round PSI spike already re-litigated in
# r15/r16. Additions-only harness change: existing entries keep their
# names and methodology.
LAYOUT_PAIRED_COMMIT = "add331f"
LAYOUT_PAIRED_QUERIES = [
    "zone_zorder_prune",
    "segment_value_psi",
    "waiting_supplier",
]


class PairedControl:
    """The pinned-commit control as a long-lived COPROCESS
    (scripts/bench_serve.py in a detached worktree), so head and
    control passes INTERLEAVE A/B/A/B in one bench session (round-10
    verdict #5): a box-contention spike lands on both sides of the
    pair and cancels in the min-of-N, instead of corrupting whichever
    side ran contiguously through it (the r9 false alarm). The two
    JVMs coexist but never EXECUTE concurrently — the coprocess
    blocks on stdin while the head runs, and vice versa.

    Fault posture: the control is optional; any failure records an
    error in the result dict and every method degrades to a no-op —
    the head bench must never lose its timings to the control."""

    def __init__(
        self, commit: str, sf_dir: str, queries: list[str] | None = None
    ) -> None:
        self.commit = commit
        self.sf_dir = sf_dir
        self.queries = PAIRED_QUERIES if queries is None else queries
        self.timings: dict[str, float] = {}
        self.errors: dict[str, str] = {}
        self.error: str | None = None
        self._proc = None
        self._tmp: str | None = None
        self._q = None

    def _fail(self, msg: str) -> None:
        if self.error is None:
            self.error = msg[:500]

    def _recv(self, timeout: float) -> dict:
        import queue as _queue

        try:
            return json.loads(self._q.get(timeout=timeout))
        except _queue.Empty:
            raise TimeoutError(f"control silent for {timeout}s") from None

    def _send(self, line: str) -> None:
        self._proc.stdin.write(line + "\n")
        self._proc.stdin.flush()

    def start(self, warm_dir: str | None) -> None:
        import subprocess
        import tempfile
        import threading

        repo = os.path.dirname(os.path.abspath(__file__))
        try:
            self._tmp = tempfile.mkdtemp(prefix="bench_ctl_")
            wt = os.path.join(self._tmp, "wt")
            subprocess.run(
                ["git", "-C", repo, "worktree", "add", "--detach", wt, self.commit],
                check=True,
                capture_output=True,
                timeout=120,
            )
            self._proc = subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(repo, "scripts", "bench_serve.py"),
                    wt,
                ],
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
            import queue as _queue

            self._q = _queue.Queue()

            def _pump() -> None:
                for ln in self._proc.stdout:
                    self._q.put(ln)

            threading.Thread(target=_pump, daemon=True).start()
            ready = self._recv(timeout=180)
            if not ready.get("ready"):
                raise RuntimeError(f"control not ready: {ready}")
            if warm_dir:
                for name in self.queries:
                    self._send(
                        json.dumps(
                            {"cmd": "run", "sf_dir": warm_dir, "name": name}
                        )
                    )
                    self._recv(timeout=600)
        except Exception as exc:  # noqa: BLE001 — control is optional
            self._fail(f"{type(exc).__name__}: {exc}")

    def run_pass(self) -> None:
        """One timed control pass (all paired queries once), keeping
        per-query minimums — called between head passes."""
        if self.error is not None:
            return
        for name in self.queries:
            if name in self.errors:
                continue
            try:
                self._send(
                    json.dumps(
                        {"cmd": "run", "sf_dir": self.sf_dir, "name": name}
                    )
                )
                got = self._recv(timeout=600)
            except Exception as exc:  # noqa: BLE001
                self._fail(f"{type(exc).__name__}: {exc}")
                return
            if "elapsed" in got:
                t = got["elapsed"]
                if name not in self.timings or t < self.timings[name]:
                    self.timings[name] = t
            else:
                self.errors[name] = str(got.get("error", got))[:300]

    def finish(self) -> dict:
        import shutil
        import subprocess

        repo = os.path.dirname(os.path.abspath(__file__))
        try:
            if self._proc is not None and self._proc.poll() is None:
                try:
                    self._send(json.dumps({"cmd": "exit"}))
                    self._proc.wait(timeout=60)
                except Exception:  # noqa: BLE001
                    self._proc.kill()
        finally:
            if self._tmp is not None:
                subprocess.run(
                    [
                        "git",
                        "-C",
                        repo,
                        "worktree",
                        "remove",
                        "--force",
                        os.path.join(self._tmp, "wt"),
                    ],
                    capture_output=True,
                    timeout=120,
                )
                shutil.rmtree(self._tmp, ignore_errors=True)
        out: dict = {"commit": self.commit, "interleaved": True}
        if self.timings:
            out["value"] = round(sum(self.timings.values()), 3)
            out["queries"] = self.timings
        if self.errors:
            out["query_errors"] = self.errors
        if self.error is not None:
            out["error"] = self.error
        return out


HEADLINE = [
    "pricing_summary",
    "revenue_by_brand",
    "top_spenders",
    "product_popularity",
    "also_bought_pairs",
    "engagement_vs_spend",
    "segment_counts",
    "customer_order_history",
    "purchase_last_click",
    "nested_order_items",
    "events_sessionized",
    "clicks_before_purchase",
    "dedup_minhash_lsh",
    "dedup_jaccard_pairs",
    "knn_bruteforce",
    "ann_ivf",
    "embedding_kmeans_1iter",
    "doc_quality_score",
    "doc_repetition_stats",
    # added r5 (totals not comparable to BENCH_r4 on these lines):
    # the registry's only fact-fact shuffle-join shape, and the
    # explode-heavy chunking map op
    "late_shipments_by_priority",
    "doc_chunk_windows",
    # events-family heavyweights, benched under the repo session since
    # round 2 (round 1 hid an events-session bug from the driver;
    # keeping them here makes regressions visible round-over-round)
    "events_hypertable_rollup",
    "session_stats_per_user",
    "daily_active_users",
    # added r6 (totals not comparable to BENCH_r5 on these lines): the
    # deepest star join in the registry and the correlated-subquery
    # decorrelation — the two most join-intensive new plan shapes
    "nation_market_share",
    "min_cost_supplier",
    # added r7 (totals not comparable to BENCH_r6 on these lines):
    # waiting_supplier is the heaviest r6 join topology (semi + anti
    # legs reusing one lineitem⋈orders exchange); the two media rows
    # time the Arrow mapInPandas decode hop (PCM16 and zlib-PNG); the
    # two quality rows time the full-outer reconciliation and the
    # five-branch FK audit
    "waiting_supplier",
    "media_wav_rms",
    "media_png_pixels",
    "media_avi_frames",
    "order_totals_reconciliation",
    "referential_integrity_audit",
    # added r8 (totals not comparable to BENCH_r7 on these lines): the
    # GIF row times the double Arrow hop (LZW encode stage chained
    # into decode with no second exchange); SCD2 is the heaviest new
    # window-collapse shape; the drift rows time the new observability
    # family (bounded-frame trailing stats; PSI's scan+tiny-agg)
    "media_gif_pixels",
    "customer_status_scd2",
    "events_hourly_anomaly",
    "segment_value_psi",
    # added r9 (totals not comparable to BENCH_r8 on these lines): the
    # five newly registered queries — per-user OLS trend and the skew
    # report time the drift family's heaviest aggregates, the CMS row
    # times the sketch partial-merge shuffle, the sampling row times
    # the TakeOrdered top-(k+1) path, and the collapsed-Jaccard row
    # times the dedup composition that replaces the pair-listing
    # bottleneck on duplicate-heavy corpora
    "user_spend_trend",
    "join_key_skew_report",
    "user_freq_cms",
    "doc_weighted_sample",
    "dedup_jaccard_collapsed",
    # added r12 (totals not comparable to BENCH_r11 on these lines):
    # the four families newly graded this round — the bloom runtime
    # filter (map-side prune + residual semi-join), the bigram-LM
    # perplexity scorer (fit + score passes), the full-table profiler
    # (one wide agg -> unpivot), and the iterative BPE merge induction
    # (the registry's only multi-round driver loop; join_size_cms is
    # already represented by user_freq_cms's sketch shuffle)
    "bloom_pruned_revenue",
    "doc_lm_perplexity",
    "lineitem_profile",
    "corpus_bpe_merges",
    # added r13 (totals not comparable to BENCH_r12 on these lines):
    # the three registrations — the frozen-merge BPE encoder (the
    # corpus-sized Arrow hop with the per-partition distinct-word
    # cache), the k-anonymity audit (QI hash agg + summary), and the
    # profile diff (two profile scans + a cols-sized full outer)
    "corpus_bpe_encode",
    "customer_k_anonymity",
    "orders_profile_drift",
    # added r14 (totals not comparable to BENCH_r13 on this line): the
    # round's registration — per-source KMV bottom-k sketches folded
    # map-side, the ≤k-row shuffle, and the pairwise overlap matrix
    "corpus_overlap_kmv",
    # added r15 (totals not comparable to BENCH_r14 on this line): the
    # round's registration — per-day fixed-edge histogram sketches,
    # the 7-day fan-out, and the closed-form quantile walk, all on
    # day×bin-sized frames
    "events_rolling_value_quantiles",
    # added r16 (totals not comparable to BENCH_r15 on this line): the
    # round's registration — the z-order layout pass (two-level rank
    # per z column, Morton interleave, range-partitioned sorted write)
    # plus the 2-D band-predicate read-back it accelerates
    "zone_zorder_prune",
    # added r17 (totals not comparable to BENCH_r16 on this line): the
    # round's registration — the point-in-time SCD2 feature join (one
    # user-keyed as-of union+window pass over purchases × status
    # versions)
    "purchase_pit_order_status",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    argv = sys.argv[1:]
    paired_commit = PAIRED_COMMIT
    if "--paired" in argv:
        i = argv.index("--paired")
        if i + 1 >= len(argv):
            print("--paired requires a commit argument", file=sys.stderr)
            return 2
        paired_commit = argv[i + 1]
        del argv[i : i + 2]
    paired_on = (
        "--no-paired" not in argv
        and os.environ.get("SPARK_GRAFT_PAIRED", "1") != "0"
    )
    args = [a for a in argv if not a.startswith("-")]
    specs = {**all_queries(), **BENCH_VARIANTS}
    if "--all" in sys.argv:
        names = sorted(specs)
    elif args:
        names = args
    else:
        names = HEADLINE
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(specs)}", file=sys.stderr)
        return 2

    spark = get_session(app_name="bench", extra_conf={"spark.ui.enabled": "false"})
    # The checkpoint-hygiene unpersists (operators/checkpoints.py)
    # emit one EXPECTED WARN per freed block set ("locally
    # checkpointed ... cannot be recomputed"); across the iterative
    # queries that is dozens of lines burying the one-line bench JSON.
    # Silence the RDD-class loggers for this session only (classic
    # mode; on other backends the hook already degrades silently).
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd", jvm.org.apache.logging.log4j.Level.ERROR
        )
    except Exception:  # noqa: BLE001 — cosmetic only
        pass
    # Warm-up: run each selected query once at the smallest SF so JVM
    # JIT + whole-stage-codegen compilation (a per-plan, not per-row,
    # cost that amortizes to zero on a long-lived cluster) is paid
    # before timing starts. Timed runs below then measure steady-state
    # data throughput at the target SF.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in names:
            try:
                specs[name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
    else:
        spark.range(1).count()

    # Three timed runs per query, report the min: the fastest run is
    # the one least disturbed by unrelated load on the box (observed
    # run-to-run noise on shared VMs exceeds 40%; the queries are
    # deterministic so every run does the same work). Fault-isolated:
    # one broken query must never zero the whole round's perf signal
    # (round 3 lost its entire bench to a single AnalysisException) —
    # failures are reported in the JSON, the rest keep their timings.
    # Paired control coprocess (started AFTER the head warm-up so the
    # two JVMs never execute at once): each of the 3 timed rounds runs
    # head-pass then control-pass, A/B/A/B — see PairedControl.
    control: PairedControl | None = None
    layout_control: PairedControl | None = None
    if paired_on:
        control = PairedControl(paired_commit, sf_dir)
        control.start(
            warm_dir
            if os.path.isdir(warm_dir) and warm_dir != sf_dir
            else None
        )
        # The layout-class control (r16 verdict finding #1) only makes
        # sense when its queries are in this run's head set — on a
        # subset bench that skips them, skip the second coprocess too.
        if any(n in names for n in LAYOUT_PAIRED_QUERIES):
            layout_control = PairedControl(
                LAYOUT_PAIRED_COMMIT,
                sf_dir,
                queries=[n for n in LAYOUT_PAIRED_QUERIES if n in names],
            )
            layout_control.start(
                warm_dir
                if os.path.isdir(warm_dir) and warm_dir != sf_dir
                else None
            )

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _ in range(3):
        for name in names:
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                specs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001 — isolate per query
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                timings.pop(name, None)
                continue
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
        if control is not None:
            control.run_pass()
        if layout_control is not None:
            layout_control.run_pass()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    if control is not None:
        out["control"] = control.finish()
    if layout_control is not None:
        out["layout_control"] = layout_control.finish()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
