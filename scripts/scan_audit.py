#!/usr/bin/env python
"""Executed-plan scan audit: run every registered query and count how
many times the AQE-FINAL plan actually scans each parquet table.

The plan census (PLANS.md) counts STATIC scans — duplicates that
ReusedExchange collapses at runtime are fine there. What this audit
hunts is the opposite failure: duplicate subtrees that AQE does NOT
collapse (per-branch column pruning, independent join strategies),
which at 100 TB means re-reading the corpus once per consumer. The
r13 session-2 finds were exactly this class: conversion_funnel at 5
events scans, the composed rolling-quantile rollup at 3.

Method (r14, closing the r13 materialization blind spot): build the
query and collect it inside `plans.executed_scan_counts`, which sweeps
the SQL status store for EVERY execution the call fired — the final
collect AND the construction-time jobs (eager checkpoints, operator-
internal model collects) that a final-plan-only audit could not see —
and sums AQE-final FileScan-per-table across them. A query is
REPORTED (not failed) when some table scans more than once — several
multi-scans are inherent (self-join sides, TPC-H Q21's EXISTS
branches, per-FK-edge pruned key scans, persist-fill + post-release
passes) and carry a reasoned entry in the BASELINE below; anything
NOT covered is new signal for the next round's plan work.

Known overcount: a `.persist()`ed subtree reprints its FileScan in
every consumer execution's plan description even though the cache
serves the reads — entries for the persisting operators say so.

    python scripts/scan_audit.py [sf_dir] [query ...] [--json PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# table -> max expected TOTAL executed scans across all of the query's
# jobs, with the reason. Anything over its entry (default 1) is
# flagged as NEW. Built from pairs with a duplicate-key guard: a dict
# literal silently keeps the last duplicate (the r13 verdict's find —
# two `customer_cohort_setops` entries, the first dead).
_BASELINE_ITEMS: list[tuple[str, dict[str, tuple[int, str]]]] = [
    # dedup_jaccard_pairs: no entry — r18 drained its 2-scan allowance:
    # the (doc_id, distinct-set) frame is checkpointed once (lazily;
    # the result checkpoint materializes it) and the inverted index
    # plus both verification re-attaches derive from it, so documents
    # is scanned exactly once (the default).
    ("dedup_jaccard_collapsed", {
        "documents": (2, "r16 drain (was 3): the collapsed rep frame "
                         "and the thin (member, hash) mapping are "
                         "each checkpointed once and feed every "
                         "downstream consumer. Two is the deliberate "
                         "floor — the only single-scan route would "
                         "checkpoint the raw text column per member "
                         "(both frames need md5(text); only reps "
                         "needs the text), inverting the trade at "
                         "100 TB")
    }),
    # dedup_overlap_pairs: no entry — r16 drained its 3-scan allowance
    # (the lm_train_score pattern): the distinct-shingle-set frame is
    # eagerly checkpointed once and the inverted index (both join
    # sides) plus the two verification set re-attaches derive from it,
    # so documents is scanned exactly once (the default).
    # dedup_fuzzy_pairs: no entry — r16 drained its 3-scan allowance:
    # the (doc_id, 48-char slice) frame is checkpointed once and both
    # blocked self-join sides derive from it (1 documents scan).
    ("also_bought_pairs", {
        "orders": (2, "pair self-join sides over the basket relation")
    }),
    ("pairs_via_hof", {
        "orders": (2, "twin of also_bought_pairs")
    }),
    ("waiting_supplier", {
        "lineitem": (3, "TPC-H Q21 EXISTS / NOT EXISTS branches"),
        "orders": (2, "status filter branch + count branch"),
    }),
    ("referential_integrity_audit", {
        # r18 full-outer restructure: each side of every FK edge is
        # aggregated ONCE (dup counting folded into the same final
        # aggregate), and the two customer-parent branches are
        # plan-identical so ReuseExchange collapses them
        "lineitem": (3, "one pruned key-column scan per FK edge"),
        "orders": (2, "parent for lineitem + child for customer"),
        "events": (1, "user-FK child"),
    }),
    ("engagement_vs_spend", {
        "events": (2, "sessions and engagement branches prune differently"),
        "orders": (2, "spend branch + buyer-flag branch"),
    }),
    ("engagement_spend_correlation", {
        "events": (2, "same two event branches as engagement_vs_spend"),
        "orders": (2, "same two order branches"),
    }),
    ("customer_cohort_setops", {
        "orders": (2, "one scan per disjoint year filter; the distinct "
                      "buyer lists are checkpointed before the set "
                      "algebra (r14 fix — was 5: each INTERSECT/EXCEPT "
                      "branch re-read a year-filtered key list)"),
    }),
    ("customers_without_orders", {
        "orders": (2, "anti-join probe + count branch")
    }),
    # doc_lm_perplexity: no entry — r15 rewrote lm_train_score around
    # one eagerly-checkpointed tokenized (doc_id, token-array) frame
    # (token-cardinality, text column dropped); vocab fit, bigram agg,
    # scoring, and the doc-id re-attach all read the checkpoint, so
    # the corpus parquet is scanned once (was 5).
    ("corpus_bpe_merges", {
        "documents": (2, "word-count base + the encode-side rescan")
    }),
    ("corpus_bpe_encode", {
        "documents": (2, "encode fold + the ordered output projection")
    }),
    # --- triaged r13 session 2 (first full-registry run) ---
    ("lineitem_profile", {
        "lineitem": (11, "the documented profile design: one PRUNED "
                         "single-column scan per profiled column (r18 "
                         "fold: the separate stats scan is gone) beats "
                         "a multi-distinct Expand")
    }),
    ("orders_profile_drift", {
        "orders": (10, "lineitem_profile's r18-fold design over both "
                       "drift zones (5 columns each)")
    }),
    ("nation_market_share", {
        "nation": (2, "25-row dim joined on customer and supplier sides")
    }),
    ("purchase_last_click", {
        "events": (2, "purchases and clicks carry DISJOINT pushed "
                      "event_type filters — a union scan reads the "
                      "same bytes")
    }),
    ("purchase_last_click_matched", {
        "events": (2, "same disjoint purchase/click branches")
    }),
    # weekly_retention: no entry — r14 rewrote the cohort aggregate
    # as a MIN window over the distinct-activity relation (was 2
    # events scans; now the default 1).
    ("clicks_before_purchase", {
        "events": (2, "disjoint purchase/click pushed filters; the "
                      "doubly-consumed purchase subset is checkpointed "
                      "(r14 fix — was 3)")
    }),
    ("events_gap_filled_hourly", {
        "events": (2, "hour-spine min/max (footer-stats cheap) + the "
                      "hourly aggregate")
    }),
    ("segment_value_psi", {
        "events": (2, "reference vs current period, disjoint date "
                      "filters")
    }),
    ("customer_spend_deciles", {
        "orders": (2, "two-level global-rank scheme (operators/"
                      "ranks.py): rank-count pass + ranking pass")
    }),
    ("order_price_quantiles_approx", {
        "orders": (2, "exact envelope + sketch — the acceptance-check "
                      "design")
    }),
    ("dormant_high_value_customers", {
        "customer": (2, "high-value and dormant cohort branches")
    }),
    ("small_order_revenue", {
        "lineitem": (2, "TPC-H Q17's correlated avg-quantity subquery")
    }),
    ("top_supplier_by_revenue", {
        "lineitem": (2, "TPC-H Q15's max-revenue subquery")
    }),
    ("knn_bruteforce", {
        "embeddings": (2, "query-set and corpus sides of the cosine "
                          "join read the same table")
    }),
    ("media_feature_knn", {
        "documents": (2, "query/corpus sides of the feature kNN")
    }),
    ("embedding_near_dup", {
        "embeddings": (2, "r17 drain (was 3): centroid fit + the "
                          "eager cell-assignment checkpoint "
                          "(operators/similarity_staged.py); the "
                          "self-join sides and rep chain read the "
                          "checkpoint. 2 is the documented floor — "
                          "a 1-scan route would checkpoint the raw "
                          "corpus frame before the fit; per-run "
                          "pins in tests/test_similarity_drain.py")
    }),
    ("ann_ivf", {
        "embeddings": (2, "r17 drain (was 3): centroid fit + the "
                          "eager ranked-assignment checkpoint "
                          "(operators/similarity_staged.py); index "
                          "and probe sides read the checkpoint. "
                          "Same 2-scan floor and per-run pins as "
                          "embedding_near_dup")
    }),
    ("ann_hyperplane_lsh", {
        "embeddings": (3, "plane fit + bucket assignment + query probe")
    }),
    ("embedding_scalar_quantize", {
        "embeddings": (2, "min/max fit pass + the quantize pass")
    }),
    ("doc_ngram_contamination", {
        "documents": (2, "train vs eval split, disjoint filters")
    }),
    ("doc_top_keywords", {
        "documents": (2, "token explode + the zero-column n_docs "
                         "count (footer-stats class); df rides a "
                         "window now, not a re-aggregated subtree "
                         "(r14 fix — was 3)")
    }),
    ("corpus_mix_plan", {
        "documents": (2, "per-source stats + corpus totals")
    }),
    ("frequent_items_mg", {
        "documents": (4, "acceptance judge: exact aggregate + total + "
                         "sketch, consumed by two acceptance branches; "
                         "the exact side exists only to GRADE the "
                         "sketch — production is the sketch alone")
    }),
    ("join_size_cms", {
        "orders": (2, "CMS build + the exact join-size envelope the "
                      "acceptance grade needs"),
        "lineitem": (2, "same per-side build + envelope"),
    }),
    ("bloom_pruned_revenue", {
        "orders": (2, "p90 cutoff quantile + the bloom build — both "
                      "on the build side")
    }),
    ("user_freq_cms", {
        "events": (2, "sketch build + the distinct-key probe relation")
    }),
    ("dedup_incremental", {
        "documents": (2, "old-zone vs new-batch split, disjoint "
                         "filters")
    }),
    # --- entries below exist only under the r14 all-executions sweep
    #     (construction-time jobs were invisible to the r13 audit) ---
    ("conversion_funnel", {
        "events": (3, "one pushed-filter scan per funnel stage, each "
                      "inside its frontier checkpoint (the r13 fix's "
                      "contract; was 5 un-materialized)")
    }),
    ("embedding_kmeans", {
        "embeddings": (2, "persist-fill on the seed collect + the "
                          "post-release final assignment; Lloyd's "
                          "rounds read the cache (plan reprints of "
                          "the cached subtree may overcount); "
                          "byte-counter steady state is 3 footer "
                          "opens (seed collect + fill + final) — "
                          "re-measured every pytest run by "
                          "tests/test_scan_bytes.py")
    }),
    ("doc_weighted_sample", {
        "documents": (2, "the checkpointed race frame + the winner "
                         "join-back (r13 fix's contract)")
    }),
    ("part_pagerank", {
        "lineitem": (2, "edge persist fill + the final labeled "
                        "output pass; Hadoop-FS byte-counter ground "
                        "truth is exactly 2 footer opens — "
                        "re-measured every pytest run by "
                        "tests/test_scan_bytes.py (was a one-time "
                        "COVERAGE r14 note); the parse_flags note "
                        "applies, the count happens to parse exactly "
                        "here")
    }),
    ("part_triangle_count", {
        "lineitem": (1, "byte-counter ground truth: ONE lineitem "
                        "open — ReusedExchange collapses the edge "
                        "self-join's sides inside the persist fill; "
                        "the text parser truncates at this query's "
                        "nested-adaptive cache chain (parse_flags) "
                        "and may report fewer; re-measured every "
                        "pytest run by tests/test_scan_bytes.py")
    }),
    ("doc_dedup_survivors", {
        "documents": (2, "LSH candidate build + the survivor "
                         "anti-join re-attach of the full collection")
    }),
    ("dedup_semantic_clusters", {
        "embeddings": (2, "r18 drain (was 3): the pairs side is "
                          "embedding_near_dup_staged — centroid fit "
                          "+ the eager cell-assignment checkpoint; "
                          "self-join sides and the rep chain read "
                          "the checkpoint, and the component loop "
                          "runs on checkpointed pairs")
    }),
    ("corpus_curation_report", {
        "documents": (3, "one checkpointed feature pass (quality + "
                         "lang + sample flag + minhash bands in a "
                         "single projection — r14 rewrite; was 5: "
                         "each composed stage re-derived its features "
                         "from text) + the two exact-jaccard verify "
                         "set sides, which ReusedExchange usually "
                         "collapses to one (measured 2)")
    }),
    ("zone_zorder_prune", {
        "lineitem": (4, "the layout pass's designed shape (registered "
                        "r16): one column-less count for the rank "
                        "scaling + one pruned ranking/offsets pass "
                        "per z column (the 32-row offsets BROADCAST "
                        "job re-derives its range exchange in its own "
                        "execution, where stage reuse cannot reach) + "
                        "the write pass itself, whose in-job counts "
                        "branches DO collapse (the 2 reused_exchanges "
                        "measured). The nightly-OPTIMIZE class: "
                        "scan-bounded, one range+one hash exchange "
                        "per z column, never single-task"),
        # the zone read-back is the _nontable scan (default 1)
    }),
    ("zone_roundtrip_daily", {
        "events": (3, "footer-cheap max-day probe + bulk load + the "
                      "checkpointed upsert delta (r14 fix — was 5: "
                      "the merge consumed the un-materialized delta "
                      "three times)"),
        "_nontable": (3, "the write path's own reads: existing-zone "
                         "merge, staging re-read, final zone "
                         "read-back — delta-bounded, never "
                         "corpus-sized"),
    }),
]


BASELINE: dict[str, dict[str, tuple[int, str]]] = {}
for _name, _entry in _BASELINE_ITEMS:
    if _name in BASELINE:
        raise AssertionError(
            f"duplicate BASELINE entry for {_name!r} — merge them "
            "(a dict literal would silently drop the first)"
        )
    BASELINE[_name] = _entry


# --- executed-shuffle trend gate (r14 verdict #4) -------------------
# The audit records executed Exchange counts per query; this gate
# compares them round-over-round against the newest same-sf
# SCANS_r{N}.json in the repo root, so a rewrite that trades a scan
# for extra shuffles can't pass silently. A query whose shuffle count
# is EXPECTED to move this round gets an entry here (the reason is
# the audit trail); anything else that grows is flagged in the JSON's
# `shuffle_over` list. New registrations have no prior and simply
# seed next round's baseline.
_SHUFFLE_REBASELINE: dict[str, str] = {
    # r18 width-heals (operators/spread.py): each adds exactly ONE
    # deliberate round-robin exchange right after a scan whose
    # single-row-group layout otherwise serializes the map side onto
    # one core; measured per-query wins in OPTIMIZATION_r18.md. On
    # multi-row-group zones the gate never fires and the count
    # returns to its prior.
    "revenue_by_brand": "r18 width-heal: +1 pre-join exchange",
    "bloom_pruned_revenue": "r18 width-heal: +1 pre-probe exchange",
    "corpus_bpe_encode": "r18 width-heal: +1 pre-tokenize exchange",
    "corpus_overlap_kmv": "r18 width-heal: +1 pre-shingle exchange",
    "doc_quality_score": "r18 width-heal: +1 pre-scoring exchange",
    "doc_repetition_stats": "r18 width-heal: +1 pre-metrics exchange",
    "dedup_jaccard_collapsed": (
        "r18: the nested jaccard_pairs drain (set frame checkpointed "
        "once, 2->1 documents scans) moves its staging boundary; the "
        "composed plan's executed exchanges went 7->9 while the "
        "interleaved A/B runtime stayed flat (1.02 head/control) — "
        "a bookkeeping move, not a new data shuffle"
    ),
}

# name -> (allowance, reason): queries whose EXECUTED shuffle count is
# AQE-nondeterministic run-to-run on identical data (a borderline join
# flips broadcast <-> shuffle: -1 BroadcastExchange, +2 Exchange).
# Entries require a measured multi-run investigation, not a guess —
# the default for every other query is exact (0 jitter).
_SHUFFLE_JITTER: dict[str, tuple[int, str]] = {
    "dedup_semantic_clusters": (
        3,
        "measured r15: 5 audit runs on identical sf0.001 data gave "
        "49/50/50/50/51 shuffles with broadcasts 20-22 — one "
        "borderline join inside the component loop flips under AQE",
    ),
    "dedup_jaccard_collapsed": (
        1,
        "measured r17 on UNTOUCHED code: 5 single-query audit runs on "
        "identical sf0.001 data gave 8/8/8/7/7 shuffles (r15 pre-drain "
        "8, r16 post-drain 7) — one borderline expansion join flips "
        "broadcast<->shuffle under AQE",
    ),
}


def _prior_shuffles(
    sf_dir: str, exclude_round: int | None = None
) -> tuple[str | None, dict[str, int]]:
    """(filename, {query: executed shuffles}) from the newest
    SCANS_r{N}.json recorded at the SAME sf_dir — cross-scale AQE
    choices differ, so only same-scale rounds are comparable.
    ``exclude_round`` drops the round currently being WRITTEN, so a
    re-run within one round still compares against the previous
    round's artifact instead of its own first sweep."""
    import glob
    import re as _re

    best: tuple[int, str] | None = None
    for path in glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCANS_r*.json")
    ):
        m = _re.search(r"SCANS_r(\d+)\.json$", path)
        if not m or (exclude_round is not None
                     and int(m.group(1)) >= exclude_round):
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:  # noqa: BLE001 — unreadable prior is no prior
            continue
        if data.get("sf_dir") != sf_dir:
            continue
        rnd = int(m.group(1))
        if best is None or rnd > best[0]:
            best = (rnd, path)
    if best is None:
        return None, {}
    with open(best[1]) as f:
        data = json.load(f)
    return os.path.basename(best[1]), {
        n: q["shuffles"]
        for n, q in data.get("queries", {}).items()
        if isinstance(q.get("shuffles"), int)
    }


def _current_prep_round() -> int | None:
    """The round currently being prepared: max recorded CORRECTNESS
    round + 1 — the same derivation scripts/grading_manifest.py uses.
    The shuffle trend gate excludes any SCANS artifact from this round
    so a mid-round re-run compares against the PREVIOUS round's state,
    never its own first sweep. None before the first graded round.

    TAIL-WINDOW CAVEAT (r16 advice): in the sliver after
    CORRECTNESS_rN is recorded but before round N+1's first edit, an
    ad-hoc (non-canonically-named) run computes prep=N+1 and takes
    SCANS_rN as its prior — a self-comparison IF one still considers
    round N open. The states "tail of N" and "start of N+1" are
    indistinguishable from artifacts alone (both have CORRECTNESS max
    = SCANS max = N), and any formula that drops SCANS_rN there also
    drops the legitimate prior at the start of round N+1, so this is
    documented rather than coded around. The canonical per-round
    invocation (--json SCANS_r{N}.json) is unaffected: it derives the
    exclusion from its own output filename, never from this
    fallback."""
    import glob as _glob
    import re as _re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for p in _glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := _re.search(r"r(\d+)\.json$", p))
    ]
    return max(rounds) + 1 if rounds else None


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from big_data_analytics_final_project_spark import get_session
    from big_data_analytics_final_project_spark.queries import all_queries

    specs = all_queries()
    unknown = sorted(only - set(specs))
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    names = [n for n in sorted(specs) if not only or n in only]

    from big_data_analytics_final_project_spark.plans import (
        executed_scan_counts,
    )

    spark = get_session(
        app_name="scan-audit",
        # one audit run fires hundreds of executions; don't let the
        # status store evict entries mid-sweep
        extra_conf={"spark.sql.ui.retainedExecutions": "5000"},
    )
    t0 = time.time()
    exclude = None
    if json_out:
        import re as _re

        m = _re.search(r"SCANS_r(\d+)\.json$", json_out)
        if m:
            exclude = int(m.group(1))
    if exclude is None:
        # No canonical SCANS_r{N}.json output name to derive the
        # in-progress round from (r15 ADVICE: a custom -o name or a
        # no-JSON ad-hoc run would otherwise compare against the
        # artifact THIS round already committed, flagging its own
        # expected shuffle moves as regressions).
        exclude = _current_prep_round()
    prior_file, prior_shuffles = _prior_shuffles(sf_dir, exclude)
    report: dict[str, dict] = {}
    new_flags: list[str] = []
    shuffle_flags: list[str] = []
    for name in names:
        extras: dict = {}
        try:

            def _run(_name=name):
                df = specs[_name].fn(spark, sf_dir)
                df.collect()
                return df

            _, tables = executed_scan_counts(spark, _run, extras=extras)
        except Exception as exc:  # noqa: BLE001 — report every query
            report[name] = {"error": str(exc).splitlines()[:1]}
            new_flags.append(name)
            print(f"ERR   {name}")
            continue
        # from the swept executions, NOT the final frame's executedPlan
        # — under materialize-by-default that plan is a post-checkpoint
        # RDD scan and read 0 for every checkpointed query (r14 advice)
        reused = extras.get("reused_exchanges", 0)
        over = {
            t: c
            for t, c in tables.items()
            if c > BASELINE.get(name, {}).get(t, (1, ""))[0]
        }
        report[name] = {
            "scans": dict(tables),
            # executed exchange nodes across ALL the query's jobs —
            # trend data (round-over-round shuffle-count drift on a
            # rewrite shows here even when scans stay flat); the
            # per-operator shuffle BOUNDS live in tests/test_plans.py
            "shuffles": extras.get("shuffles", 0),
            "broadcasts": extras.get("broadcasts", 0),
            "reused_exchanges": reused,
            "over_baseline": over,
        }
        if "parse_flags" in extras:
            # deep cache chains outdent nested adaptive plan markers
            # past text-parseability; counts are conservative
            # truncations — the baseline reason records ground truth
            report[name]["parse_flags"] = extras["parse_flags"]
        cur_sh = report[name]["shuffles"]
        prior_sh = prior_shuffles.get(name)
        jitter = _SHUFFLE_JITTER.get(name, (0, ""))[0]
        sh_over = prior_sh is not None and cur_sh > prior_sh + jitter
        if sh_over and name in _SHUFFLE_REBASELINE:
            report[name]["shuffle_rebaselined"] = _SHUFFLE_REBASELINE[name]
            sh_over = False
        if sh_over:
            report[name]["shuffle_over"] = {
                "prior": prior_sh, "current": cur_sh
            }
            shuffle_flags.append(name)
        if over:
            new_flags.append(name)
            print(f"NEW   {name}: {over} (scans={dict(tables)})")
        elif sh_over:
            print(f"SHUF  {name}: {prior_sh} -> {cur_sh} executed shuffles")
        else:
            print(f"ok    {name}")
    spark.stop()

    print(
        f"\n{len(new_flags)} over-baseline: {new_flags} "
        f"({time.time() - t0:.0f}s)"
    )
    print(
        f"{len(shuffle_flags)} shuffle regressions vs "
        f"{prior_file or 'no prior'}: {shuffle_flags}"
    )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "over_baseline": new_flags,
                 "shuffle_prior": prior_file,
                 "shuffle_over": shuffle_flags,
                 "queries": report},
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
