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

Method: collect at the given SF, take executedPlan().toString(), cut
at the "== Initial Plan ==" reprint, count FileScan-per-table. A
query is REPORTED (not failed) when some table scans more than once —
several multi-scans are inherent (self-join sides, TPC-H Q21's
EXISTS branches, per-FK-edge pruned key scans) and carry a reasoned
entry in the BASELINE dict below; anything NOT covered is new signal
for the next round's plan work.

    python scripts/scan_audit.py [sf_dir] [query ...] [--json PATH]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# table -> max expected executed scans, with the reason. Anything over
# its entry (default 1) is flagged as NEW.
BASELINE: dict[str, dict[str, tuple[int, str]]] = {
    "dedup_jaccard_pairs": {
        "documents": (2, "self-join sides; materializing is corpus-sized")
    },
    "dedup_jaccard_collapsed": {
        "documents": (3, "collapse consumed by both self-join sides")
    },
    "dedup_overlap_pairs": {
        "documents": (3, "same self-join shape as the jaccard family")
    },
    "dedup_fuzzy_pairs": {
        "documents": (3, "length-banded self-join sides")
    },
    "also_bought_pairs": {
        "orders": (2, "pair self-join sides over the basket relation")
    },
    "pairs_via_hof": {
        "orders": (2, "twin of also_bought_pairs")
    },
    "waiting_supplier": {
        "lineitem": (3, "TPC-H Q21 EXISTS / NOT EXISTS branches"),
        "orders": (2, "status filter branch + count branch"),
    },
    "referential_integrity_audit": {
        "lineitem": (3, "one pruned key-column scan per FK edge"),
        "orders": (3, "parent for lineitem + child for customer + count"),
        "customer": (2, "parent key + child count"),
        "part": (2, "parent key + child count"),
        "supplier": (2, "parent key + child count"),
        "events": (2, "user-FK child + count"),
    },
    "engagement_vs_spend": {
        "events": (2, "sessions and engagement branches prune differently"),
        "orders": (2, "spend branch + buyer-flag branch"),
    },
    "engagement_spend_correlation": {
        "events": (2, "same two event branches as engagement_vs_spend"),
        "orders": (2, "same two order branches"),
    },
    "customer_cohort_setops": {
        "orders": (2, "the two cohort sides of the set algebra"),
        "customer": (2, "each cohort side joins the dim"),
    },
    "customers_without_orders": {
        "orders": (2, "anti-join probe + count branch")
    },
    "doc_lm_perplexity": {
        "documents": (4, "vocab fit, bigram agg, scoring pass, doc-id "
                         "list; AQE reuses the rest (BENCH_COUNTER r13)")
    },
    "corpus_bpe_merges": {
        "documents": (2, "word-count base + the encode-side rescan")
    },
    "corpus_bpe_encode": {
        "documents": (2, "encode fold + the ordered output projection")
    },
    # --- triaged r13 session 2 (first full-registry run) ---
    "lineitem_profile": {
        "lineitem": (12, "the documented profile design: one stats scan "
                         "+ one PRUNED single-column scan per profiled "
                         "column beats a multi-distinct Expand")
    },
    "orders_profile_drift": {
        "orders": (12, "lineitem_profile's design over both drift zones")
    },
    "customer_cohort_setops": {
        "orders": (6, "set-algebra capability demo (§2.8): each "
                      "INTERSECT/EXCEPT branch re-reads a pruned "
                      "year-filtered key list; r14 candidate: "
                      "checkpoint the two year lists")
    },
    "nation_market_share": {
        "nation": (2, "25-row dim joined on customer and supplier sides")
    },
    "purchase_last_click": {
        "events": (2, "purchases and clicks carry DISJOINT pushed "
                      "event_type filters — a union scan reads the "
                      "same bytes")
    },
    "purchase_last_click_matched": {
        "events": (2, "same disjoint purchase/click branches")
    },
    "weekly_retention": {
        "events": (2, "first-seen and activity aggregates prune "
                      "differently; r14 candidate: cohort via window "
                      "over the distinct-activity relation")
    },
    "clicks_before_purchase": {
        "events": (3, "purchase side consumed twice (interval join + "
                      "zero-click re-attach) + the click side; r14 "
                      "candidate: checkpoint the purchase subset")
    },
    "events_gap_filled_hourly": {
        "events": (2, "hour-spine min/max (footer-stats cheap) + the "
                      "hourly aggregate")
    },
    "segment_value_psi": {
        "events": (2, "reference vs current period, disjoint date "
                      "filters")
    },
    "customer_spend_deciles": {
        "orders": (2, "two-level global-rank scheme (operators/"
                      "ranks.py): rank-count pass + ranking pass")
    },
    "order_price_quantiles_approx": {
        "orders": (2, "exact envelope + sketch — the acceptance-check "
                      "design")
    },
    "dormant_high_value_customers": {
        "customer": (2, "high-value and dormant cohort branches")
    },
    "small_order_revenue": {
        "lineitem": (2, "TPC-H Q17's correlated avg-quantity subquery")
    },
    "top_supplier_by_revenue": {
        "lineitem": (2, "TPC-H Q15's max-revenue subquery")
    },
    "knn_bruteforce": {
        "embeddings": (2, "query-set and corpus sides of the cosine "
                          "join read the same table")
    },
    "media_feature_knn": {
        "documents": (2, "query/corpus sides of the feature kNN")
    },
    "embedding_near_dup": {
        "embeddings": (3, "bucket fit + both self-join sides")
    },
    "ann_ivf": {
        "embeddings": (3, "centroid-fit pass + assignment + query probe")
    },
    "ann_hyperplane_lsh": {
        "embeddings": (3, "plane fit + bucket assignment + query probe")
    },
    "embedding_scalar_quantize": {
        "embeddings": (2, "min/max fit pass + the quantize pass")
    },
    "doc_ngram_contamination": {
        "documents": (2, "train vs eval split, disjoint filters")
    },
    "doc_top_keywords": {
        "documents": (3, "tf, df, and N aggregates; r14 candidate: "
                         "N via window over the df relation")
    },
    "corpus_mix_plan": {
        "documents": (2, "per-source stats + corpus totals")
    },
    "corpus_curation_report": {
        "documents": (4, "the capstone UNIONs four report sections, "
                         "each its own pruned aggregate")
    },
    "frequent_items_mg": {
        "documents": (4, "acceptance judge: exact aggregate + total + "
                         "sketch, consumed by two acceptance branches; "
                         "the exact side exists only to GRADE the "
                         "sketch — production is the sketch alone")
    },
    "join_size_cms": {
        "orders": (2, "CMS build + the exact join-size envelope the "
                      "acceptance grade needs"),
        "lineitem": (2, "same per-side build + envelope"),
    },
    "bloom_pruned_revenue": {
        "orders": (2, "p90 cutoff quantile + the bloom build — both "
                      "on the build side")
    },
    "user_freq_cms": {
        "events": (2, "sketch build + the distinct-key probe relation")
    },
    "dedup_incremental": {
        "documents": (2, "old-zone vs new-batch split, disjoint "
                         "filters")
    },
}


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

    spark = get_session(app_name="scan-audit")
    t0 = time.time()
    report: dict[str, dict] = {}
    new_flags: list[str] = []
    for name in names:
        try:
            df = specs[name].fn(spark, sf_dir)
            df.collect()
            plan = (
                df._jdf.queryExecution()
                .executedPlan()
                .toString()
                .split("== Initial Plan ==")[0]
            )
        except Exception as exc:  # noqa: BLE001 — report every query
            report[name] = {"error": str(exc).splitlines()[:1]}
            new_flags.append(name)
            print(f"ERR   {name}")
            continue
        tables: Counter[str] = Counter()
        for line in plan.splitlines():
            if "FileScan parquet" in line:
                m = re.search(r"(\w+)\.parquet", line)
                tables[m.group(1) if m else "?"] += 1
        reused = len(re.findall(r"ReusedExchange", plan))
        over = {
            t: c
            for t, c in tables.items()
            if c > BASELINE.get(name, {}).get(t, (1, ""))[0]
        }
        report[name] = {
            "scans": dict(tables),
            "reused_exchanges": reused,
            "over_baseline": over,
        }
        if over:
            new_flags.append(name)
            print(f"NEW   {name}: {over} (scans={dict(tables)})")
        else:
            print(f"ok    {name}")
    spark.stop()

    print(
        f"\n{len(new_flags)} over-baseline: {new_flags} "
        f"({time.time() - t0:.0f}s)"
    )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "over_baseline": new_flags,
                 "queries": report},
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
