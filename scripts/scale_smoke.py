#!/usr/bin/env python
"""Empirical scale validation: replicate the sf0.1 testdata K-fold with
key-offset copies, run the headline queries on the enlarged zones, and
report each query's runtime scaling factor next to the data factor.

    python scripts/scale_smoke.py [--factor 10] [--out SCALE_r08.md]

The grading SFs verify CORRECTNESS; this smoke probes the SCALE claim
the plan designs make: a query whose plan is linear (scans, hash aggs,
bucketed joins, bounded-frame windows) should slow by ~the data factor
on a fixed-core box, while anything accidentally quadratic (a pair
generator whose blocking silently degraded, a window that funnels a
grown frame through one task) blows past it.

Replication semantics: each copy k of a fact row gets every PRIMARY
and FOREIGN key shifted by k·(max_key+1) consistently across tables,
so join fan-outs, group sizes per key, and time distributions are
PRESERVED (k independent shards of the same world — exactly how a
bigger tenant looks). The small dims (region, nation) stay single
because every copy's FKs still resolve to them. `documents.text` and
`embeddings.embedding` are copied VERBATIM: a K-fold-duplicated corpus
is the honest stress for the dedup/ANN family (every doc gains K−1
exact duplicates; candidate pairs must grow ~K·pairs_per_doc, never
quadratically in the corpus).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_analytics_final_project_spark import get_session

# (table, [key columns to offset]) — keys are shifted per copy by
# k * (global max over ALL offset columns of the table's key domain+1)
# computed per key COLUMN's own domain.
OFFSETS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# key column -> the table that OWNS the domain (offset must agree
# between the PK table and every FK reference)
DOMAIN_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def replicate(spark, src_dir: str, dst_dir: str, factor: int) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    strides: dict[tuple[str, str], int] = {}
    for col, (owner, owner_col) in DOMAIN_OWNER.items():
        key = (owner, owner_col)
        if key not in strides:
            mx = (
                spark.read.parquet(f"{src_dir}/{owner}.parquet")
                .agg(F.max(owner_col))
                .collect()[0][0]
            )
            strides[key] = int(mx) + 1
    for table, keys in OFFSETS.items():
        src = spark.read.parquet(f"{src_dir}/{table}.parquet")
        if not keys:
            out = src
        else:
            copies = []
            for k in range(factor):
                c = src
                for col in keys:
                    stride = strides[DOMAIN_OWNER[col]]
                    c = c.withColumn(
                        col, (F.col(col) + F.lit(k * stride)).cast("bigint")
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst_dir}/{table}.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/scale_smoke")
    ap.add_argument("--out", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import BENCH_VARIANTS, HEADLINE

    from big_data_analytics_final_project_spark.queries import (
        QuerySpec,
        all_queries,
    )
    from big_data_analytics_final_project_spark.queries.batch import (
        bloom_pruned_revenue,
    )
    from big_data_analytics_final_project_spark.queries.quality import (
        customer_k_anonymity,
        lineitem_profile,
        orders_profile_drift,
    )
    from big_data_analytics_final_project_spark.queries.drift import (
        events_rolling_value_quantiles,
    )
    from big_data_analytics_final_project_spark.queries.text import (
        corpus_bpe_merges,
        corpus_overlap_kmv,
        doc_lm_perplexity,
    )
    from big_data_analytics_final_project_spark.queries.maintenance import (
        bucketed_segment_spend,
        zone_compaction_roundtrip,
        zone_orc_roundtrip,
        zone_zorder_prune,
    )
    from big_data_analytics_final_project_spark.queries.windows import (
        join_size_cms,
        purchase_pit_order_status,
    )

    # authored-but-unregistered r12/r13 queue (COVERAGE.md) —
    # scale-smokable by name here even before their registrations land
    unregistered = {
        "lineitem_profile": QuerySpec(lineitem_profile),
        "join_size_cms": QuerySpec(join_size_cms),
        "bloom_pruned_revenue": QuerySpec(bloom_pruned_revenue),
        "doc_lm_perplexity": QuerySpec(doc_lm_perplexity),
        "corpus_bpe_merges": QuerySpec(corpus_bpe_merges),
        "customer_k_anonymity": QuerySpec(customer_k_anonymity),
        "orders_profile_drift": QuerySpec(orders_profile_drift),
        "corpus_overlap_kmv": QuerySpec(corpus_overlap_kmv),
        "events_rolling_value_quantiles": QuerySpec(
            events_rolling_value_quantiles
        ),
        "zone_zorder_prune": QuerySpec(zone_zorder_prune),
        "purchase_pit_order_status": QuerySpec(purchase_pit_order_status),
        "zone_compaction_roundtrip": QuerySpec(zone_compaction_roundtrip),
        "bucketed_segment_spend": QuerySpec(bucketed_segment_spend),
        "zone_orc_roundtrip": QuerySpec(zone_orc_roundtrip),
    }
    specs = {**all_queries(), **BENCH_VARIANTS, **unregistered}
    names = args.queries or HEADLINE

    spark = get_session(
        app_name="scale-smoke",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    big_dir = os.path.join(args.work, f"x{args.factor}")
    marker = os.path.join(big_dir, "_REPLICATED_OK")
    if not os.path.exists(marker):
        t0 = time.time()
        replicate(spark, args.base, big_dir, args.factor)
        open(marker, "w").write(f"{args.factor}\n")
        print(f"replicated x{args.factor} in {time.time() - t0:.0f}s")

    def bench_at(sf_dir: str) -> dict[str, float]:
        times: dict[str, float] = {}
        for _ in range(2):
            for name in names:
                t0 = time.perf_counter()
                try:
                    specs[name].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as exc:  # noqa: BLE001
                    times[name] = float("nan")
                    print(f"ERR {name}: {type(exc).__name__}: {exc}"[:200])
                    continue
                dt = time.perf_counter() - t0
                if name not in times or dt < times[name]:
                    times[name] = dt
        return times

    # warm both layouts once, then time base and big
    base_t = bench_at(args.base)
    big_t = bench_at(big_dir)

    rows = []
    for name in names:
        b, g = base_t.get(name), big_t.get(name)
        ratio = (g / b) if (b and g == g and b == b and b > 0) else float("nan")
        rows.append((name, b, g, ratio))
        print(f"{name:34s} base={b:7.2f}s x{args.factor}={g:7.2f}s ratio={ratio:6.2f}")

    summary = {
        "factor": args.factor,
        "queries": {
            n: {"base_s": round(b, 3), "big_s": round(g, 3), "ratio": round(r, 2)}
            for n, b, g, r in rows
            if b == b and g == g
        },
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            f.write(
                f"# Scale smoke — headline queries at {args.factor}x sf0.1\n\n"
                "Runtime ratio vs data factor on a fixed 32-core box "
                "(ratio well under the factor means the box still had idle "
                "cores / fixed overheads dominate; ratio far ABOVE it "
                "means super-linear work — the failure this smoke hunts).\n\n"
                "| query | sf0.1 s | "
                f"{args.factor}x s | ratio |\n|---|---|---|---|\n"
            )
            for n, b, g, r in rows:
                f.write(f"| {n} | {b:.2f} | {g:.2f} | {r:.2f} |\n")
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
