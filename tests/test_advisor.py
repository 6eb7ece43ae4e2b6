"""Join advisor: each decision-table branch on a constructed scenario,
the CMS overestimate guarantee surfaced through est_join_rows, and the
real-tables smoke."""

from __future__ import annotations

from big_data_analytics_final_project_spark.operators.advisor import (
    join_advisor,
)


def _kv(spark, keys, n_partitions=8):
    return spark.createDataFrame(
        [(k,) for k in keys], "k: string"
    ).repartition(n_partitions)


def _advise(spark, probe_keys, build_keys, **kw):
    row = join_advisor(
        _kv(spark, probe_keys),
        _kv(spark, build_keys),
        "k",
        "k",
        **kw,
    ).collect()
    assert len(row) == 1
    return row[0]


def test_broadcast_branch(spark):
    r = _advise(
        spark,
        [f"p{i % 400}" for i in range(2000)],
        [f"p{i}" for i in range(40)],
        broadcast_rows=50,
    )
    assert r.recommendation == "broadcast"
    assert r.build_keys == 40 and r.probe_rows == 2000


def test_skew_branch(spark):
    probe = ["hot"] * 1000 + [f"c{i}" for i in range(1000)]
    build = [f"c{i}" for i in range(500)] + ["hot"]
    r = _advise(spark, probe, build, broadcast_rows=10, skew_tau=0.2)
    assert r.recommendation == "skew"
    assert r.probe_top_key_share == 1000 / 2000


def test_bloom_shuffle_branch(spark):
    # 5% of probe rows match a build side too big to broadcast
    probe = [f"m{i}" for i in range(100)] + [f"x{i}" for i in range(1900)]
    build = [f"m{i}" for i in range(100)] + [f"b{i}" for i in range(900)]
    r = _advise(
        spark, probe, build, broadcast_rows=10, skew_tau=0.5, bloom_tau=0.3
    )
    assert r.recommendation == "bloom_shuffle"
    assert r.est_matched_frac < 0.3


def test_shuffle_branch(spark):
    # every probe row matches: no reduction to exploit
    keys = [f"k{i}" for i in range(800)]
    r = _advise(
        spark,
        keys * 2,
        keys,
        broadcast_rows=10,
        skew_tau=0.5,
        bloom_tau=0.3,
    )
    assert r.recommendation == "shuffle"
    assert r.est_matched_frac >= 1.0  # CMS est >= true (= probe_rows)


def test_estimate_upper_bounds_true_join(spark):
    probe = [f"k{i % 50}" for i in range(500)]
    build = [f"k{i}" for i in range(25)]
    r = _advise(spark, probe, build, broadcast_rows=5)
    true_join = sum(1 for k in probe if int(k[1:]) < 25)
    assert r.est_join_rows >= true_join


def test_real_edge_smoke(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    r = join_advisor(
        li, orders, "l_orderkey", "o_orderkey", label="lineitem->orders"
    ).collect()[0]
    assert r.edge == "lineitem->orders"
    # a 1.5k-key dim at sf0.001 is a broadcast, and every lineitem
    # matches an order (FK integrity) so the match estimate is ~1+
    assert r.recommendation == "broadcast"
    assert r.est_matched_frac >= 1.0
    plan_df = join_advisor(li, orders, "l_orderkey", "o_orderkey")
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_bloom_recommendation_closes_the_loop(spark):
    """When the advisor says bloom_shuffle, actually running
    bloom_semi_join must (a) return the exact semi-join and (b) prune
    the probe side to ≲ the advisor's matched-fraction estimate plus
    the filter's FP allowance — the estimate is actionable, not
    decorative."""
    from big_data_analytics_final_project_spark.operators.bloomjoin import (
        bloom_build,
        bloom_prune,
    )

    probe_keys = [f"m{i}" for i in range(200)] * 2 + [
        f"x{i}" for i in range(3600)
    ]
    build_keys = [f"m{i}" for i in range(200)] + [
        f"b{i}" for i in range(1800)
    ]
    probe, build = _kv(spark, probe_keys), _kv(spark, build_keys)
    r = join_advisor(
        probe, build, "k", "k", broadcast_rows=10, bloom_tau=0.5
    ).collect()[0]
    assert r.recommendation == "bloom_shuffle"
    bloom = bloom_build(build, "k", n_bits=1 << 15)
    survivors = bloom_prune(probe, "k", bloom, n_bits=1 << 15).count()
    # survivors/probe_rows ≤ est_matched_frac (CMS ≥ true) + FP slack
    assert survivors / r.probe_rows <= r.est_matched_frac + 0.02, (
        survivors,
        r.est_matched_frac,
    )
