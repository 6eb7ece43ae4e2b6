"""PageRank invariants + the winnowing match guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.pagerank import pagerank

from .conftest import require_classic


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    return df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_pagerank_mass_conserved_and_star_center_wins(spark):
    """On a symmetrized graph (no dangling mass) total rank stays ~1
    (drift bounded by the per-contribution 0.5/1e12 quantization), and
    the hub of a star out-ranks every leaf."""
    edges = _sym(spark, [(0, i) for i in range(1, 7)])
    ranks = {r.node: r.pagerank for r in pagerank(edges, n_iters=3).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    hub = ranks.pop(0)
    assert all(hub > leaf for leaf in ranks.values())
    # leaves are symmetric — exactly equal ranks (determinism incl.
    # quantization must not break the symmetry)
    assert len(set(ranks.values())) == 1


def test_pagerank_uniform_on_cycle(spark):
    """A ring is rank-regular: every node ends exactly at 1/N."""
    n = 5
    edges = _sym(spark, [(i, (i + 1) % n) for i in range(n)])
    ranks = [r.pagerank for r in pagerank(edges, n_iters=3).collect()]
    assert len(ranks) == n
    assert all(abs(r - 1.0 / n) < 1e-9 for r in ranks)


def test_winnowing_match_guarantee(spark):
    """The SWA guarantee: two docs sharing a token run of length
    ≥ w + k - 1 (w=4 windows over k=3-token shingles → 6 tokens) must
    share at least one selected fingerprint; unrelated docs share
    none (md5 collisions aside)."""
    from big_data_analytics_final_project_spark.queries.text import (
        winnow_frame,
    )

    shared = "alpha bravo charlie delta echo foxtrot"  # 6-token run
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail one two"),
            (2, f"{shared} completely different ending tokens follow now"),
            (3, "nothing in common with the others at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    fps = {
        r.doc_id: set(r.mins)
        for r in winnow_frame(docs).collect()
    }
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not fps[1] & fps[3]
    assert not fps[2] & fps[3]


def test_pagerank_releases_persisted_frames(spark):
    """The default (materialized) path must unpersist the node and
    edge caches before returning; only the node-sized result
    checkpoint may remain (MLlib train-then-unpersist idiom)."""
    require_classic(spark)
    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    edges = [(1, 2), (2, 1), (2, 3), (3, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = pagerank(df, n_iters=2)
    assert abs(sum(r["pagerank"] for r in out.collect()) - 1.0) < 1e-9
    assert n_persistent() <= before + 1
