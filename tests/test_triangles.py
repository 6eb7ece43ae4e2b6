"""Triangle counting (operators/triangles.py): brute-force equivalence
on random graphs + shape/orientation invariants."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.triangles import (
    triangle_count,
)

from .conftest import require_classic


def _brute_triangles(edges: set[tuple[int, int]]) -> int:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    return sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(u, v) for u, v in sorted(edges)], "u long, v long"
    )


def test_known_graphs(spark):
    # triangle, square (no triangle), K4 (4 triangles)
    cases = [
        ({(1, 2), (2, 3), (1, 3)}, 1),
        ({(1, 2), (2, 3), (3, 4), (1, 4)}, 0),
        ({(a, b) for a, b in itertools.combinations(range(1, 5), 2)}, 4),
    ]
    for edges, want in cases:
        row = triangle_count(_edges_df(spark, edges)).collect()[0]
        assert row.n_triangles == want
        assert row.n_edges == len(edges)


def test_random_graph_matches_bruteforce(spark):
    rng = random.Random(7)
    n = 30
    edges = {
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if rng.random() < 0.2
    }
    row = triangle_count(_edges_df(spark, edges)).collect()[0]
    assert row.n_triangles == _brute_triangles(edges)
    assert row.n_edges == len(edges)
    assert row.n_nodes == len({x for e in edges for x in e})


def test_skewed_hub_graph(spark):
    # A star hub (degree 40) plus a few rim edges: the degree-ordered
    # orientation must give the hub ZERO out-edges as a pivot — the
    # property that kills the quadratic hub fan-out at scale — and the
    # count must still be exact.
    hub = 0
    rim = list(range(1, 41))
    edges = {(hub, r) for r in rim} | {(1, 2), (2, 3), (3, 4), (1, 3)}
    row = triangle_count(_edges_df(spark, edges)).collect()[0]
    # triangles: hub-1-2, hub-2-3, hub-3-4, hub-1-3, plus rim 1-2-3? no
    # (1,2),(2,3),(1,3) all present -> rim triangle 1-2-3; rim 2-3-4
    # needs (2,4) absent.
    assert row.n_triangles == _brute_triangles(edges) == 5


def test_empty_and_triangle_free(spark):
    empty = spark.createDataFrame([], "u long, v long")
    row = triangle_count(empty).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (0, 0, 0)


def test_releases_persisted_frames(spark):
    """The default (materialized) path must unpersist its three
    loop-invariant frames before returning; only the 1-row result
    checkpoint may remain (MLlib train-then-unpersist idiom)."""
    require_classic(spark)
    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["u", "v"]
    )
    out = triangle_count(edges)
    row = out.collect()[0]
    assert row["n_triangles"] == 1
    assert n_persistent() <= before + 1
