"""Connected-components operator: known graphs, convergence, chains."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.components import (
    connected_components,
)

from .conftest import require_classic


def _labels(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    out = connected_components(df, "a", "b")
    return {r["node"]: r["label"] for r in out.collect()}


def test_two_components(spark):
    got = _labels(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges(spark):
    """A 40-node path graph needs pointer jumping to converge inside
    the round budget (plain propagation would need 40 rounds)."""
    chain = [(i, i + 1) for i in range(40)]
    got = _labels(spark, chain)
    assert set(got.values()) == {0}
    assert len(got) == 41


def test_cycle_and_self_loop(spark):
    got = _labels(spark, [(5, 6), (6, 7), (7, 5), (9, 9)])
    assert got == {5: 5, 6: 5, 7: 5, 9: 9}


def test_partitioning_independent(spark):
    """Same labels regardless of input partitioning (min is
    order-free)."""
    edges = [(1, 2), (3, 2), (4, 5), (6, 5), (6, 7), (8, 1)]
    df1 = spark.createDataFrame(edges, ["a", "b"]).repartition(1)
    df7 = spark.createDataFrame(edges, ["a", "b"]).repartition(7, F.col("b"))
    out1 = sorted(map(tuple, connected_components(df1, "a", "b").collect()))
    out7 = sorted(map(tuple, connected_components(df7, "a", "b").collect()))
    assert out1 == out7


def test_leaves_one_block_set_at_most(spark):
    """Per-round checkpoints must be freed as the loop advances
    (operators/checkpoints.py): after the call, the only persisted
    entity allowed is the single checkpoint backing the RETURNED
    labels frame — not one per round plus the edge mirror."""
    require_classic(spark)
    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    chain = [(i, i + 1) for i in range(40)]  # multi-round convergence
    df = spark.createDataFrame(chain, ["a", "b"])
    out = connected_components(df, "a", "b")
    assert out.count() == 41  # result stays readable after cleanup
    assert n_persistent() <= before + 1
