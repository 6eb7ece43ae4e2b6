"""Reference-scale golden anchor: the generator's statistical shape.

Runs the Spark-plan generator at the reference's FULL cardinalities
(100k transactions / 10k users / 5k products — data_generator.py
defaults, PDF §7.1) and pins the flagship outputs' shape against
BASELINE.md's golden table (PDF §8.1-8.3). Exact values cannot match —
the reference draws from Faker/numpy RNG, this engine from md5
uniforms — but the DISTRIBUTIONAL structure the reference's analytics
report must reproduce:

- §8.1 Table 1: 25 categories, near-uniform revenue, top ≈ 5.19M
  (ours ≈ 4.51M — same model: ~100M total item revenue over 25 cats)
- §8.2 Table 2: top spender ≈ 30.3k over 18 orders
  (ours ≈ 26.8k over 21)
- §8.3: max co-purchase pair count = 3 — matched exactly (pair
  collisions over 5k products at 1-3 items/tx are this rare at 100k tx)

Also pins seed-determinism: the generator is a pure function of row
ids, so a second evaluation must reproduce the leaders bit-for-bit
(the property that lets a 1000-executor regeneration be reproducible).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.functions.numeric import exact_sum
from big_data_analytics_final_project_spark.generator import (
    gen_products,
    gen_transactions,
)

N_TX, N_USERS, N_PRODUCTS, N_CATS = 100_000, 10_000, 5_000, 25


@pytest.fixture(scope="module")
def full_scale_tx(spark):
    return gen_transactions(spark, N_TX, N_USERS, N_PRODUCTS)


def _revenue_by_category(spark, tx):
    prods = gen_products(spark, N_PRODUCTS, N_CATS).select(
        "product_id", "category_id"
    )
    items = tx.select(
        "transaction_id", F.explode("items").alias("item")
    ).select(
        "transaction_id",
        F.col("item.product_id").alias("product_id"),
        F.col("item.quantity").alias("quantity"),
        F.col("item.subtotal").alias("item_subtotal"),
    )
    return (
        items.join(F.broadcast(prods), "product_id", "left")
        .groupBy("category_id")
        .agg(
            exact_sum("item_subtotal", "revenue"),
            F.sum("quantity").cast("bigint").alias("units_sold"),
            F.countDistinct("transaction_id").alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), "category_id")
    )


def test_revenue_by_category_shape(spark, full_scale_tx):
    """PDF §8.1 Table 1 shape: full category coverage, revenue
    magnitude, and near-uniformity (no degenerate hot category)."""
    rows = _revenue_by_category(spark, full_scale_tx).collect()
    assert len(rows) == N_CATS
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    # reference top cat ≈ 5.19M, ours ≈ 4.51M — one band covers both
    assert 4_000_000 <= revs[0] <= 6_000_000
    assert revs[-1] >= 2_500_000
    assert revs[0] / revs[-1] < 2.0, "category revenue should be near-uniform"
    top = rows[0]
    # ~8 units/order-touch and thousands of orders per category at
    # 1-3 items × 1-3 qty over 25 cats
    assert 12_000 <= top["units_sold"] <= 26_000
    assert 5_000 <= top["n_orders"] <= 12_000


def test_top_spenders_shape(spark, full_scale_tx):
    """PDF §8.2 Table 2 shape: top spender total and order count."""
    top5 = (
        full_scale_tx.groupBy("user_id")
        .agg(
            exact_sum("total", "total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spent").desc(), "user_id")
        .limit(5)
        .collect()
    )
    totals = [r["total_spent"] for r in top5]
    assert totals == sorted(totals, reverse=True)
    # reference 30,314 / 18 orders; ours ≈ 26.8k / 21
    assert 20_000 <= totals[0] <= 40_000
    assert all(10 <= r["n_orders"] <= 40 for r in top5)


def test_max_copurchase_pair_count(spark, full_scale_tx):
    """PDF §8.3: the most-frequent co-purchase pair appears 3 times at
    reference scale — pair collisions over 5k products are this rare.
    Band allows ±: the structure (single digits, >1) is the invariant."""
    prods = full_scale_tx.select(
        "transaction_id", F.explode("items").alias("it")
    ).select(
        "transaction_id", F.col("it.product_id").alias("pid")
    ).distinct()
    a, b = prods.alias("a"), prods.alias("b")
    max_count = (
        a.join(b, "transaction_id")
        .where(F.col("a.pid") < F.col("b.pid"))
        .groupBy("a.pid", "b.pid")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert 2 <= max_count <= 6


def test_generator_is_seed_deterministic(spark, full_scale_tx):
    """Two independent evaluations of the same generator plan agree on
    the leaders bit-for-bit — md5 uniforms, no RNG state."""
    leader = (
        full_scale_tx.groupBy("user_id")
        .agg(exact_sum("total", "total_spent"))
        .orderBy(F.col("total_spent").desc(), "user_id")
        .limit(1)
        .collect()[0]
    )
    tx2 = gen_transactions(spark, N_TX, N_USERS, N_PRODUCTS)
    leader2 = (
        tx2.groupBy("user_id")
        .agg(exact_sum("total", "total_spent"))
        .orderBy(F.col("total_spent").desc(), "user_id")
        .limit(1)
        .collect()[0]
    )
    assert tuple(leader) == tuple(leader2)
