"""Distributed data generator tests (generator.py — the reference's S1
surface as a Spark plan).

The two generator queries in queries/generated.py already prove
value-exactness against DuckDB; these pin the properties that make the
generator usable at scale: partitioning-independence (determinism
without RNG state), schema fidelity to FIXTURES.md, referential
integrity, the integer-cents money chain, and zero shuffles in the
physical plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_analytics_final_project_spark.generator import (
    gen_categories,
    gen_products,
    gen_sessions,
    gen_transactions,
    gen_users,
)
from big_data_analytics_final_project_spark.plans import count_shuffles


def test_partitioning_independence(spark):
    """Same rows whatever the partition count — no RNG state to drift
    across tasks or retries (the distributed analog of seed=42)."""
    a = sorted(map(tuple, gen_transactions(spark, 200, 50, 40).collect()))
    b = sorted(
        map(tuple, gen_transactions(spark, 200, 50, 40).repartition(7).collect())
    )
    assert a == b


def test_generators_are_shuffle_free(spark):
    """spark.range → projections only: generating 100 TB is the same
    plan as 100 MB."""
    for df in (
        gen_categories(spark, 10),
        gen_products(spark, 50, 10),
        gen_users(spark, 50),
        gen_transactions(spark, 50, 20, 30),
        gen_sessions(spark, 50, 20, 30),
    ):
        assert count_shuffles(df) == 0


def test_transaction_schema_and_money_chain(spark):
    """FIXTURES.md transaction shape: items array<struct>, nullable
    session_id, and total == subtotal − discount with every value an
    exact multiple of 0.01."""
    t = gen_transactions(spark, 300, 50, 40)
    items_type = t.schema["items"].dataType
    assert isinstance(items_type, T.ArrayType)
    assert [f.name for f in items_type.elementType.fields] == [
        "product_id", "quantity", "unit_price", "subtotal",
    ]
    assert t.schema["session_id"].nullable
    chk = t.select(
        F.min(F.col("session_id").isNull().cast("int")).alias("all_sess"),
        F.max(F.col("session_id").isNull().cast("int")).alias("some_null"),
        F.max(
            F.abs(
                F.col("total") - (F.col("subtotal") - F.col("discount"))
            )
        ).alias("chain_err"),
        F.max(
            F.abs(
                F.col("subtotal") * 100 - F.round(F.col("subtotal") * 100)
            )
        ).alias("cents_err"),
        F.max(
            F.abs(
                F.col("subtotal")
                - F.aggregate(
                    "items",
                    F.lit(0.0),
                    lambda acc, it: acc + it["subtotal"],
                )
            )
        ).alias("item_sum_err"),
    ).collect()[0]
    assert chk["some_null"] == 1 and chk["all_sess"] == 0  # nullable, not all
    assert chk["chain_err"] < 1e-9
    assert chk["cents_err"] < 1e-6
    assert chk["item_sum_err"] < 1e-6  # float assoc error only


def test_referential_integrity(spark):
    """Every FK lands: transactions→users/products, products→categories."""
    users = gen_users(spark, 50)
    products = gen_products(spark, 40, 10)
    cats = gen_categories(spark, 10)
    t = gen_transactions(spark, 300, 50, 40)
    titems = t.select(F.explode("items.product_id").alias("product_id"))
    assert t.join(users, "user_id", "left_anti").count() == 0
    assert titems.join(products, "product_id", "left_anti").count() == 0
    assert products.join(cats, "category_id", "left_anti").count() == 0


def test_generate_all_roundtrip(spark, tmp_path):
    """generate_all lands all five tables as readable parquet with the
    scaled cardinalities."""
    from big_data_analytics_final_project_spark.generator import generate_all

    out = str(tmp_path / "zones")
    counts = generate_all(spark, out, scale=0.002)
    assert counts["categories"] == 25  # dim stays fixed
    assert counts["transactions"] == 200
    for table, n in counts.items():
        assert spark.read.parquet(f"{out}/{table}.parquet").count() == n


def test_session_shape(spark):
    """FIXTURES.md session shape: map cart with distinct keys,
    time-sorted page_views, viewed_products ⊆ page_views' products,
    conversion 'browsed' iff the cart is empty."""
    s = gen_sessions(spark, 300, 50, 40)
    assert isinstance(s.schema["cart_contents"].dataType, T.MapType)
    chk = s.select(
        F.max(
            (F.size("page_views") > 1)
            & ~F.expr(
                "array_sort(transform(page_views, p -> p.timestamp))"
                " = transform(page_views, p -> p.timestamp)"
            ).cast("boolean")
        ).alias("unsorted"),
        F.max(
            F.size(
                F.array_except(
                    "viewed_products",
                    F.expr("transform(page_views, p -> p.product_id)"),
                )
            )
        ).alias("viewed_not_in_pv"),
        F.max(
            (F.size("cart_contents") == 0)
            != (F.col("conversion_status") == "browsed")
        ).alias("conv_mismatch"),
        F.max(
            F.col("duration_seconds")
            - (
                F.unix_timestamp(
                    "end_time", "yyyy-MM-dd'T'HH:mm:ss"
                )
                - F.unix_timestamp("start_time", "yyyy-MM-dd'T'HH:mm:ss")
            )
        ).alias("dur_err"),
    ).collect()[0]
    assert not chk["unsorted"]
    assert chk["viewed_not_in_pv"] == 0
    assert not chk["conv_mismatch"]
    assert chk["dur_err"] == 0
