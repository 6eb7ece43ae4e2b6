"""Bloom semi-join: exactness against the plain left_semi join on
random key universes (hypothesis), the no-false-negative guarantee of
the prune stage alone, a measured false-positive rate against the
(1 - e^(-kn/m))^k theory, and NULL-key semi-join semantics."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.bloomjoin import (
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)


def test_bloom_pruned_revenue_matches_oracle(spark):
    """The r12-slated graded twin (queries/batch.py
    bloom_pruned_revenue): bit-exact against its plain `WHERE
    l_orderkey IN (...)` oracle at both scales — the registry bar,
    held here until its registration clears the rotation budget."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.batch import (
        BLOOM_PRUNED_REVENUE_SQL,
        bloom_pruned_revenue,
    )

    from .conftest import SF_CORRECT, SF_SMOKE
    from .parity import compare

    from big_data_analytics_final_project_spark.queries.batch import (
        _BLOOM_HV_CUTOFF,
    )

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        compare(
            bloom_pruned_revenue(spark, sf),
            con.sql(BLOOM_PRUNED_REVENUE_SQL),
        )
        # Non-vacuity of the p90 cutoff constant (r11 verdict #7): if
        # testdata generation ever shifts the o_totalprice
        # distribution, the build side must neither vanish (query
        # degenerates to empty) nor swallow ≈all orders (bloom prunes
        # nothing and the twin stops exercising the operator).
        n_total, n_build = con.sql(
            "SELECT count(*), "
            f"count(*) FILTER (o_totalprice > {_BLOOM_HV_CUTOFF}) "
            "FROM orders"
        ).fetchone()
        frac = n_build / n_total
        assert 0.01 <= frac <= 0.5, (
            f"_BLOOM_HV_CUTOFF selects {frac:.1%} of orders at {sf}; "
            "re-pin the constant to ~p90 of o_totalprice"
        )
        con.close()


def _frames(spark, fact_keys, build_keys):
    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(fact_keys)], "k: string, payload: int"
    ).repartition(8)
    build = spark.createDataFrame(
        [(k,) for k in build_keys], "k: string"
    ).repartition(4)
    return fact, build


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    fact_keys=st.lists(
        st.integers(min_value=0, max_value=200).map(str),
        min_size=0,
        max_size=120,
    ),
    build_keys=st.lists(
        st.integers(min_value=0, max_value=200).map(str),
        min_size=0,
        max_size=60,
    ),
    n_bits=st.sampled_from([64, 256, 4096]),
    n_hashes=st.sampled_from([1, 3, 5]),
)
def test_exactly_equals_plain_semi_join(
    spark, fact_keys, build_keys, n_bits, n_hashes
):
    """Row-identical to the un-accelerated semi-join at ANY geometry,
    including absurdly undersized filters (64 bits) where nearly every
    probe is a false positive — the residual join must absorb them."""
    fact, build = _frames(spark, fact_keys, build_keys)
    got = sorted(
        bloom_semi_join(
            fact, "k", build, n_bits=n_bits, n_hashes=n_hashes
        ).collect()
    )
    want = sorted(fact.join(build, "k", "left_semi").collect())
    assert got == want


def test_prune_has_no_false_negatives(spark):
    """Every fact row whose key IS in the build side survives the
    bloom stage (before the residual join)."""
    fact_keys = [f"k{i}" for i in range(500)] * 2
    build_keys = [f"k{i}" for i in range(0, 500, 7)]
    fact, build = _frames(spark, fact_keys, build_keys)
    bloom = bloom_build(build, "k", n_bits=1 << 12, n_hashes=5)
    survived = {
        r.k for r in bloom_prune(fact, "k", bloom, 1 << 12, 5).collect()
    }
    assert set(build_keys) <= survived


def test_false_positive_rate_near_theory(spark):
    """Probe with keys DISJOINT from the build side: the survivor
    fraction is the FPR; it must stay within ~3x of the textbook
    (1 - e^(-kn/m))^k (md5-derived positions are uniform enough)."""
    n, m, k = 1000, 1 << 14, 5
    build_keys = [f"b{i}" for i in range(n)]
    probe_keys = [f"p{i}" for i in range(4000)]
    fact, build = _frames(spark, probe_keys, build_keys)
    bloom = bloom_build(build, "k", n_bits=m, n_hashes=k)
    fp = bloom_prune(fact, "k", bloom, m, k).count()
    theory = (1.0 - math.exp(-k * n / m)) ** k
    measured = fp / 4000.0
    assert measured <= max(3.0 * theory, 0.005), (measured, theory)
    # and the filter is genuinely selective at this geometry
    assert measured < 0.05


def test_null_keys_follow_semi_join_semantics(spark):
    """NULL never equi-joins: NULL fact keys are dropped, NULL build
    keys set no bits, and the result still matches the plain semi-join
    (which drops them identically)."""
    fact = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3), (None, 4)], "k: string, payload: int"
    )
    build = spark.createDataFrame([("a",), (None,)], "k: string")
    got = sorted(bloom_semi_join(fact, "k", build, n_bits=256).collect())
    want = sorted(fact.join(build, "k", "left_semi").collect())
    assert got == want
    assert [r.k for r in got] == ["a"]


def test_string_vs_numeric_mix_refused(spark):
    """String-vs-numeric key mixes RAISE (r11 advice): the union
    lattice widens them to STRING, but ANSI IN comparison coerces the
    pair to DOUBLE — '7.0' vs bigint 7 would be a silent false
    negative. The caller casts explicitly; with the cast the operator
    behaves as before ('17' matches 17)."""
    import pytest

    fact = spark.createDataFrame(
        [("17", 1), ("18", 2), ("19", 3)], "k: string, payload: int"
    )
    build = spark.createDataFrame([(17,), (19,)], "id: bigint")
    with pytest.raises(TypeError, match="cast the keys"):
        bloom_semi_join(fact, "k", build, build_key_col="id", n_bits=256)
    got = sorted(
        r.k
        for r in bloom_semi_join(
            fact,
            "k",
            build.select(F.col("id").cast("string").alias("id")),
            build_key_col="id",
            n_bits=256,
        ).collect()
    )
    assert got == ["17", "19"]


def test_caller_bf_key_column_survives(spark):
    """A pre-existing `_bf_key` column on the fact frame is caller
    data, not ours to overwrite (r11 advice): the operator picks a
    fresh temp name and the column comes through untouched."""
    fact = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 30)], "k: string, _bf_key: int"
    )
    build = spark.createDataFrame([("a",), ("c",)], "k: string")
    out = bloom_semi_join(fact, "k", build, n_bits=256)
    assert out.columns == ["k", "_bf_key"]
    assert sorted((r.k, r._bf_key) for r in out.collect()) == [
        ("a", 10),
        ("c", 30),
    ]


def test_mismatched_renderings_no_false_negatives(spark):
    """Fact bigint vs build double: 7 and 7.0 equi-join after the
    implicit cast but RENDER differently ('7' vs '7.0'). The bloom must
    hash the build side through the fact key's type or it prunes true
    matches — the exact false-negative class the row-identity guarantee
    forbids. Pinned equal to the plain left_semi join."""
    fact = spark.createDataFrame(
        [(7, 1), (8, 2), (9, 3), (10, 4)], "k: bigint, payload: int"
    )
    build = spark.createDataFrame([(7.0,), (9.0,)], "id: double")
    got = sorted(
        r.k
        for r in bloom_semi_join(
            fact, "k", build, build_key_col="id", n_bits=256
        ).collect()
    )
    want = sorted(
        r.k
        for r in fact.join(
            build.select(F.col("id").cast("bigint").alias("k")), "k", "left_semi"
        ).collect()
    )
    assert got == want == [7, 9]


def test_fractional_build_keys_no_false_positives(spark):
    """The r10-advice case: fact bigint vs build double where a build
    key TRUNCATES onto a fact key (7.5 -> 7). ANSI compares both
    sides as double, so 7 must NOT match 7.5 — casting only the build
    side to bigint would admit it. 8.0 still matches 8 exactly."""
    fact = spark.createDataFrame(
        [(7, 1), (8, 2), (9, 3)], "k: bigint, payload: int"
    )
    build = spark.createDataFrame([(7.5,), (8.0,)], "id: double")
    got = sorted(
        r.k
        for r in bloom_semi_join(
            fact, "k", build, build_key_col="id", n_bits=256
        ).collect()
    )
    want = sorted(
        r.k
        for r in fact.join(
            build, fact["k"] == build["id"], "left_semi"
        ).collect()
    )
    assert got == want == [8]


def test_decimal_padding_no_false_negatives(spark):
    """Decimal(10,2) build keys render '7.00'; fact bigint renders '7'.
    Same guarantee as the double case — row-identical to left_semi."""
    fact = spark.createDataFrame(
        [(7, 1), (8, 2), (9, 3)], "k: bigint, payload: int"
    )
    build = spark.createDataFrame([("7.00",), ("8.00",)], "id: string").select(
        F.col("id").cast("decimal(10,2)").alias("id")
    )
    got = sorted(
        r.k
        for r in bloom_semi_join(
            fact, "k", build, build_key_col="id", n_bits=256
        ).collect()
    )
    assert got == [7, 8]


def test_plan_is_jvm_only_with_broadcast_words(spark):
    """No Python eval anywhere; the word map reaches the probe side as
    a broadcast (the scalar-frame pattern), not a shuffled join."""
    fact_keys = [f"k{i}" for i in range(200)]
    build_keys = [f"k{i}" for i in range(0, 200, 5)]
    fact, build = _frames(spark, fact_keys, build_keys)
    plan = bloom_semi_join(fact, "k", build)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
