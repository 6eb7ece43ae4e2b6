"""KMV bottom-k sketch: bit-exact agreement with a pure-Python md5
reference (sketch rows, estimates — the future oracle), exactness
below k, lossless merge, accuracy bounds on cardinality and Jaccard,
partitioning independence, and NULL exclusion."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.kmv import (
    HASH_DOMAIN,
    kmv_distinct_estimate,
    kmv_merge,
    kmv_overlap,
    kmv_overlap_matrix,
    kmv_sketch,
    kmv_sketch_by,
)


def _h(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


def _ref_sketch(keys, k):
    return sorted({_h(x) for x in keys if x is not None})[:k]


def _ref_estimate(sketch, k):
    n = len(sketch)
    if n < k:
        return float(n)
    return (n - 1) / (sketch[-1] / HASH_DOMAIN)


def _df(spark, keys, n_partitions=8):
    return spark.createDataFrame(
        [(x,) for x in keys], "key: string"
    ).repartition(n_partitions)


def test_exact_below_k(spark):
    keys = [f"k{i}" for i in range(100)] * 3
    sk = kmv_sketch(_df(spark, keys), "key", k=256)
    got = [r.h for r in sk.collect()]
    assert got == _ref_sketch(keys, 256)
    est = kmv_distinct_estimate(sk, 256).collect()[0]
    assert est.n_sketch == 100 and est.distinct_est == 100.0


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=5000).map(lambda i: f"u{i}"),
        min_size=1,
        max_size=300,
    ),
    k=st.sampled_from([4, 16, 64]),
)
def test_matches_pure_python_reference_exactly(spark, keys, k):
    """Sketch rows AND the estimate are bit-identical to the reference
    — the determinism a DuckDB oracle would grade."""
    sk = kmv_sketch(_df(spark, keys), "key", k=k)
    rows = [r.h for r in sk.orderBy("h").collect()]
    ref = _ref_sketch(keys, k)
    assert rows == ref
    est = kmv_distinct_estimate(sk, k).collect()[0].distinct_est
    assert est == _ref_estimate(ref, k)


def test_merge_is_lossless(spark):
    """bottom-k(KMV(A) ∪ KMV(B)) row-identical to KMV(A ∪ B)."""
    a_keys = [f"a{i}" for i in range(800)]
    b_keys = [f"a{i}" for i in range(400, 1200)]  # 50% overlap
    k = 128
    sk_a = kmv_sketch(_df(spark, a_keys), "key", k=k)
    sk_b = kmv_sketch(_df(spark, b_keys), "key", k=k)
    merged = sorted(r.h for r in kmv_merge(sk_a, sk_b, k).collect())
    direct = sorted(
        r.h for r in kmv_sketch(_df(spark, a_keys + b_keys), "key", k=k).collect()
    )
    assert merged == direct


def test_cardinality_accuracy(spark):
    """20k distinct keys, k=512: relative error within 4/sqrt(k)."""
    n, k = 20000, 512
    keys = [f"key_{i}" for i in range(n)]
    sk = kmv_sketch(_df(spark, keys, n_partitions=16), "key", k=k)
    est = kmv_distinct_estimate(sk, k).collect()[0].distinct_est
    assert abs(est - n) / n <= 4 / math.sqrt(k), est


def test_overlap_estimates(spark):
    """|A|=|B|=6000 with 3000 shared: J=1/3, union=9000,
    intersection=3000 — each within the ~1/sqrt(k) band."""
    k = 512
    a_keys = [f"x{i}" for i in range(6000)]
    b_keys = [f"x{i}" for i in range(3000, 9000)]
    sk_a = kmv_sketch(_df(spark, a_keys), "key", k=k)
    sk_b = kmv_sketch(_df(spark, b_keys), "key", k=k)
    r = kmv_overlap(sk_a, sk_b, k).collect()[0]
    assert abs(r.jaccard_est - 1 / 3) <= 4 / math.sqrt(k)
    assert abs(r.union_est - 9000) / 9000 <= 4 / math.sqrt(k)
    assert abs(r.intersection_est - 3000) / 3000 <= 0.25
    # disjoint sets: Jaccard exactly 0, intersection exactly 0
    sk_c = kmv_sketch(_df(spark, [f"z{i}" for i in range(500)]), "key", k=k)
    d = kmv_overlap(sk_a, sk_c, k).collect()[0]
    assert d.jaccard_est == 0.0 and d.intersection_est == 0.0


def test_partitioning_independent(spark):
    keys = [f"p{i % 700}" for i in range(5000)]
    one = [r.h for r in kmv_sketch(_df(spark, keys, 1), "key", k=64).collect()]
    many = [
        r.h for r in kmv_sketch(_df(spark, keys, 16), "key", k=64).collect()
    ]
    assert sorted(one) == sorted(many)


def test_nulls_excluded(spark):
    keys = ["a", None, "b", None]
    sk = kmv_sketch(_df(spark, keys), "key", k=8)
    assert sorted(r.h for r in sk.collect()) == _ref_sketch(["a", "b"], 8)


def test_groupwise_sketch_matches_per_group_reference(spark):
    data = [("web", f"d{i}") for i in range(600)] + [
        ("books", f"d{i}") for i in range(300, 700)
    ] + [("code", f"c{i}") for i in range(200)]
    df = spark.createDataFrame(
        data, "source: string, doc: string"
    ).repartition(8)
    k = 64
    sk = kmv_sketch_by(df, "source", "doc", k=k)
    got = {}
    for r in sk.collect():
        got.setdefault(r.source, []).append(r.h)
    for src in ("web", "books", "code"):
        keys = [d for s, d in data if s == src]
        assert sorted(got[src]) == _ref_sketch(keys, k), src


def test_overlap_matrix_consistent_and_accurate(spark):
    """The matrix row for (a, b) equals the standalone kmv_overlap of
    those two groups' sketches bit-for-bit, and known ground-truth
    overlaps land inside the acceptance band."""
    k = 256
    data = (
        [("web", f"d{i}") for i in range(4000)]
        + [("books", f"d{i}") for i in range(2000, 6000)]  # J=1/3 w/ web
        + [("code", f"c{i}") for i in range(1000)]  # disjoint
    )
    df = spark.createDataFrame(
        data, "source: string, doc: string"
    ).repartition(8)
    sk = kmv_sketch_by(df, "source", "doc", k=k).cache()
    mat = {
        (r.group_a, r.group_b): r
        for r in kmv_overlap_matrix(sk, "source", k).collect()
    }
    assert set(mat) == {("books", "web"), ("books", "code"), ("code", "web")}
    import math

    wb = mat[("books", "web")]
    assert abs(wb.jaccard_est - 1 / 3) <= 4 / math.sqrt(k)
    assert abs(wb.union_est - 6000) / 6000 <= 4 / math.sqrt(k)
    for pair in (("books", "code"), ("code", "web")):
        assert mat[pair].jaccard_est == 0.0
        assert mat[pair].intersection_est == 0.0
    # bit-exact consistency with the two-sketch estimator
    a = sk.filter(F.col("source") == "web").select("h")
    b = sk.filter(F.col("source") == "books").select("h")
    solo = kmv_overlap(b, a, k).collect()[0]
    assert solo.jaccard_est == wb.jaccard_est
    assert solo.union_est == wb.union_est
    assert solo.intersection_est == wb.intersection_est
    sk.unpersist()


def test_corpus_overlap_kmv_matches_oracle(spark):
    """The r14-queued graded surface at the registry bar: bit-exact
    at both scales, plus the non-degeneracy pin — all 20-source pairs
    present with strictly positive shingle overlap (a testdata regen
    that collapses cross-source content fails loudly here instead of
    silently grading an all-zero matrix)."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.text import (
        CORPUS_OVERLAP_KMV_SQL,
        corpus_overlap_kmv,
    )

    from .conftest import SF_CORRECT, SF_SMOKE
    from .parity import compare

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        res = corpus_overlap_kmv(spark, sf)
        compare(res, con.sql(CORPUS_OVERLAP_KMV_SQL))
        con.close()
        rows = res.collect()
        assert len(rows) == 190  # C(20, 2) source pairs
        assert all(r.jaccard_est > 0 for r in rows), sf
        assert all(0 < r.intersection_est <= r.union_est for r in rows)


def test_overlap_matrix_scans_corpus_once(spark):
    """The matrix references the sketch subtree three times (group
    list, left flag, right flag); the scan-once contract at 100 TB
    rests on AQE exchange reuse collapsing them onto ONE corpus scan
    + Arrow fold. Pin it: the final adaptive plan must contain exactly
    one FileScan/MapInPandas and reuse the sketch exchange for every
    other reference — an operator change that breaks exchange
    canonicalization (e.g. a non-deterministic expression sneaking
    into the fold projection) fails here, not in a 3x scan at scale."""
    import re

    from .conftest import SF_SMOKE, require_classic

    from big_data_analytics_final_project_spark.queries.text import (
        corpus_overlap_kmv,
    )

    require_classic(spark)
    df = corpus_overlap_kmv(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Scan parquet", final)) == 1, final
    assert len(re.findall(r"MapInPandas", final)) == 1, final
    assert len(re.findall(r"ReusedExchange", final)) >= 3, final


def test_corpus_overlap_kmv_accuracy_vs_exact(spark):
    """Estimator QUALITY pin (the determinism side is the bit-exact
    oracle): every pair's jaccard_est must sit within the 4-sigma
    binomial band of the EXACT shingle jaccard — sigma =
    sqrt(J(1-J)/K) for the bottom-K union sample, K = 256. Measured
    max abs error at sf0.001 is 0.029 against a 4-sigma bound of
    ~0.061; a break here means the estimator (not the hashing) went
    wrong, or a testdata regen collapsed the overlap structure."""
    import duckdb

    from big_data_analytics_final_project_spark.functions.text import (
        shingles3_from_tokens_sql,
        tokens_sql,
    )
    from big_data_analytics_final_project_spark.queries.text import (
        _KMV_K,
        corpus_overlap_kmv,
    )

    from .conftest import SF_SMOKE

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    sh_cte = f"""
    WITH tok AS (
      SELECT source, {tokens_sql("text")} AS toks
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ), sh AS (
      SELECT DISTINCT source,
             unnest({shingles3_from_tokens_sql("toks")}) AS shingle
      FROM tok
    )"""
    sizes = dict(
        con.sql(sh_cte + "SELECT source, count(*) FROM sh GROUP BY 1").fetchall()
    )
    inter = {
        (a, b): c
        for a, b, c in con.sql(
            sh_cte
            + """
            SELECT x.source, y.source, count(*) FROM sh x
            JOIN sh y ON x.shingle = y.shingle AND x.source < y.source
            GROUP BY 1, 2"""
        ).fetchall()
    }
    con.close()

    import math

    rows = corpus_overlap_kmv(spark, SF_SMOKE).collect()
    assert len(rows) == 190
    for r in rows:
        ci = inter.get((r.group_a, r.group_b), 0)
        true_j = ci / (sizes[r.group_a] + sizes[r.group_b] - ci)
        sigma = math.sqrt(max(true_j * (1 - true_j), 1.0 / _KMV_K) / _KMV_K)
        assert abs(r.jaccard_est - true_j) <= 4 * sigma, (
            r.group_a, r.group_b, true_j, r.jaccard_est, sigma,
        )
