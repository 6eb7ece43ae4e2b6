"""Distributed PCA: exact-moment agreement with numpy, eigen-invariant
acceptance (captured variance == numpy PCA's, orthonormal components,
whitened covariance ≈ I), partition-layout stability of the merged
moments, and the real-embeddings smoke on the sf0.001 zone."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.pca import (
    embedding_moments,
    pca_fit,
    pca_project,
)

D = 8
SEEDED = np.random.RandomState(7)
# anisotropic cloud: two dominant directions, the rest near-noise
_BASIS = np.linalg.qr(SEEDED.randn(D, D))[0]
_SCALES = np.array([10.0, 5.0, 1.0, 0.5, 0.3, 0.2, 0.1, 0.05])
_X = (SEEDED.randn(400, D) * _SCALES) @ _BASIS.T + SEEDED.randn(D)


def _df(spark, X, n_partitions=8):
    rows = [([float(x) for x in row],) for row in X]
    return spark.createDataFrame(
        rows, "embedding: array<double>"
    ).repartition(n_partitions)


def _moments_dict(df):
    out = {}
    for r in embedding_moments(df, "embedding", D).collect():
        out[(r.kind, r.idx)] = r.val
    return out


def test_moments_match_numpy(spark):
    got = _moments_dict(_df(spark, _X))
    assert got[("n", 0)] == 400.0
    s = _X.sum(axis=0)
    g = (_X.T @ _X).ravel()
    for i in range(D):
        assert got[("sum", i)] == pytest.approx(s[i], rel=1e-9)
    for i in range(D * D):
        assert got[("xtx", i)] == pytest.approx(g[i], rel=1e-9)


def test_moments_partition_layout_stable(spark):
    """The decimal merge makes the cross-partition reduction exact:
    1-partition and 16-partition runs agree to the last float64 ulp or
    better on every moment (within-partition float64 accumulation is
    the only remaining source, bounded tiny at this n)."""
    a = _moments_dict(_df(spark, _X, n_partitions=1))
    b = _moments_dict(_df(spark, _X, n_partitions=16))
    for k, v in a.items():
        assert b[k] == pytest.approx(v, rel=1e-12), k


def test_fit_matches_numpy_invariants(spark):
    model = pca_fit(_df(spark, _X), "embedding", D, p=3)
    cov = np.cov(_X, rowvar=False)
    ref_eigs = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    assert np.allclose(model.eigvals, ref_eigs, rtol=1e-6)
    W = np.array(model.components)
    assert np.allclose(W @ W.T, np.eye(3), atol=1e-9)  # orthonormal
    # the top component spans the injected dominant direction
    # (sign-agnostic): |cos| ~ 1
    top = _BASIS[:, 0]
    assert abs(np.dot(W[0], top)) > 0.99


def test_projection_variances_and_whitening(spark):
    df = _df(spark, _X)
    model = pca_fit(df, "embedding", D, p=3)
    plain = pca_project(df, "embedding", model)
    P = np.array(
        [[r[f"pc{j}"] for j in range(3)] for r in plain.collect()]
    )
    # per-axis variance == the eigenvalues; axes uncorrelated
    cov_p = np.cov(P, rowvar=False)
    assert np.allclose(np.diag(cov_p), model.eigvals, rtol=1e-6)
    assert np.allclose(
        cov_p - np.diag(np.diag(cov_p)), 0, atol=1e-6 * max(model.eigvals)
    )
    white = pca_project(df, "embedding", model, whiten=True)
    Wn = np.array(
        [[r[f"pc{j}"] for j in range(3)] for r in white.collect()]
    )
    assert np.allclose(np.cov(Wn, rowvar=False), np.eye(3), atol=1e-2)


def test_nulls_and_degenerate(spark):
    rows = [([1.0] * D,), (None,), ([2.0] * D,)]
    df = spark.createDataFrame(rows, "embedding: array<double>")
    got = _moments_dict(df)
    assert got[("n", 0)] == 2.0
    with pytest.raises(ValueError):
        pca_fit(
            spark.createDataFrame(
                [([1.0] * D,)], "embedding: array<double>"
            ),
            "embedding",
            D,
            p=2,
        )


def test_real_embeddings_whiten_smoke(spark):
    """End-to-end on the testdata embeddings table (d=64): whitened
    top-4 axes have ~unit variance and the plan stays shuffle-free on
    the projection side."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    model = pca_fit(emb, "embedding", 64, p=4)
    proj = pca_project(emb, "embedding", model, whiten=True)
    P = np.array([[r[f"pc{j}"] for j in range(4)] for r in proj.collect()])
    v = P.var(axis=0, ddof=1)
    assert np.allclose(v, 1.0, atol=0.05), v
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only projection
    assert "BatchEvalPython" not in plan


def test_whitened_projection_composes_with_ivf(spark):
    """The pipeline a 100 TB ANN deployment actually runs: fit PCA on
    the corpus, whiten-project to p=8 map-only, index the REDUCED
    vectors with IVF. Recall is measured against brute-force kNN in
    the same projected space (the index's own metric): floors mirror
    tests/test_ann_recall.py and the n_probe knob must still buy
    recall after the projection."""
    from big_data_analytics_final_project_spark.operators.pca import (
        pca_project_array,
    )
    from big_data_analytics_final_project_spark.operators.similarity import (
        ann_ivf,
        knn_bruteforce,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    model = pca_fit(emb, "embedding", 64, p=8)
    proj = pca_project_array(
        emb, "embedding", model, whiten=True, out_col="proj"
    ).select("vec_id", "proj")
    n_queries, k = 20, 3
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(
            proj, lambda c: c < n_queries, k=k, vec_col="proj"
        ).collect()
    }

    def recall(n_probe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_ivf(
                proj,
                lambda c: c < n_queries,
                k=k,
                n_probe=n_probe,
                vec_col="proj",
            ).collect()
        }
        return len(truth & got) / len(truth)

    r2, r8 = recall(2), recall(8)
    assert r2 >= 0.25, f"IVF-on-whitened n_probe=2 recall collapsed: {r2:.2f}"
    assert r8 >= r2, f"recall not monotonic in n_probe: {r2:.2f} -> {r8:.2f}"
    assert r8 >= 0.6, f"IVF-on-whitened n_probe=8 recall too low: {r8:.2f}"
