"""Distributed PCA / whitening for embedding columns — the dense
preprocessing stage between raw embeddings and the ANN/quantization
operators (IVF cells and scalar quantization both behave measurably
better on decorrelated axes; whitening is the standard step before
both in FAISS-style pipelines).

Shape (the MLlib RowMatrix.computeGramianMatrix pattern, re-expressed
Arrow-side): ONE pass computes per-partition moment partials — row
count, Σx (d), and the Gramian ΣxxT (d×d) via a vectorized numpy
``X.T @ X`` per Arrow batch — so the shuffle carries one
(1 + d + d²)-value row per partition instead of any vectors. Partials
merge by element-wise addition through an exact DECIMAL(38,12)
accumulator (cross-partition merge order can't perturb the result —
the functions/numeric.py discipline; residual sensitivity is only the
float64 accumulation WITHIN a partition, documented). The d×d
eigendecomposition runs driver-side on a collected d²-value aggregate
— bounded like the k×d k-means collect (plans/lint.py COLLECT_ALLOW)
— and projection/whitening is a map-only fold against literal weights
(the `embedding_random_projection` idiom), no shuffle, no Python.

Why not a single wide expression aggregate: d=64 needs 2 144 decimal
sum expressions — the profiler rework (operators/profile.py) measured
exactly this wide-aggregate failure mode (22s of analysis/codegen for
far fewer columns). The Arrow fold keeps the plan two nodes tall.

Grading posture: acceptance, not hash — orthonormality, captured
variance vs a numpy reference, and whitened-covariance ≈ I are the
invariants (eigenvector SIGN is arbitrary; a value-hash oracle would
be lying about what PCA promises).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEC = "decimal(38,12)"


def _moments_schema(d: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("xtx", T.ArrayType(T.DoubleType())),
        ]
    )


def _moments_fold(vec_col: str, d: int):
    def fold(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d, dtype=np.float64)
        xtx = np.zeros((d, d), dtype=np.float64)
        for pdf in it:
            col = pdf[vec_col].dropna()
            if not len(col):
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in col]
            )
            n += X.shape[0]
            s += X.sum(axis=0)
            xtx += X.T @ X
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "xtx": [xtx.ravel().tolist()]}
        )

    return fold


def embedding_moments(df: DataFrame, vec_col: str, d: int) -> DataFrame:
    """First+second moment partials merged exactly: returns a relation
    ``(kind, idx, val)`` with kind='n' (1 row), 'sum' (d rows),
    'xtx' (d² rows, row-major) — partition-merge-order independent via
    the decimal accumulator; small enough to persist as the reusable
    statistics of a corpus snapshot."""
    partials = df.select(vec_col).mapInPandas(
        _moments_fold(vec_col, d), schema=_moments_schema(d)
    )
    n = partials.select(
        F.lit("n").alias("kind"),
        F.lit(0).alias("idx"),
        F.sum("n").cast("double").alias("val"),
    )
    sums = (
        partials.select(F.posexplode("s").alias("idx", "_v"))
        .groupBy("idx")
        .agg(
            F.sum(F.col("_v").cast(_DEC)).cast("double").alias("val")
        )
        .select(F.lit("sum").alias("kind"), "idx", "val")
    )
    gram = (
        partials.select(F.posexplode("xtx").alias("idx", "_v"))
        .groupBy("idx")
        .agg(
            F.sum(F.col("_v").cast(_DEC)).cast("double").alias("val")
        )
        .select(F.lit("xtx").alias("kind"), "idx", "val")
    )
    return n.unionByName(sums).unionByName(gram)


@dataclass(frozen=True)
class PcaModel:
    n: int
    d: int
    mean: list[float]
    eigvals: list[float]  # descending, length p
    components: list[list[float]]  # p rows of d weights


def pca_fit(
    df: DataFrame, vec_col: str, d: int, p: int, eps: float = 1e-9
) -> PcaModel:
    """Fit top-`p` principal components of the `vec_col` embeddings.

    One distributed pass (embedding_moments) + a driver-side `eigh` of
    the d×d covariance. The collect is 1 + d + d² aggregate values —
    model-sized, never data-sized (COLLECT_ALLOW-reasoned).
    """
    rows = embedding_moments(df, vec_col, d).collect()
    n = int(next(r.val for r in rows if r.kind == "n"))
    if n < 2:
        raise ValueError(f"need >=2 vectors to fit PCA, got {n}")
    s = np.zeros(d)
    g = np.zeros(d * d)
    for r in rows:
        if r.kind == "sum":
            s[r.idx] = r.val
        elif r.kind == "xtx":
            g[r.idx] = r.val
    mean = s / n
    cov = (g.reshape(d, d) - n * np.outer(mean, mean)) / (n - 1)
    # numerical symmetry guard before eigh
    cov = (cov + cov.T) / 2.0
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:p]
    eigvals = np.maximum(w[order], eps)
    comps = v[:, order].T  # p x d
    return PcaModel(
        n=n,
        d=d,
        mean=mean.tolist(),
        eigvals=eigvals.tolist(),
        components=comps.tolist(),
    )


def pca_project(
    df: DataFrame,
    vec_col: str,
    model: PcaModel,
    whiten: bool = False,
    out_prefix: str = "pc",
) -> DataFrame:
    """Map-only projection onto the fitted components: adds columns
    ``{out_prefix}0..{p-1}``. With ``whiten=True`` each component is
    scaled by 1/sqrt(eigval) so the output covariance is ~I — the
    input the quantizer/IVF stages prefer. No shuffle; literal-weight
    folds exactly like `embedding_random_projection`."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    centered = F.zip_with(
        v,
        F.array(*[F.lit(float(m)) for m in model.mean]),
        lambda x, m: x - m,
    )
    out = df.withColumn("_pca_c", centered)
    projs = []
    for j, row in enumerate(model.components):
        scale = (
            1.0 / float(np.sqrt(model.eigvals[j])) if whiten else 1.0
        )
        projs.append(
            F.aggregate(
                F.zip_with(
                    F.col("_pca_c"),
                    F.array(*[F.lit(float(w) * scale) for w in row]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"{out_prefix}{j}")
        )
    return out.select(*df.columns, *projs).drop("_pca_c")


def pca_project_array(
    df: DataFrame,
    vec_col: str,
    model: PcaModel,
    whiten: bool = False,
    out_col: str = "proj",
) -> DataFrame:
    """`pca_project` with the p scalar outputs packed into ONE
    array<double> column — the shape the downstream ANN operators
    (operators/similarity.py ann_ivf / ann_hyperplane_lsh /
    knn_bruteforce) take, so PCA/whitening composes as a drop-in
    preprocessing stage: fit once, project map-only, hand the reduced
    corpus to the index. Same shuffle-free literal-weight folds."""
    projected = pca_project(
        df, vec_col, model, whiten=whiten, out_prefix="_pcatmp"
    )
    p = len(model.components)
    return projected.withColumn(
        out_col, F.array(*[F.col(f"_pcatmp{j}") for j in range(p)])
    ).drop(*[f"_pcatmp{j}" for j in range(p)])
