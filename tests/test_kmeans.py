"""K-means trainer (operators/kmeans.py): determinism, shape, and the
Lloyd's-improvement property on the embeddings zone. Cross-engine value
equality is covered by the `embedding_kmeans` oracle; these pin the
operator-level contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.kmeans import (
    kmeans_assign,
)
from big_data_analytics_final_project_spark.sources import load_table

from .conftest import SF_SMOKE


def test_kmeans_shape_and_determinism(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = kmeans_assign(emb, n_clusters=8, n_iters=2)
    rows = out.collect()
    assert len(rows) == emb.count()  # every vector assigned
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(8)) and len(clusters) > 1
    assert all(-1.0 <= r["cosine_sim"] <= 1.0 for r in rows)
    # bit-identical on re-run: md5 init + quantized means, no RNG
    assert rows == kmeans_assign(emb, n_clusters=8, n_iters=2).collect()


def test_kmeans_training_improves_assignment(spark):
    """Trained centroids must fit the corpus at least as well as the
    raw md5-seeded init (n_iters=0 skips every update round)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")

    def mean_sim(n_iters):
        return (
            kmeans_assign(emb, n_clusters=8, n_iters=n_iters)
            .agg(F.avg("cosine_sim").alias("m"))
            .collect()[0]["m"]
        )

    assert mean_sim(3) >= mean_sim(0) - 1e-12
