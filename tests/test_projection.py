"""Random projection (embedding_random_projection): the JL property —
projected pairwise distances must track original distances. Exact
values are oracle-checked; this pins that the projection is actually
distance-preserving, not just deterministic."""

from __future__ import annotations

import math

from big_data_analytics_final_project_spark.queries.similarity import (
    embedding_random_projection,
)
from big_data_analytics_final_project_spark.sources import load_table

from .conftest import SF_SMOKE


def test_projection_preserves_distance_ordering(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    orig = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.limit(40).collect()
    }
    proj = {
        r["vec_id"]: [r[f"p{j}"] for j in range(16)]
        for r in embedding_random_projection(spark, SF_SMOKE).collect()
        if r["vec_id"] in orig
    }

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ids = sorted(orig)
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    d_o = [dist(orig[a], orig[b]) for a, b in pairs]
    d_p = [dist(proj[a], proj[b]) for a, b in pairs]
    # Pearson correlation between original and projected distances:
    # 16 of 64 dims: JL demands a clearly positive relationship
    n = len(pairs)
    mo, mp = sum(d_o) / n, sum(d_p) / n
    cov = sum((x - mo) * (y - mp) for x, y in zip(d_o, d_p))
    vo = math.sqrt(sum((x - mo) ** 2 for x in d_o))
    vp = math.sqrt(sum((y - mp) ** 2 for y in d_p))
    corr = cov / (vo * vp)
    assert corr > 0.3, corr
