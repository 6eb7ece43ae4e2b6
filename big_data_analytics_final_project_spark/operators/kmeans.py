"""K-means clustering over an embedding column — the codebook TRAINER
the IVF index calls "an offline concern" (operators/similarity.py
`ann_ivf` docstring), plus the curation op itself: clustering
embeddings is how a training-data pipeline buckets a corpus for
semantic dedup, domain balancing, and stratified mixture weights.

Spark-first Lloyd's iterations, fully deterministic and therefore
ORACLE-CHECKABLE — rare for an iterative ML op:

- init: the first `n_clusters` vectors in md5(id) order (the same
  deterministic seeding the IVF codebook uses);
- assignment: argmax cosine against the CURRENT centroids shipped as
  a literal array — a pure map-side projection, no shuffle, no join;
  ties break to the smallest cluster id via max(struct(sim, -cid));
- update: per-(cluster, dimension) mean via posexplode + exact
  integer sums: each component is first quantized IN DOUBLE
  ARITHMETIC (floor(x·1e9 + 0.5) — the same bits on every engine),
  then summed as exact decimals. Casting doubles straight to DECIMAL
  would NOT be portable: Spark rounds ties HALF_UP, DuckDB HALF_EVEN,
  and one tied component in a 500-vector corpus was enough to skew a
  centroid (found by the oracle). k×d doubles come back to the driver
  per iteration (MLlib's collect-and-broadcast loop shape — at 100 TB
  that is kilobytes per round while the data passes stay map-only +
  one (cluster, dim) partial-aggregated shuffle);
- empty clusters deterministically carry their previous centroid.

The DuckDB twin (`kmeans_assign_sql`) unrolls the same iterations as
chained CTEs — cross join + row_number for assignment, unnest +
generate_subscripts + the same quantized sums for the update — and
must hash-match the Spark result exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COS_SQL_GUARD = (
    "CASE WHEN {na} > 0 AND {nb} > 0 "
    "THEN {dot} / (sqrt({na}) * sqrt({nb})) ELSE 0.0 END"
)


def _dlit(x: float) -> str:
    """Exact double literal for SQL text: repr round-trips the bits
    and the D suffix keeps the parser from reading a DECIMAL."""
    return repr(float(x)) + "D"


# The HOF cosine fold as SQL text — the exact expression the column-
# API form (`_cos_c`) produces, spelled once so `_assign` can ship the
# whole scored array as a SINGLE parsed expression instead of ~k·d
# py4j `F.lit` round trips (r17: the nested-lit build cost ~0.5s of
# pure driver/py4j time PER assignment at k=8, d=64 — more than the
# job itself). Execution is unchanged: same interpreted HOF fold,
# same IEEE add order, bit-identical assignments. (An unrolled
# literal multiply-add chain was measured too: its generated code is
# too large to JIT and ran ~6x slower — the fold stays.)
_COS_SQL = (
    "CASE WHEN aggregate(transform({a}, x -> x * x), 0.0D,"
    " (acc, v) -> acc + v) > 0.0D"
    " AND aggregate(transform({b}, x -> x * x), 0.0D,"
    " (acc, v) -> acc + v) > 0.0D"
    " THEN aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D,"
    " (acc, v) -> acc + v)"
    " / (sqrt(aggregate(transform({a}, x -> x * x), 0.0D,"
    " (acc, v) -> acc + v))"
    " * sqrt(aggregate(transform({b}, x -> x * x), 0.0D,"
    " (acc, v) -> acc + v)))"
    " ELSE 0.0D END"
)


def _assign(base: DataFrame, centroids: list[tuple[int, list[float]]]):
    """Map-only argmax-cosine assignment against literal centroids,
    built as one SQL expression parse (see `_COS_SQL`)."""
    cents = ", ".join(
        "named_struct('cid', {cid}, 'cv', array({cv}))".format(
            cid=int(cid), cv=", ".join(_dlit(x) for x in vec)
        )
        for cid, vec in centroids
    )
    cos = _COS_SQL.format(a="_v", b="c.cv")
    best = F.expr(
        f"array_max(transform(array({cents}),"
        f" c -> named_struct('sim', {cos}, 'negcid', -c.cid)))"
    )
    return base.select(
        "_id",
        "_v",
        (-best["negcid"]).alias("cluster"),
        best["sim"].alias("sim"),
    )


def kmeans_assign(
    embeddings: DataFrame,
    n_clusters: int = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run `n_iters` Lloyd's rounds; return (vec_id, cluster,
    cosine_sim) — each vector's final cluster and its similarity to
    that cluster's trained centroid."""
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("_v"),
    )
    # persist across the training jobs (seed collect + one update job
    # per round) — the MLlib iteration pattern; at 100 TB this is the
    # difference between one scan and n_iters+1 scans of the corpus.
    # Released before returning: the lazily-evaluated final assignment
    # recomputes from the source, so nothing leaks past the call.
    base = base.persist()
    try:
        seeds = (
            base.orderBy(F.md5(F.col("_id").cast("string")), "_id")
            .limit(n_clusters)
            .collect()
        )
        centroids = [(i, list(r["_v"])) for i, r in enumerate(seeds)]
        # quantize in double arithmetic (engine-portable bits), sum
        # exactly as integer decimals; the resulting sums stay < 2^53
        # at oracle scales, so the double cast is exact on both engines
        fixed = F.floor(F.col("x") * F.lit(1.0e9) + F.lit(0.5)).cast(
            "decimal(38,0)"
        )
        for _ in range(n_iters):
            assigned = _assign(base, centroids)
            comps = (
                assigned.select(
                    "cluster", F.posexplode("_v").alias("dim", "x")
                )
                .groupBy("cluster", "dim")
                .agg(
                    F.sum(fixed).cast("double").alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .select(
                    "cluster",
                    "dim",
                    (
                        F.col("s") / (F.lit(1.0e9) * F.col("n").cast("double"))
                    ).alias("comp"),
                )
                .collect()
            )
            new: dict[int, dict[int, float]] = {}
            for r in comps:
                new.setdefault(r["cluster"], {})[r["dim"]] = r["comp"]
            centroids = [
                (
                    cid,
                    [v[d] for d in sorted(v)] if (v := new.get(cid)) else old,
                )
                for cid, old in centroids
            ]
    finally:
        base.unpersist()
    return (
        _assign(base, centroids)
        .select(
            F.col("_id").alias("vec_id"),
            "cluster",
            F.col("sim").alias("cosine_sim"),
        )
        .orderBy("vec_id")
    )


def kmeans_assign_sql(n_clusters: int = 8, n_iters: int = 3) -> str:
    """DuckDB twin: the same iterations unrolled as chained CTEs."""

    def cos(a: str, b: str) -> str:
        dot = (
            f"list_aggregate(list_transform(range(1, len({a}) + 1), "
            f"i -> {a}[i] * {b}[i]), 'sum')"
        )
        na = f"list_aggregate(list_transform({a}, x -> x * x), 'sum')"
        nb = f"list_aggregate(list_transform({b}, x -> x * x), 'sum')"
        return COS_SQL_GUARD.format(na=na, nb=nb, dot=dot)

    def assign_cte(i: int) -> str:
        return f"""
assign{i} AS (
  SELECT _id, _v, cid AS cluster, sim FROM (
    SELECT s.*, row_number() OVER (
      PARTITION BY _id ORDER BY sim DESC, cid
    ) AS rn
    FROM (
      SELECT b._id, b._v, c.cid, {cos("b._v", "c.cv")} AS sim
      FROM base b CROSS JOIN cents{i - 1} c
    ) s
  ) WHERE rn = 1
)"""

    def cents_cte(i: int) -> str:
        # same double-arithmetic quantization as the Spark side (never
        # a raw double->DECIMAL cast: the engines round ties
        # differently), then exact integer-decimal sums
        return f"""
cents{i} AS (
  SELECT cluster AS cid, list(comp ORDER BY dim) AS cv FROM (
    SELECT cluster, dim,
           CAST(CAST(SUM(CAST(floor(x * 1e9 + 0.5) AS DECIMAL(38,0)))
                     AS VARCHAR) AS DOUBLE)
             / (1e9 * CAST(COUNT(*) AS DOUBLE)) AS comp
    FROM (SELECT cluster, unnest(_v) AS x, generate_subscripts(_v, 1) AS dim
          FROM assign{i})
    GROUP BY cluster, dim
  ) GROUP BY cluster
  UNION ALL
  SELECT cid, cv FROM cents{i - 1}
  WHERE cid NOT IN (SELECT DISTINCT cluster FROM assign{i})
)"""

    ctes = [
        """base AS (
  SELECT vec_id AS _id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS _v
  FROM embeddings
)""",
        f"""cents0 AS (
  SELECT CAST(row_number() OVER (ORDER BY md5(CAST(_id AS VARCHAR)), _id) - 1
              AS INT) AS cid,
         _v AS cv
  FROM base
  ORDER BY md5(CAST(_id AS VARCHAR)), _id
  LIMIT {n_clusters}
)""",
    ]
    for i in range(1, n_iters + 1):
        ctes.append(assign_cte(i))
        ctes.append(cents_cte(i))
    ctes.append(assign_cte(n_iters + 1))
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT _id AS vec_id, cluster, sim AS cosine_sim
FROM assign{n_iters + 1}
ORDER BY vec_id
"""
