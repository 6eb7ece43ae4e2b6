"""Distributed PageRank — deterministic, oracle-checkable iterative
graph analytics over an edge DataFrame.

Alongside k-means (operators/kmeans.py) this is the second ITERATIVE
algorithm in the engine, and it follows the same two disciplines that
make a float loop bit-reproducible across partitionings AND engines:

1. Every per-edge contribution rank(u)/outdeg(u) is quantized in
   DOUBLE arithmetic — floor(x * 1e12 + 0.5), identical bits on the
   JVM and in DuckDB — and the per-node reduction sums those INTEGERS
   exactly (decimal accumulator), so the result never depends on
   Spark's partial-aggregation order. A raw double sum would drift
   per-partitioning and could never hash-match an oracle.
2. All scalar arithmetic keeps one explicit expression shape
   (base + d * (sum/1e12)) mirrored verbatim in the SQL twin; decimal
   literals are forced to DOUBLE in the oracle because DuckDB would
   otherwise compute (1 - 0.85) in exact DECIMAL and diverge from
   IEEE doubles in the last ulp.

Scale (100 TB graph): rank state stays a DataFrame — never collected
(unlike k-means' k×d centroids, the rank vector is node-sized). Each
round is one (src)-keyed join shuffle + one (dst)-keyed exact partial
aggregate; the degree table is computed once. Dangling mass: nodes
derived from an undirected pair list always have out-edges, so no
dangling redistribution term is needed (asserted by construction in
the co-purchase query). For long runs, persist/checkpoint each round
to cut lineage — with the fixed small n_iters used here the lazily
composed plan is fine.

The reference has no graph operator; this extends the pair-mining
family (reference spark_analysis.py:113-143's co-purchase pairs) into
"which products sit at the center of the co-purchase graph".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoints import resolve_materialize

_Q = 1e12  # contribution quantum: floor(contrib * _Q + 0.5)


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize: bool | None = None,
) -> DataFrame:
    """Ranks after ``n_iters`` synchronous PageRank rounds from a
    uniform start. Returns (node, pagerank), undamped mass (1-d)/N
    included. Every node must have ≥1 out-edge (true for edge lists
    built from undirected pairs); dangling-mass handling is therefore
    not implemented — feed a symmetrized edge list.

    By default the node-sized result is materialized eagerly (one
    localCheckpoint — the same contract connected_components returns
    under) so the persisted loop-invariant frames can be RELEASED
    before returning (the MLlib train-then-unpersist idiom; otherwise
    every call pins an edge-sized cached frame for the session's
    life). ``materialize=False`` returns the lazy n_iters-round plan
    and leaves the persisted frames for the caller to manage."""
    mat = resolve_materialize(materialize)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if not mat:
        # Lazy mode (plan tooling): run the n-probe BEFORE the persist
        # mark is registered, so building the plan materializes no
        # cache — otherwise every lint/dump over the registry leaks a
        # materialized node cache into the shared session (r12
        # ADVICE). The count job itself is unavoidable: n is a literal
        # in the returned plan (rank init, undamped base).
        n_probe = nodes.count()
    nodes = nodes.persist()
    edged = None
    try:
        n = nodes.count() if mat else n_probe  # mat: warms the node cache
        if n == 0:
            empty = nodes.withColumn("pagerank", F.lit(0.0))
            if mat:
                empty = empty.localCheckpoint(eager=True)
            return empty
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        # Loop-invariant frames are PERSISTED: without this, every
        # iteration's lineage re-embeds the (possibly expensive) edge
        # derivation and the static plan grows a full copy per round
        # (measured 40 scans / 73 shuffles for 3 rounds over the
        # co-purchase build). This is the GraphX/Pregel shape — the
        # edge list is cached once, iterations touch only cached state.
        edged = e.join(deg, "src").persist()  # (src, dst, outdeg)
        base = (1.0 - damping) / n
        ranks = nodes.withColumn("r", F.lit(1.0 / n))
        for _ in range(n_iters):
            contribs = edged.join(
                ranks, edged.src == ranks.node
            ).select(
                "dst",
                F.floor(F.col("r") / F.col("outdeg") * _Q + 0.5)
                .cast("decimal(38,0)")
                .alias("q"),
            )
            sums = contribs.groupBy("dst").agg(
                F.sum("q").cast("double").alias("sq")
            )
            ranks = nodes.join(
                sums, nodes.node == sums.dst, "left"
            ).select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("sq"), F.lit(0.0)) / _Q)
                ).alias("r"),
            )
        result = ranks.select("node", F.col("r").alias("pagerank"))
        if not mat:
            return result
        return result.localCheckpoint(eager=True)  # node-sized
    finally:
        # runs on the error path too — a failed round must not strand
        # the caches in storage memory for the session's life. In lazy
        # mode the caller owns the persisted frames.
        if mat:
            nodes.unpersist()
            if edged is not None:
                edged.unpersist()


def pagerank_sql(
    edges_cte: str, n_iters: int = 3, damping: float = 0.85
) -> str:
    """DuckDB twin: unrolled-CTE rounds over ``edges_cte`` (a CTE body
    yielding (src, dst)). Decimal literals are forced DOUBLE so the
    scalar arithmetic is IEEE, matching the Spark side bit-for-bit;
    integer contribution sums ride the VARCHAR bridge (HUGEINT→DOUBLE
    via text — functions/numeric.py exact_sum_sql rationale)."""
    d = f"CAST({damping} AS DOUBLE)"
    ctes = [
        f"edges AS ({edges_cte})",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        # UNION (dedup) of both endpoints — identical to the Spark
        # side; equals DISTINCT(src) for symmetrized lists but stays
        # correct if a caller ever feeds a directed list
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS r"
        " FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst,
         CAST(floor(r{p}.r / dg.outdeg * 1e12 + 0.5) AS BIGINT) AS q
  FROM edges e JOIN deg dg ON e.src = dg.src JOIN r{p} ON r{p}.node = e.src
)"""
        )
        ctes.append(
            f"""s{i} AS (
  SELECT dst, CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) AS sq
  FROM c{i} GROUP BY dst
)"""
        )
        ctes.append(
            f"""r{i} AS (
  SELECT node,
         (CAST(1 AS DOUBLE) - {d}) / nn.n
           + {d} * (COALESCE(s{i}.sq, CAST(0 AS DOUBLE)) / 1e12) AS r
  FROM nodes CROSS JOIN nn LEFT JOIN s{i} ON s{i}.dst = node
)"""
        )
    body = ",\n".join(ctes)
    return f"WITH {body}\nSELECT node, r AS pagerank FROM r{n_iters}"
