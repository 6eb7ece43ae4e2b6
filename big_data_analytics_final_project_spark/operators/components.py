"""Connected components over an edge list — the clustering step that
turns near-duplicate PAIRS into duplicate GROUPS.

A dedup pipeline's real deliverable is not the pair list but the
partition of documents into duplicate clusters (pick one survivor per
cluster, drop the rest). Pairs → clusters is connected components on
the pair graph.

Algorithm: iterative min-label propagation with pointer jumping.
Each round every node takes the min label among itself and its
neighbors (one hop of propagation), then compresses paths by adopting
its label's label (pointer jumping) — the combination converges in
O(log(diameter)) rounds on chains instead of O(diameter). Duplicate
clusters are near-cliques in practice, so typical convergence is 2-3
rounds.

Scale shape (100 TB):
- Each round is two shuffles (neighbor-min groupBy + label-lookup
  join) over the EDGE list, which for LSH dedup is candidate-sized
  (∝ near-dups), not corpus-sized.
- `localCheckpoint` truncates lineage every round — without it the
  plan doubles per iteration and Catalyst analysis time explodes
  (the classic iterative-algorithm failure mode).
- Convergence is detected with an aggregated count of changed labels
  (one cheap job per round), not a collect of the labels.

The fixpoint is SQL-expressible as a recursive CTE, so the operator
stays under the DuckDB oracle (queries/dedup.py) despite the driver
loop. Min-of-component is order-independent → partitioning-independent
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoints import unpersist_local_checkpoint


def connected_components(
    edges: DataFrame,
    node_a: str = "src",
    node_b: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, label) for every node in `edges`, where label = min node
    id of the node's connected component. Nodes with no edges are the
    caller's concern (they are their own singleton clusters).
    """
    und = edges.select(
        F.col(node_a).alias("u"), F.col(node_b).alias("v")
    ).union(edges.select(F.col(node_b).alias("u"), F.col(node_a).alias("v")))
    und = und.localCheckpoint(eager=True)

    labels = (
        und.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
        .localCheckpoint(eager=True)
    )
    old = labels
    try:
        for _ in range(max_rounds):
            # one hop: min label among self and neighbors
            nb = und.join(
                labels, und.v == labels.node
            ).select(F.col("u").alias("node"), F.col("label"))
            hop = (
                labels.union(nb)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            # pointer jumping: adopt the label's own label (labels are
            # node ids, and every node id has a row, so the lookup
            # always hits)
            lut = hop.select(
                F.col("node").alias("l_node"), F.col("label").alias("l_label")
            )
            jumped = (
                hop.join(lut, hop.label == lut.l_node, "left")
                .select(
                    "node", F.coalesce("l_label", "label").alias("label")
                )
                .localCheckpoint(eager=True)
            )
            old, labels = labels, jumped
            changed = (
                jumped.alias("n")
                .join(old.alias("o"), "node")
                .where(F.col("n.label") != F.col("o.label"))
                .count()
            )
            # the changed-count was the old labels checkpoint's last
            # reader — free its blocks before they pile up
            # round-over-round (operators/checkpoints.py rationale)
            unpersist_local_checkpoint(old)
            if changed == 0:
                break
    except BaseException:
        # a failed round must not strand its checkpoints in storage
        # memory; unpersist is idempotent, so double-freeing `old` on
        # partial progress is harmless
        for df in (und, old, labels):
            unpersist_local_checkpoint(df)
        raise
    # the returned frame reads only its OWN checkpoint blocks, so the
    # edge mirror can go too; the final labels checkpoint is the one
    # block set that must outlive the call (it IS the result's data)
    unpersist_local_checkpoint(und)
    return labels
