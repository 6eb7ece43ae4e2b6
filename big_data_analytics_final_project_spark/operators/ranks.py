"""Distributed exact global ranking — the scale-safe replacement for
single-task `Window.orderBy(...)` ranking windows.

An unpartitioned ranking window (`row_number`/`ntile`/`percent_rank`
OVER (ORDER BY ...)) funnels every row through ONE task — the pattern
that breaks first at 100 TB even when it windows "post-aggregation
small" data (customer aggregates are still 10^8-10^9 rows at scale).
The reference never ranks more than a pandas frame (e.g. its top-N
sorts, spark_analysis.py:84-101), so it never hits this; a distributed
engine must.

Two-level scheme (same shape as the concurrency sweep in
queries/windows.py):

1. `repartitionByRange` on the order — non-overlapping key ranges,
   partition index == global order of partitions;
2. per-partition local position: `sortWithinPartitions` + the record
   number carried in `monotonically_increasing_id`'s low 33 bits —
   parallel across partitions, and window-free (a window PARTITIONED
   by the physical partition id would hash-exchange the full frame a
   second time just to re-cluster on a key it already has);
3. per-partition row counts (one row per partition) get a prefix sum
   and come back as broadcast offsets: global rank = offset + local
   row number.

Exactness requires a TOTAL order: include a unique tiebreak column in
``order_cols`` (the same rule `sessionize` imposes). Equal keys land in
one range partition, so ranks never straddle a boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _cols(order_cols) -> list[Column]:
    return [c if isinstance(c, Column) else F.col(c) for c in order_cols]


def with_global_row_number(
    df: DataFrame,
    order_cols,
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = exact 1-based global row number under
    ``order_cols`` (must be a total order) without a single-task
    global window.

    Cost (r17): ONE range exchange of the full frame + an in-partition
    sort, versus the global window's one exchange INTO ONE TASK. (The
    per-pid `row_number` window this used to run forced a second
    full-frame hash exchange; the local position now comes from
    `monotonically_increasing_id` over the sorted partitions.) The
    counts branch re-derives from the same range exchange (canonically
    identical — AQE stage reuse executes it once) without paying the
    sort; its prefix-sum window runs over one row per partition.
    """
    sort = _cols(order_cols)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = df.repartitionByRange(num_partitions, *sort)
    # Local row number WITHOUT a window (r17, guide §2.4): the frame is
    # already range-partitioned, so the per-pid `row_number()` window
    # this used to run forced a second FULL-FRAME exchange (Catalyst
    # hash-clusters on the window's partition key even when that key is
    # the physical partition id). Instead, sort within the existing
    # partitions and read the local position out of
    # `monotonically_increasing_id` — documented layout: partition
    # index in the upper 31 bits, the 0-based record number within the
    # partition in the lower 33 (rows stream into the projection in
    # sorted order, and a retried task re-sorts the same range
    # partition, so the assignment is deterministic given the total
    # order). One range exchange total; the counts branch reuses it.
    local = ranged.sortWithinPartitions(*sort).withColumn(
        "_rnk_mid", F.monotonically_increasing_id()
    )
    local = local.select(
        "*",
        F.shiftright(F.col("_rnk_mid"), 33).cast("int").alias("_rnk_pid"),
        (
            F.col("_rnk_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1
        ).alias("_rnk_local"),
    ).drop("_rnk_mid")
    counts = (
        ranged.withColumn("_rnk_pid", F.spark_partition_id())
        .groupBy("_rnk_pid")
        .agg(F.count(F.lit(1)).alias("_rnk_n"))
    )
    w_prefix = Window.orderBy("_rnk_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_rnk_pid",
        F.coalesce(F.sum("_rnk_n").over(w_prefix), F.lit(0)).alias(
            "_rnk_offset"
        ),
    )
    return (
        local.join(F.broadcast(offsets), "_rnk_pid")
        .withColumn(out_col, F.col("_rnk_offset") + F.col("_rnk_local"))
        .drop("_rnk_pid", "_rnk_local", "_rnk_offset")
    )


def with_global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols,
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = exact NTILE(n) bucket under ``order_cols``
    (total order required), distributed via `with_global_row_number`.

    Standard SQL NTILE: with N rows, q = N div n, r = N mod n, the
    first r buckets hold q+1 rows and the rest hold q — reproduced
    from the global rank, so results are bit-identical to
    `ntile(n).over(Window.orderBy(...))` and to DuckDB's ntile."""
    ranked = with_global_row_number(
        df, order_cols, out_col="_rnk_r", num_partitions=num_partitions
    )
    # N from the ORIGINAL frame (cheapest subplan: scan + count), not
    # from `ranked`, whose re-evaluation would repeat both exchanges.
    total = df.agg(F.count(F.lit(1)).alias("_rnk_N"))
    ranked = ranked.join(F.broadcast(total))  # 1-row scalar attach
    q = (F.col("_rnk_N") / n_tiles).cast("bigint")  # N div n
    r = F.col("_rnk_N") % n_tiles
    big = r * (q + 1)  # rows living in the q+1-sized buckets
    tile = F.when(
        F.col("_rnk_r") <= big, F.ceil(F.col("_rnk_r") / (q + 1))
    ).otherwise(
        r + F.ceil((F.col("_rnk_r") - big) / F.greatest(q, F.lit(1)))
    )
    return ranked.withColumn(out_col, tile.cast("int")).drop(
        "_rnk_r", "_rnk_N"
    )
