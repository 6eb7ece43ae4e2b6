"""The retry-guarded additive zone fold — the one foreachBatch merge
discipline behind every streaming-maintained zone here (hourly rollup,
PSI bin counts, profile stats).

foreachBatch is at-least-once: a crashed trigger re-delivers the SAME
batch id with the SAME rows, and additive merges are not idempotent.
The guard is PER KEY, not per batch: each zone row carries
`last_batch_id`, and only the keys whose zone row already records this
batch id (or later) are skipped — keys the original attempt never
applied (a crash midway through a dynamic overwrite spanning several
partitions, or keys brand-new in this batch) are still folded. A
wholesale skip keyed on keys-already-present would drop those
contributions forever (streaming/rollup.py's original analysis).

Scale: the merge reads ONLY the zone rows for the touched keys
(left-semi on the batch's key set, broadcast — partials are
micro-batch-sized) and dynamic-overwrites only their partitions via
`sinks.upsert_zone`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sinks import has_committed_files, upsert_zone


def retry_guarded_fold(
    partial: DataFrame,
    batch_id: int,
    zone: str,
    key_cols: list[str],
    partition_by: list[str],
    merge_aggs: Callable[[], list[Column]],
) -> None:
    """Fold one micro-batch's `partial` aggregate frame (keyed by
    `key_cols`, WITHOUT a last_batch_id column — added here) into the
    parquet zone at `zone`. `merge_aggs` builds the additive aggregate
    list that merges an existing zone row with a new partial row for
    the same key (called lazily — aggregate constructors may need an
    active session)."""
    spark = partial.sparkSession
    partial = partial.withColumn(
        "last_batch_id", F.lit(batch_id).cast("bigint")
    )
    if not partial.take(1):
        return
    # Committed-data probe, not bare fs.exists and not
    # exception-catching: a crashed FIRST write leaves the zone dir
    # holding only _temporary/ debris, so exists=true would route every
    # retry into spark.read.parquet of an empty zone and wedge the
    # stream permanently. has_committed_files (the same probe
    # upsert_zone uses to self-heal this case) degrades to a first
    # write when no committed files exist; a zone WITH committed files
    # that fails to read still aborts — never degrade real data.
    jvm = spark._jvm
    zone_path = jvm.org.apache.hadoop.fs.Path(zone)
    fs = zone_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(zone_path) or not has_committed_files(fs, zone_path):
        upsert_zone(
            spark, partial, zone, key_cols=key_cols, partition_by=partition_by
        )
        return
    existing = spark.read.parquet(zone)
    covered = existing.filter(F.col("last_batch_id") >= batch_id).select(
        *key_cols
    )
    todo = partial.join(F.broadcast(covered), key_cols, "left_anti")
    if not todo.take(1):
        return
    touched = existing.join(
        F.broadcast(todo.select(*key_cols)), key_cols, "left_semi"
    )
    merged = (
        touched.unionByName(todo)
        .groupBy(*key_cols)
        .agg(*merge_aggs(), F.max("last_batch_id").alias("last_batch_id"))
    )
    upsert_zone(
        spark, merged, zone, key_cols=key_cols, partition_by=partition_by
    )
