"""Continuous aggregate: a streaming-maintained rollup zone.

The hypertable pattern the batch `events_hypertable_rollup` query
answers on demand, maintained INCREMENTALLY instead: each micro-batch
folds its partial hourly aggregates into a persistent parquet zone via
the keyed-upsert sink, so readers get an always-current rollup without
rescanning the event log. This closes the reference's load-then-query
loop (load_hbase_sessions_stream.py feeding
integrated_query_engagement_vs_spend.py) as one standing pipeline.

Exactly-once across retries: foreachBatch is at-least-once — a crashed
trigger re-delivers the SAME batch id with the SAME rows. Additive
merges are not idempotent, so every hour row carries `last_batch_id`,
and the retry guard is PER HOUR, not per batch: only the hours whose
zone row already records this batch id (or later) are skipped; hours
the original attempt never applied — a crash midway through a
dynamic overwrite spanning several day partitions, or hours that are
brand-new in this batch — are still folded. A wholesale skip keyed on
hours-already-present would drop those contributions forever.

Scale shape:
- The per-batch aggregate is micro-batch-sized; the merge reads ONLY
  the zone rows for the touched hours (partition-pruned by day) and
  dynamic-overwrites only those day partitions (upsert_zone).
- Sums are kept as DECIMAL(38,6) IN THE ZONE — partials of partials
  stay exact no matter how many batches fold in; readers cast at the
  edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..sinks import upsert_zone


def fold_hourly_batch(batch_df: DataFrame, batch_id: int, zone: str) -> None:
    """Merge one micro-batch's hourly partials into the rollup zone."""
    spark = batch_df.sparkSession
    partial = (
        batch_df.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("sum_value_dec"),
        )
        .withColumn("day", F.to_date("hour"))
        .withColumn("last_batch_id", F.lit(batch_id).cast("bigint"))
    )
    if not partial.take(1):
        return
    # Existence probe, not exception-catching: a zone that exists but
    # fails to READ must abort, never degrade to a fresh first write.
    jvm = spark._jvm
    zone_path = jvm.org.apache.hadoop.fs.Path(zone)
    fs = zone_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(zone_path):
        upsert_zone(
            spark, partial, zone, key_cols=["hour"], partition_by=["day"]
        )
        return
    existing = spark.read.parquet(zone)
    # Per-hour retry guard: an hour whose zone row already records this
    # batch id (or later) has this batch's contribution folded in; every
    # other hour of the batch — new hours, or hours a partially-applied
    # earlier attempt missed — still needs folding.
    covered = existing.filter(F.col("last_batch_id") >= batch_id).select("hour")
    todo = partial.join(F.broadcast(covered), "hour", "left_anti")
    if not todo.take(1):
        return
    touched = existing.join(
        F.broadcast(todo.select("hour")), "hour", "left_semi"
    )
    merged = (
        touched.unionByName(todo)
        .groupBy("hour", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").cast(DEC).alias("sum_value_dec"),
            F.max("last_batch_id").alias("last_batch_id"),
        )
    )
    upsert_zone(spark, merged, zone, key_cols=["hour"], partition_by=["day"])


def maintain_hourly_rollup(events: DataFrame, zone: str, checkpoint: str):
    """writeStream query folding the event stream into the rollup zone;
    start with `.trigger(availableNow=True).start()` for catch-up runs
    or a processing-time trigger for standing maintenance."""
    return (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda batch_df, batch_id: fold_hourly_batch(
                batch_df, batch_id, zone
            )
        )
    )


def read_hourly_rollup(spark, zone: str) -> DataFrame:
    """Reader view: the maintained zone with sums finalized to double —
    the same (hour, n_events, sum_value) the batch aggregation yields."""
    return (
        spark.read.parquet(zone)
        .select(
            "hour",
            "n_events",
            F.col("sum_value_dec").cast("double").alias("sum_value"),
        )
        .orderBy("hour")
    )
