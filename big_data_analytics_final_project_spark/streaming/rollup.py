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
merges are not idempotent, so every hour row carries `last_batch_id`;
a re-delivered batch (id ≤ the zone's high-water mark for every hour
it touches) is skipped wholesale — its contribution is already in.

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
    try:
        existing = spark.read.parquet(zone)
    except Exception:  # first batch: the zone does not exist yet
        upsert_zone(
            spark, partial, zone, key_cols=["hour"], partition_by=["day"]
        )
        return
    touched = existing.join(
        F.broadcast(partial.select("hour")), "hour", "left_semi"
    )
    # Retry of an already-folded batch: every touched hour has already
    # recorded this batch id (or later) — skip, the contribution is in.
    if touched.take(1) and (
        touched.agg(F.min("last_batch_id")).collect()[0][0] >= batch_id
    ):
        return
    merged = (
        touched.unionByName(partial)
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
