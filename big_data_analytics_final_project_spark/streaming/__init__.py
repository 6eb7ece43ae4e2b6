"""Structured Streaming surface.

The reference's only 'streaming' is batch-incremental plumbing: ijson
parse + batched HBase puts (reference load_hbase_sessions_stream.py:32,
77-79) over a time-ordered rowkey. SURVEY.md §7.6 maps that to the real
thing: file-source `readStream` → watermarked event-time windows →
`foreachBatch` sinks mirroring the loader's flush cadence.

Every aggregation here is the SAME expression its batch twin in
queries/windows.py uses — batch mode is how the oracle checks it
(Structured Streaming's unified model makes the plans literally
shared).

Scale: state-store size is bounded by the watermark horizon; the
session-window aggregation keys state by (user, session) and evicts on
watermark passage — the knobs that matter at 100 TB are the watermark
delay and `spark.sql.streaming.statePartitions` (shuffle partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "parquet", max_files: int = 1
) -> DataFrame:
    """File-source event stream (micro-batch per file drop — the
    streaming analog of the reference's chunked sessions_*.json
    ingest, data_generator.py:241-248)."""
    reader = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .format(fmt)
    )
    return reader.load(path)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts — streaming twin of
    queries/windows.events_tumbling_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Built-in `session_window` sessionization — the incremental twin
    of operators/sessionize.py. Window end = last event + gap (Spark
    semantics), so `duration_s` here includes the trailing gap; the
    batch twin reports last−first. Both are exposed deliberately."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def deduped_stream(
    events: DataFrame,
    id_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """At-most-once per id under re-delivery:
    `dropDuplicatesWithinWatermark` keeps one row per key among
    duplicates whose event times fall within the watermark horizon of
    each other — the streaming twin of batch `dropDuplicates` (DED-1)
    for sources with at-least-once semantics (the reference's loader
    meets re-runs with a skipped-rows counter instead,
    load_hbase_sessions_stream.py:25-26,121-134; this is the
    exactly-once upgrade).

    Scale: state is one entry per key with expiry at watermark passage
    — bounded by arrival rate × horizon, never by stream length
    (plain streaming `dropDuplicates` state grows forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        id_cols or ["event_id"]
    )


def purchase_click_join_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    lookback: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval self-join: each purchase is
    matched to the same user's clicks in the preceding `lookback` —
    the incremental twin of the batch interval join behind
    `clicks_before_purchase` (operators/rangejoin.py).

    Both sides carry watermarks and the join condition bounds
    click_ts to a purchase-relative interval, so the state store
    retains each side only for watermark + lookback: state is bounded
    by arrival rate × horizon, never stream length — the property that
    makes a stream-stream join survive at 100 TB/day. Inner join:
    purchases with no preceding click produce nothing (the batch twin
    counts them as zero; the streamed pairs are the join's raw
    deliverable)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("click_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""
            user_id = click_user_id
            AND click_ts >= purchase_ts - INTERVAL {lookback}
            AND click_ts < purchase_ts
            """
        ),
        "inner",
    ).select(
        "purchase_event_id",
        "user_id",
        "purchase_ts",
        "purchase_value",
        "click_event_id",
        "click_ts",
        "click_value",
    )


def write_foreach_batch(df: DataFrame, out_dir: str, checkpoint: str, batch_fn=None):
    """foreachBatch sink — the engine's analog of the reference's
    batched wide-column writes with periodic flush (SNK-1,
    load_hbase_sessions_stream.py:27,77-79). Default behavior appends
    each micro-batch to partitioned parquet."""

    def _default(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(f"{out_dir}/batch={batch_id}")

    return (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(batch_fn or _default)
    )
