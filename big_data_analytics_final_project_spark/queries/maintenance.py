"""Zone-maintenance queries: the sink surface under the oracle.

The sink family (SNK-1 batched zone writes, dynamic partition
overwrite, keyed upsert — sinks.py) was previously evidenced only by
pytest; these queries push a full write → merge → read-back → aggregate
cycle through the same DuckDB oracle gate as every relational operator,
so storage-layout code is graded by result values, not just unit
assertions. Mirrors the reference's load-then-query lifecycle
(load_hbase_sessions_stream.py writes what
integrated_query_engagement_vs_spend.py later reads).

Scale notes: the round trip is partitioned on day (the prune key a
time-series zone wants), sorted within files on (user_id, ts) so
min/max stats answer rowkey-style scans, and the upsert leg rewrites
ONLY the final day's partition via dynamic overwrite — at 100 TB the
merge cost is one day's footprint, not the zone's.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum
from ..sinks import upsert_zone, write_zone
from ..sources import load_table
from . import QuerySpec


def _scratch_zone(tag: str, sf_dir: str) -> str:
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"bdafp_{tag}_{digest}")


def zone_roundtrip_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNK-1/SNK-5 + upsert under the oracle: land events as a
    day-partitioned sorted zone (all days but the last), upsert the
    final day through the dynamic-overwrite merge path, re-read the
    zone and aggregate per day.

    The result must equal the same daily aggregate computed directly on
    the source table — any row lost, duplicated, or retyped by the
    write/merge/read cycle (partition-column round-trip included) breaks
    the hash match.
    """
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    zone = _scratch_zone("roundtrip", sf_dir)
    last_day = events.agg(F.max("day")).collect()[0][0]
    # initial bulk load: everything before the final day (static
    # overwrite keeps reruns idempotent)
    write_zone(
        events.filter(F.col("day") < F.lit(last_day)),
        zone,
        partition_by=["day"],
        sort_within_partitions=["user_id", "ts"],
    )
    # incremental leg: the final day arrives later and is merged in
    upsert_zone(
        spark,
        events.filter(F.col("day") == F.lit(last_day)),
        zone,
        key_cols=["event_id"],
        partition_by=["day"],
    )
    back = spark.read.parquet(zone)
    return (
        back.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            exact_sum("value", "sum_value"),
        )
        .orderBy("day")
    )


ZONE_ROUNDTRIP_DAILY_SQL = """
SELECT CAST(ts AS DATE) AS day,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY day
ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "zone_roundtrip_daily": QuerySpec(
        zone_roundtrip_daily, ZONE_ROUNDTRIP_DAILY_SQL
    ),
}
