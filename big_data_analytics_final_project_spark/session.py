"""SparkSession factory.

Replaces the reference's hand-tuned ``local[2]`` /
``spark.sql.shuffle.partitions=8`` session (reference
spark_analysis.py:15-21) with an AQE-first configuration: let adaptive
execution pick post-shuffle partition counts, handle skew joins, and
demote sort-merge joins to broadcast when runtime stats allow. These
settings are the ones that transfer to a 1000-executor cluster — the
only local-mode-specific knob is the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for cluster-transferability:
#  - AQE owns shuffle-partition sizing (initialPartitionNum is an upper
#    bound AQE coalesces down from; at 100 TB you raise it, AQE still
#    right-sizes every exchange).
#  - skewJoin splits hot keys at runtime instead of manual salting for
#    the common case (manual salting helpers live in operators/ for the
#    pathological ones).
#  - Arrow on: every applyInPandas / pandas_udf crossing is batched.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Some zones carry TIMESTAMP(NANOS) parquet columns, which Spark
    # cannot map; read them as raw nanos and convert in the loader.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # The executed-scan audit (plans/executed_scan_counts) parses the
    # SQL status store's physicalPlanDescription, whose layout follows
    # this mode — the parser needs formatted's numbered detail headers
    # to resolve scan nodes to tables (r14 advice: a simple/extended
    # mode would silently attribute every scan to '?').
    "spark.sql.ui.explainMode": "formatted",
    # InferFiltersFromGenerate turns every explode(f(x)) into a pushed
    # Filter(size(f(x))>0) that re-inlines f — for computed arrays
    # (shingles, band keys) that doubles the most expensive expression
    # in the plan and anchors it below any repartition, serializing it
    # onto the scan task. Our generated arrays are non-empty by
    # construction, so the inferred filter is pure overhead.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # Columnar shuffle/scan defaults are already on in Spark 4; listed
    # knobs above are the ones we actively depend on.
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")


def get_session(
    app_name: str = "big-data-analytics-final-project-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` sets the *initial* shuffle parallelism; AQE
    coalesces from there, so oversizing is safe and undersizing is the
    only real mistake at scale.
    """
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    # Local mode runs driver + all 32 executor threads in ONE JVM;
    # Spark's 1g default heap is sized for a thin cluster driver, not
    # for 32 concurrent sort/aggregate tasks plus cached frames (the
    # pagerank edge cache OOM'd it at sf0.1). On a real cluster
    # executor memory is provisioned by the resource manager and this
    # knob only feeds the (thin again) driver. Env-overridable;
    # extra_conf still wins (tests pin 8g).
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    )
    for k, v in _BASE_CONF.items():
        builder = builder.config(k, v)
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(n_shuffle))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
