"""Streaming profile monitor: `operators/profile.table_profile`'s
standing form — a continuously maintained per-column stats zone.

A batch profile rescans the zone on demand; at 100 TB the monitor
instead folds each micro-batch's per-column partials into an
n_cols-row zone: counts and typed min/max merge trivially, and the
distinct count persists as Datasketches HLL STATE (`hll_sketch_agg`
binary blobs merged with `hll_union_agg` — the union-over-state
algebra of `operators/sketches.hll_daily_sketches`). Precision note:
in dense HLL mode union-of-states equals the single-pass sketch, but
a SMALL batch's sketch sits in the library's sparse/exact mode, and
union promotes representations — so streamed-vs-single-pass estimates
may differ slightly at low cardinality while BOTH stay inside the
sketch's error bound (the guarantee that matters, test-pinned; at
monitor scale every batch is dense anyway). Each trigger touches only
its micro-batch plus the column-count-sized zone.

Values feed the sketch as canonical strings (doubles normalized with
`+ 0.0` so -0.0 and 0.0 — equal under SQL DISTINCT — agree on one
representation). Retry guard, upsert discipline, and the foreachBatch
shape follow streaming/rollup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import _kind

PROFILE_LGK = 12


def batch_column_stats(
    df: DataFrame, cols: list[str] | None = None, lgk: int = PROFILE_LGK
) -> DataFrame:
    """One micro-batch's per-column partials: the `table_profile`
    stats with the distinct count as MERGEABLE HLL state instead of a
    number. Single scan, exploded to one row per column."""
    kinds = {f.name: _kind(f.dataType) for f in df.schema.fields}
    if cols is None:
        cols = [c for c in df.columns if kinds[c] != "other"]
    bad = [c for c in cols if kinds.get(c) == "other" or c not in kinds]
    if bad:
        raise ValueError(f"unknown or unprofilable columns: {bad}")

    def null_of(dtype: str):
        return F.lit(None).cast(dtype)

    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        k = kinds[c]
        lo, hi = F.min(F.col(c)), F.max(F.col(c))
        if k == "time":
            lo, hi = (
                F.unix_micros(lo.cast("timestamp")),
                F.unix_micros(hi.cast("timestamp")),
            )
        sketch_in = F.col(c)
        if k == "num":
            # -0.0 == 0.0 under SQL DISTINCT; normalize before casting
            sketch_in = sketch_in + F.lit(0.0)
        elif k == "time":
            sketch_in = F.unix_micros(F.col(c).cast("timestamp"))
        aggs.append(
            F.struct(
                F.sum(F.col(c).isNull().cast("bigint")).alias("n_nulls"),
                F.hll_sketch_agg(
                    sketch_in.cast("string"), F.lit(lgk)
                ).alias("sketch"),
                (lo.cast("double") if k == "num" else null_of("double")).alias("min_num"),
                (hi.cast("double") if k == "num" else null_of("double")).alias("max_num"),
                (lo if k == "time" else null_of("bigint")).alias("min_us"),
                (hi if k == "time" else null_of("bigint")).alias("max_us"),
                (lo if k == "str" else null_of("string")).alias("min_str"),
                (hi if k == "str" else null_of("string")).alias("max_str"),
            ).alias(f"_s_{c}")
        )
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col(f"_s_{c}").alias("s"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return one.select("_n_rows", per_col).select(
        F.col("p.column_name").alias("column_name"),
        F.col("_n_rows").alias("n_rows"),
        F.col("p.s.n_nulls").alias("n_nulls"),
        F.col("p.s.sketch").alias("sketch"),
        F.col("p.s.min_num").alias("min_num"),
        F.col("p.s.max_num").alias("max_num"),
        F.col("p.s.min_us").alias("min_us"),
        F.col("p.s.max_us").alias("max_us"),
        F.col("p.s.min_str").alias("min_str"),
        F.col("p.s.max_str").alias("max_str"),
    )


def _merge_aggs():
    # built lazily: some aggregate constructors need an active session
    return [
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.hll_union_agg("sketch").alias("sketch"),
        F.min("min_num").alias("min_num"),
        F.max("max_num").alias("max_num"),
        F.min("min_us").alias("min_us"),
        F.max("max_us").alias("max_us"),
        F.min("min_str").alias("min_str"),
        F.max("max_str").alias("max_str"),
    ]


def fold_profile_batch(
    batch_df: DataFrame,
    batch_id: int,
    zone: str,
    cols: list[str] | None = None,
) -> None:
    """Merge one micro-batch's column partials into the profile zone —
    the retry-guarded fold (streaming/fold.py), keyed per column."""
    from .fold import retry_guarded_fold

    retry_guarded_fold(
        batch_column_stats(batch_df, cols),
        batch_id,
        zone,
        key_cols=["column_name"],
        partition_by=["column_name"],
        merge_aggs=_merge_aggs,
    )


def maintain_profile(
    df: DataFrame, zone: str, checkpoint: str, cols: list[str] | None = None
):
    """writeStream query folding the stream into the profile zone."""
    return (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda batch_df, batch_id: fold_profile_batch(
                batch_df, batch_id, zone, cols
            )
        )
    )


def read_profile(spark: SparkSession, zone: str) -> DataFrame:
    """Reader view: the maintained zone with sketches finalized to
    distinct-count estimates — `table_profile`'s schema with
    `n_distinct` carrying the HLL estimate."""
    return (
        spark.read.parquet(zone)
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            F.hll_sketch_estimate("sketch")
            .cast("bigint")
            .alias("n_distinct"),
            "min_num",
            "max_num",
            "min_us",
            "max_us",
            "min_str",
            "max_str",
        )
        .orderBy("column_name")
    )
