"""Table profiler — the ANALYZE/summary-statistics primitive a corpus
pipeline runs before it trusts (or trains on) a zone: per column, row
count, null count, distinct count, and typed min/max, computed in ONE
scan and returned as a relation (one row per column).

The reference has no profiling surface at all — its validation is
`df.head()` printed to stdout (spark_analysis.py output sections);
`data_generator.py` trusts its own ranges. A 100 TB lake needs the
machine-checkable form: schema drift shows up as a changed column set,
loader bugs as null-count spikes, key corruption as n_distinct moving,
unit mix-ups as min/max leaving range — and the drift family
(queries/drift.py) needs exactly these numbers as its reference
baseline.

Plan shape: a single global aggregate computes every column's stats in
one pass over the data (5 aggregate expressions per column), then the
1-row result is exploded into a (column_name, stats...) relation —
driver-free, collect-free. With `exact_distinct=True` the multi-column
COUNT(DISTINCT) forces Catalyst's Expand rewrite: each input row is
replicated once per distinct-aggregate (~n_cols×) before the partial
aggregation collapses it per partition. That is the textbook ANALYZE
plan and is fine into the low-terabyte range; at 100 TB flip
`exact_distinct=False` and each distinct count becomes a mergeable
HyperLogLog++ sketch (`approx_count_distinct`) — no Expand, plain
map-side partials, one row out per partition (plan-pinned in
tests/test_profile.py). The exact form exists because it is the
oracle-gradeable one.

Typed min/max: numbers surface as DOUBLE (no arithmetic, so no
rounding to drift cross-engine), timestamps as exact integer epoch
microseconds, strings as strings — three column pairs, NULL where the
type doesn't apply, so one fixed output schema covers any table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _kind(dt: T.DataType) -> str:
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "time"
    if isinstance(dt, T.NumericType):
        return "num"
    if isinstance(dt, T.StringType):
        return "str"
    return "other"


def table_profile(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """Profile `cols` (default: every column of a profilable type) in
    one scan. Output, one row per column, ordered by column_name:

      column_name, n_rows, n_nulls, n_distinct,
      min_num, max_num        (DOUBLE — numeric columns)
      min_us, max_us          (BIGINT epoch micros — time columns)
      min_str, max_str        (STRING — string columns)

    `n_distinct` excludes NULLs (SQL COUNT(DISTINCT) semantics). With
    `exact_distinct=False` it is a HyperLogLog++ estimate (mergeable,
    no Expand in the plan) — the 100 TB setting."""
    kinds = {f.name: _kind(f.dataType) for f in df.schema.fields}
    if cols is None:
        cols = [c for c in df.columns if kinds[c] != "other"]
    unknown = [c for c in cols if c not in kinds]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")
    bad = [c for c in cols if kinds[c] == "other"]
    if bad:
        raise ValueError(f"unprofilable (nested/binary) columns: {bad}")

    n_distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c).cast("bigint"))
    )

    def null_long(dtype: str) -> Column:
        return F.lit(None).cast(dtype)

    aggs: list[Column] = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        k = kinds[c]
        lo, hi = F.min(F.col(c)), F.max(F.col(c))
        if k == "time":
            lo, hi = (
                F.unix_micros(lo.cast("timestamp")),
                F.unix_micros(hi.cast("timestamp")),
            )
        stats = F.struct(
            F.sum(F.col(c).isNull().cast("bigint")).alias("n_nulls"),
            n_distinct(c).alias("n_distinct"),
            (lo.cast("double") if k == "num" else null_long("double")).alias(
                "min_num"
            ),
            (hi.cast("double") if k == "num" else null_long("double")).alias(
                "max_num"
            ),
            (lo if k == "time" else null_long("bigint")).alias("min_us"),
            (hi if k == "time" else null_long("bigint")).alias("max_us"),
            (lo if k == "str" else null_long("string")).alias("min_str"),
            (hi if k == "str" else null_long("string")).alias("max_str"),
        )
        aggs.append(stats.alias(f"_s_{c}"))

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
    return (
        one.select("_n_rows", per_col)
        .select(
            F.col("p.column_name").alias("column_name"),
            F.col("_n_rows").alias("n_rows"),
            F.col("p.s.n_nulls").alias("n_nulls"),
            F.col("p.s.n_distinct").alias("n_distinct"),
            F.col("p.s.min_num").alias("min_num"),
            F.col("p.s.max_num").alias("max_num"),
            F.col("p.s.min_us").alias("min_us"),
            F.col("p.s.max_us").alias("max_us"),
            F.col("p.s.min_str").alias("min_str"),
            F.col("p.s.max_str").alias("max_str"),
        )
        .orderBy("column_name")
    )
