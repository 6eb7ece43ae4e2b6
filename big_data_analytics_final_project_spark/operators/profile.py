"""Dataset QA primitives: the table profiler (ANALYZE as a relation),
the profile-diff drift report, and the k-anonymity privacy audit — the
checks a corpus pipeline runs before it trusts (or trains on, or
releases) a zone.

`table_profile`: per column, row count, null count, distinct count,
and typed min/max, computed in ONE scan and returned as a relation
(one row per column).

The reference has no profiling surface at all — its validation is
`df.head()` printed to stdout (spark_analysis.py output sections);
`data_generator.py` trusts its own ranges. A 100 TB lake needs the
machine-checkable form: schema drift shows up as a changed column set,
loader bugs as null-count spikes, key corruption as n_distinct moving,
unit mix-ups as min/max leaving range — and the drift family
(queries/drift.py) needs exactly these numbers as its reference
baseline.

Plan shape: a multi-column COUNT(DISTINCT) takes Catalyst's Expand
rewrite — each input row replicated once per distinct aggregate with
the full n_cols-wide null-slotted tuple as the partial-agg key —
which measured 22s on 600k lineitem rows (32 cores) and scales with
rows × columns. Neither mode plans it:

- `exact_distinct=True` (r18 fold): a UNION of per-column branches,
  each over a column-PRUNED scan — total IO equals ONE full-table
  scan (parquet reads each column exactly once across the union).
  Each branch groups its column into the (value, count) distinct
  relation it needs for the exact distinct count anyway, then derives
  the WHOLE stat row from that relation: n_rows = sum(count),
  n_nulls = the null group's count, n_distinct = the non-null group
  count, min/max = extrema of the group keys (== row-level extrema —
  both ignore NULLs, and a multiset's extrema equal its support's).
  Branches parallelize as independent stages, NO Expand appears
  anywhere (plan-pinned), and — unlike the pre-r18 shape — there is
  no extra all-columns stats scan and no re-attach join. Exact is
  the oracle-gradeable mode.
- `exact_distinct=False`: the 100 TB setting — one single-scan global
  aggregate (4 stat expressions per column, map-side partials only),
  each distinct count a mergeable HyperLogLog++ sketch
  (`approx_count_distinct`), the 1-row result exploded into the
  (column_name, stats...) relation — driver-free, collect-free.

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
    single-scan) — the 100 TB setting."""
    kinds = {f.name: _kind(f.dataType) for f in df.schema.fields}
    if cols is None:
        cols = [c for c in df.columns if kinds[c] != "other"]
    unknown = [c for c in cols if c not in kinds]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")
    bad = [c for c in cols if kinds[c] == "other"]
    if bad:
        raise ValueError(f"unprofilable (nested/binary) columns: {bad}")

    def null_long(dtype: str) -> Column:
        return F.lit(None).cast(dtype)

    if exact_distinct:
        # r18 fold (guide §6.1 — total IO halved, 2 full scans -> 1):
        # each column's ENTIRE stat row is derived from its own
        # distinct-value relation groupBy(c) -> (value, count), which
        # the exact-distinct branch had to build anyway: n_rows is
        # sum(count), n_nulls the null group's count, n_distinct the
        # number of non-null groups, min/max the extrema of the group
        # keys (identical to row-level extrema — both ignore NULLs,
        # and a multiset's min/max equal its support's). The former
        # shape ran an EXTRA all-columns scan for the non-distinct
        # stats and broadcast-joined it back; that scan, its exchange
        # and the join are gone, and the per-branch plan still has no
        # Expand and still reads exactly one column per scan.
        parts: list[DataFrame] = []
        for c in cols:
            k = kinds[c]
            g = df.groupBy(F.col(c).alias("_v")).agg(
                F.count(F.lit(1)).alias("_n")
            )
            lo, hi = F.min(F.col("_v")), F.max(F.col("_v"))
            if k == "time":
                lo, hi = (
                    F.unix_micros(lo.cast("timestamp")),
                    F.unix_micros(hi.cast("timestamp")),
                )
            row = g.agg(
                F.coalesce(F.sum("_n"), F.lit(0).cast("bigint")).alias(
                    "n_rows"
                ),
                F.sum(
                    F.when(F.col("_v").isNull(), F.col("_n")).otherwise(
                        F.lit(0)
                    )
                ).alias("n_nulls"),
                F.count(F.col("_v")).alias("n_distinct"),
                (
                    lo.cast("double") if k == "num" else null_long("double")
                ).alias("min_num"),
                (
                    hi.cast("double") if k == "num" else null_long("double")
                ).alias("max_num"),
                (lo if k == "time" else null_long("bigint")).alias("min_us"),
                (hi if k == "time" else null_long("bigint")).alias("max_us"),
                (lo if k == "str" else null_long("string")).alias("min_str"),
                (hi if k == "str" else null_long("string")).alias("max_str"),
            ).select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_num",
                "max_num",
                "min_us",
                "max_us",
                "min_str",
                "max_str",
            )
            parts.append(row)
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.orderBy("column_name")

    aggs: list[Column] = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        k = kinds[c]
        lo, hi = F.min(F.col(c)), F.max(F.col(c))
        if k == "time":
            lo, hi = (
                F.unix_micros(lo.cast("timestamp")),
                F.unix_micros(hi.cast("timestamp")),
            )
        fields = [
            F.sum(F.col(c).isNull().cast("bigint")).alias("n_nulls"),
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
        ]
        fields.insert(
            1,
            F.approx_count_distinct(c).cast("bigint").alias("n_distinct"),
        )
        aggs.append(F.struct(*fields).alias(f"_s_{c}"))

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
    base = one.select("_n_rows", per_col).select(
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
    return base.orderBy("column_name")


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    structured-privacy counterpart of the text-side `doc_pii_scrub`:
    before a table with user attributes ships into a training corpus,
    count how many rows sit in QI-groups smaller than `k` (each such
    row is re-identifiable by joining the QI columns against an
    external dataset — the Sweeney linkage attack k-anonymity
    guards against).

    One row out: total rows, QI-group count, groups below k, rows at
    risk (in sub-k groups), the smallest group size, and the boolean
    verdict. NULL QI values are grouped as their own value (SQL
    groupBy semantics): "unknown ZIP" is itself a linkable attribute
    value, so rows sharing it legitimately anonymize each other.

    Scale: ONE hash aggregate on the QI columns (map-side combinable)
    + a group-count-sized summary aggregate — the same footprint as
    any distinct-count; no window, no self-join. At 100 TB the group
    frame is |distinct QI combos| rows, partition-parallel."""
    if not qi_cols:
        raise ValueError("qi_cols must name at least one column")
    missing = [c for c in qi_cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    groups = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    risky = F.col("_n") < k
    return groups.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(risky.cast("bigint")).alias("n_groups_below_k"),
        F.sum(F.when(risky, F.col("_n")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
        F.min("_n").alias("min_group_size"),
        (F.min("_n") >= k).alias("is_k_anonymous"),
        F.lit(k).alias("k"),
    )


def profile_diff(
    ref: DataFrame,
    cur: DataFrame,
    null_ppm_delta: int = 10_000,
    distinct_ratio: int = 2,
) -> DataFrame:
    """Compare two `table_profile` outputs — the ingest-contract check
    a pipeline runs on a NEW zone drop against the vetted reference
    profile, before any analytics touch it. Per column:

    - `schema_drift`: the column exists on only one side (the loudest
      failure: a loader dropped or invented a column);
    - `null_drift`: the null rate moved by more than `null_ppm_delta`
      parts-per-million (exact integer ppm, no float rates);
    - `distinct_drift`: cardinality-per-row moved by more than
      `distinct_ratio`x in either direction, tested by integer
      CROSS-MULTIPLICATION (d_cur·r_ref vs k·d_ref·r_cur — no
      division, exact at any scale);
    - `range_drift`: the current min/max escapes the reference range
      (per type kind — numeric, time, or string slot).

    Both inputs are column-count-sized relations, so the diff is a
    broadcastable ~n_cols-row full-outer join — free at any data
    scale; all flags are deterministic integer/boolean logic (oracle-
    gradeable if registered)."""
    r = ref.select(*[F.col(c).alias(f"r_{c}") for c in ref.columns])
    c_ = cur.select(*[F.col(c).alias(f"c_{c}") for c in cur.columns])
    j = r.join(
        c_,
        r["r_column_name"] == c_["c_column_name"],
        "full_outer",
    )
    present_ref = F.col("r_column_name").isNotNull()
    present_cur = F.col("c_column_name").isNotNull()
    both = present_ref & present_cur
    null_ppm_r = F.expr("r_n_nulls * 1000000 div r_n_rows")
    null_ppm_c = F.expr("c_n_nulls * 1000000 div c_n_rows")
    null_drift = both & (
        F.abs(null_ppm_c - null_ppm_r) > F.lit(null_ppm_delta)
    )
    k = F.lit(distinct_ratio)
    distinct_drift = both & (
        (
            F.col("c_n_distinct") * F.col("r_n_rows")
            > k * F.col("r_n_distinct") * F.col("c_n_rows")
        )
        | (
            F.col("r_n_distinct") * F.col("c_n_rows")
            > k * F.col("c_n_distinct") * F.col("r_n_rows")
        )
    )
    def _escapes(lo: str, hi: str) -> Column:
        return (
            (F.col(f"c_{lo}") < F.col(f"r_{lo}"))
            | (F.col(f"c_{hi}") > F.col(f"r_{hi}"))
        )

    range_drift = both & F.coalesce(
        _escapes("min_num", "max_num")
        | _escapes("min_us", "max_us")
        | _escapes("min_str", "max_str"),
        F.lit(False),
    )
    return j.select(
        F.coalesce(F.col("r_column_name"), F.col("c_column_name")).alias(
            "column_name"
        ),
        present_ref.alias("in_ref"),
        present_cur.alias("in_cur"),
        null_ppm_r.alias("null_ppm_ref"),
        null_ppm_c.alias("null_ppm_cur"),
        F.col("r_n_distinct").alias("n_distinct_ref"),
        F.col("c_n_distinct").alias("n_distinct_cur"),
        (~both).alias("schema_drift"),
        F.coalesce(null_drift, F.lit(False)).alias("null_drift"),
        F.coalesce(distinct_drift, F.lit(False)).alias("distinct_drift"),
        range_drift.alias("range_drift"),
    ).orderBy("column_name")
