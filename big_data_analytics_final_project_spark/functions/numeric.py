"""Numeric helpers with cross-engine deterministic semantics.

Floating-point SUM is order-dependent, and Spark's aggregation order
(partition layout, AQE coalescing) is not the oracle's. The reference
sidesteps this by rounding to 2dp (reference spark_analysis.py:75,99);
we go further: route every money/measure SUM through an exact DECIMAL
accumulator and only then cast back to double. The resulting double is
bit-identical no matter the partitioning — which is also what makes the
result stable between a 32-thread local run and a 1000-executor
cluster. Scalar +,-,*,/ on identical doubles are IEEE-deterministic and
need no such treatment.

Pearson correlation (reference hand-rolls it at
integrated_query_engagement_vs_spend.py:121-133) is likewise built from
decimal moment sums so the final double is partitioning-independent,
instead of using `F.corr` whose accumulation order varies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38-digit decimal with 6 fractional digits: enough headroom to sum
# ~1e31 money units exactly — does not overflow at 100 TB scale.
DEC = "decimal(38,6)"
# Wider fraction for second-moment sums (products of measures).
DEC_HI = "decimal(38,10)"


def exact_sum(col: Column | str, alias: str) -> Column:
    """SUM with an exact decimal accumulator, returned as double.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def exact_sum_hi(col: Column | str, alias: str) -> Column:
    """Exact sum at 10 fractional digits (for x*y second moments)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC_HI)).cast("double").alias(alias)


def guarded_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """num/den with a zero-denominator guard (reference FN-3,
    integrated_query_engagement_vs_spend.py:196-198)."""
    return F.when(den > 0, num / den).otherwise(F.lit(default))


def corr_components(x: Column, y: Column) -> list[Column]:
    """Decimal moment sums for a deterministic Pearson correlation.

    Inputs are first snapped to DECIMAL(18,6); the second moments are
    then exact decimal×decimal products — casting the *double product*
    would re-round differently per engine at the last decimal.
    """
    dec = "decimal(18,6)"
    xd, yd = x.cast(dec), y.cast(dec)
    return [
        F.count(F.lit(1)).alias("_n"),
        F.sum(xd).cast("double").alias("_sx"),
        F.sum(yd).cast("double").alias("_sy"),
        F.sum(xd * xd).cast("double").alias("_sxx"),
        F.sum(yd * yd).cast("double").alias("_syy"),
        F.sum(xd * yd).cast("double").alias("_sxy"),
    ]


def corr_from_components(alias: str) -> Column:
    """Assemble Pearson r from `corr_components` output columns.

    Degenerate inputs (n<2 or zero variance) yield 0.0, matching the
    reference's guard (integrated_query_engagement_vs_spend.py:127-133)
    rather than SQL NULL.
    """
    n = F.col("_n").cast("double")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    varx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vary = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    return (
        F.when((F.col("_n") < 2) | (varx <= 0) | (vary <= 0), F.lit(0.0))
        .otherwise(num / F.sqrt(varx * vary))
        .alias(alias)
    )


def corr_components_sql(x: str, y: str) -> str:
    """DuckDB fragment mirroring `corr_components` (same snapped values,
    same final double arithmetic → bit-identical r).

    DECIMAL(19,6) — not (18,6) as on the Spark side — because DuckDB
    multiplies DECIMAL(18) operands in int64 (overflows for values
    ≥ ~3e3 at scale 6) while DECIMAL(19) takes the int128 path. The
    snapped value is identical either way; both engines' products
    ((37,12) in Spark, (38,12) here) are exact, so the moment sums
    agree bit-for-bit after the double cast."""
    xd = f"CAST({x} AS DECIMAL(19,6))"
    yd = f"CAST({y} AS DECIMAL(19,6))"
    return (
        f"count(*) AS _n, "
        f"{dec2dbl_sql(f'SUM({xd})')} AS _sx, "
        f"{dec2dbl_sql(f'SUM({yd})')} AS _sy, "
        f"{dec2dbl_sql(f'SUM({xd} * {xd})')} AS _sxx, "
        f"{dec2dbl_sql(f'SUM({yd} * {yd})')} AS _syy, "
        f"{dec2dbl_sql(f'SUM({xd} * {yd})')} AS _sxy"
    )


CORR_FROM_COMPONENTS_SQL = (
    "CASE WHEN _n < 2 "
    "OR CAST(_n AS DOUBLE) * _sxx - _sx * _sx <= 0 "
    "OR CAST(_n AS DOUBLE) * _syy - _sy * _sy <= 0 "
    "THEN 0.0 ELSE "
    "(CAST(_n AS DOUBLE) * _sxy - _sx * _sy) / "
    "sqrt((CAST(_n AS DOUBLE) * _sxx - _sx * _sx) * "
    "(CAST(_n AS DOUBLE) * _syy - _sy * _sy)) END"
)


def dec2dbl_sql(expr: str) -> str:
    """Correctly-rounded decimal→double cast for DuckDB oracles.

    DuckDB's direct DECIMAL→DOUBLE cast is not correctly rounded (it
    can be off by one ulp, e.g. 104482822977.605100000000 →
    ...60509 instead of ...6051); Spark's (BigDecimal.doubleValue) is.
    Routing through VARCHAR uses DuckDB's correctly-rounded string
    parser, matching Spark bit-for-bit."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def exact_sum_sql(expr: str, alias: str) -> str:
    """Oracle twin of `exact_sum` as a SQL fragment."""
    return f"{dec2dbl_sql(f'SUM(CAST({expr} AS DECIMAL(38,6)))')} AS {alias}"
