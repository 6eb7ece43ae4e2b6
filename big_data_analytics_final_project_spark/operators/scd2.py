"""Type-2 slowly-changing-dimension collapse: a change log becomes
validity intervals.

Every warehouse keeps history this way: given observations
(key, ts, attributes...), emit one row per maximal period during which
the key's attributes were unchanged — valid_from / valid_to (exclusive,
NULL while current) / is_current / n_observations. The reference has
nothing like it (its dimensions are static snapshots); at training-data
scale the same shape tracks document-license changes, source-domain
recrawls, and label revisions, where "what was true at time T" decides
what a cutoff-dated corpus may contain.

Formulation: the gaps-and-islands pattern generalized to a multi-column
change predicate — a null-safe lag comparison marks attribute changes,
a running ROWS-frame sum numbers versions, one hash aggregate collapses
each version, and a lead() over the collapsed frame chains valid_to to
the next version's valid_from (so intervals tile the key's timeline
with no gaps by construction).

Scale: the change-flag window, the version-numbering window, AND the
collapse aggregate share ONE partitioning (the key columns) — a single
shuffle for the heavy pass. The valid_to window runs on the collapsed
frame (one row per version, typically orders of magnitude smaller) and
reuses the same partitioning. Deterministic for any partitioning when
(ts, tiebreak) is unique per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a change log into type-2 validity intervals.

    Returns one row per (key, version): the key columns, the attribute
    columns, ``version`` (1-based, contiguous per key), ``valid_from``
    (first observation of the version), ``valid_to`` (the NEXT
    version's valid_from — exclusive end; NULL on the current
    version), ``is_current``, and ``n_observations``.
    """
    if not attr_cols:
        raise ValueError("attr_cols must name at least one tracked column")
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    changed: Column = F.lit(False)
    for a in attr_cols:
        # eqNullSafe: NULL->value and value->NULL are real changes,
        # NULL->NULL is not; the first row's lag() is NULL-row and
        # must open version 1
        changed = changed | ~F.lag(F.col(a)).over(w).eqNullSafe(F.col(a))
    # row_number (not a lag-is-null probe) opens version 1: a NULL ts
    # or all-NULL attrs on the first observation must still start a
    # version, and lag(anything) being NULL can't distinguish "first
    # row" from "previous value was NULL"
    first_row = F.row_number().over(w) == 1
    chg = F.when(first_row | changed, 1).otherwise(0)

    versioned = df.withColumn("version", F.sum(chg).over(run))
    collapsed = versioned.groupBy(
        *key_cols, "version", *attr_cols
    ).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_observations"),
    )
    w_ver = Window.partitionBy(*key_cols).orderBy("version")
    return collapsed.withColumn(
        "valid_to", F.lead("valid_from").over(w_ver)
    ).withColumn("is_current", F.col("valid_to").isNull())
