"""Spark-vs-DuckDB comparison helper — a local replica of the driver's
correctness gate (row count + column names + order-insensitive value
comparison), strict by default: exact equality, including float bits,
because the engine's numeric design (functions/numeric.py) promises
partitioning-independent doubles."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _canon(v, tol: float):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if tol > 0:
            return round(v / tol) * tol
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x, tol) for x in v)
    return v


def compare(spark_df, duck_rel, tol: float = 0.0) -> None:
    """Assert spark result == duckdb result, order-insensitive,
    column-name-matched (sorted by name, like the driver)."""
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_rel.columns)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"

    s_rows = [
        tuple(_canon(row[c], tol) for c in s_cols) for row in spark_df.collect()
    ]
    idx = [duck_rel.columns.index(c) for c in d_cols]
    d_rows = [
        tuple(_canon(row[i], tol) for i in idx) for row in duck_rel.fetchall()
    ]
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_sorted = sorted(s_rows, key=repr)
    d_sorted = sorted(d_rows, key=repr)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, f"row {i} differs:\n  spark={a}\n  duck ={b}"
