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
    # Numeric values carry a type-class tag so an int result never
    # compares equal to a float/Decimal one (Python's 1 == 1.0 ==
    # Decimal(1) would otherwise mask engine type mismatches — e.g.
    # DuckDB HUGEINT vs Spark BIGINT, the round-2 driver hash-fails).
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, Decimal):
        if tol > 0:
            # mirror the float branch: tolerance-based comparisons
            # quantize Decimals the same way (the "dec" tag still keeps
            # them from comparing equal to a float column).
            return ("dec", round(float(v) / tol) * tol)
        return ("dec", v.normalize())
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        if tol > 0:
            return ("float", round(v / tol) * tol)
        return ("float", v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x, tol) for x in v)
    return v


def _numeric_class_spark(dtype) -> str | None:
    s = dtype.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "dec"
    return None


def _numeric_class_duck(dtype) -> str | None:
    s = str(dtype).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "int"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    if s.startswith("DECIMAL"):
        return "dec"
    if s in ("HUGEINT", "UBIGINT"):
        # Spark has no int128/uint64 — an oracle producing one (DuckDB's
        # SUM(int) yields HUGEINT) can never hash-match the Spark side.
        return "hugeint"
    return None


def compare_types(spark_df, duck_rel) -> None:
    """Assert every numeric column lands in the same type class
    (int / float / decimal) on both engines. Arrow-level hashing (the
    driver) distinguishes these even when Python values compare equal,
    so an oracle emitting HUGEINT against a Spark BIGINT is a latent
    driver hash-fail — catch it here."""
    duck_types = dict(zip(duck_rel.columns, duck_rel.types))
    for field in spark_df.schema.fields:
        if field.name not in duck_types:
            continue
        s_cls = _numeric_class_spark(field.dataType)
        d_cls = _numeric_class_duck(duck_types[field.name])
        if s_cls is None and d_cls is None:
            continue
        assert s_cls == d_cls, (
            f"type-class mismatch on '{field.name}': "
            f"spark={field.dataType.simpleString()} ({s_cls}) "
            f"duck={duck_types[field.name]} ({d_cls}) — "
            "cast the oracle (e.g. CAST(... AS BIGINT/DOUBLE)) to match"
        )


def compare(spark_df, duck_rel, tol: float = 0.0) -> None:
    """Assert spark result == duckdb result, order-insensitive,
    column-name-matched (sorted by name, like the driver)."""
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_rel.columns)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    compare_types(spark_df, duck_rel)

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
