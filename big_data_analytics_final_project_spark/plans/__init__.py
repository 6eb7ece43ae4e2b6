"""Plan inspection helpers — the engine's "did Catalyst do what we
designed for?" assertions, used by tests and by bench tuning.

The brief's scale checklist (pushdown reached the scan, dims went
broadcast, codegen spans are wide) becomes executable checks here
instead of eyeballing `.explain` output.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"expected a broadcast join in plan:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"unexpected cartesian product in plan:\n{plan}")


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Check a predicate reached the parquet scan (PushedFilters)."""
    plan = physical_plan(df)
    if "PushedFilters" not in plan or fragment not in plan:
        raise AssertionError(
            f"expected pushed filter containing {fragment!r} in plan:\n{plan}"
        )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the metric to
    minimize; tests pin upper bounds for key operators."""
    return physical_plan(df).count("Exchange")
