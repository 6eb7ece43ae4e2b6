"""Plan inspection helpers — the engine's "did Catalyst do what we
designed for?" assertions, used by tests and by bench tuning.

The brief's scale checklist (pushdown reached the scan, dims went
broadcast, codegen spans are wide) becomes executable checks here
instead of eyeballing `.explain` output.
"""

from __future__ import annotations

import io
import re
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


def count_shuffles(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges (numbered `(n) Exchange` nodes in the
    formatted plan; BroadcastExchange excluded) — the metric to
    minimize; tests pin upper bounds for key operators."""
    return len(re.findall(r"\(\d+\) Exchange\b", physical_plan(df)))


def count_broadcasts(df: DataFrame) -> int:
    """Number of BroadcastExchange nodes in the physical plan."""
    return len(re.findall(r"\(\d+\) BroadcastExchange\b", physical_plan(df)))


def count_scans(df: DataFrame) -> int:
    """Number of parquet scan nodes (numbered nodes in the formatted
    plan, which lists every node twice — tree and detail section)."""
    return len(re.findall(r"\(\d+\) Scan parquet", physical_plan(df)))


def count_broadcast_hints(df: DataFrame) -> int:
    """Number of EXPLICIT broadcast hints (`ResolvedHint` nodes) in
    the analyzed logical plan. Distinct from `count_broadcasts`: AQE
    choosing a broadcast from runtime stats is adaptive and safe, but
    a FORCED hint on an unbounded-cardinality side is a 100 TB OOM no
    optimizer can undo — tests pin hint counts to the bounded-side
    joins that were designed to carry them."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", analyzed))


# Back-compat alias (previous name counted raw substring occurrences).
count_exchanges = count_shuffles
