"""Registry-wide plan lint: no query may plan a 100 TB anti-pattern
(cartesian, row-wise Python UDF, single-task window) unless it sits on
the reason-carrying allowlist in plans/lint.py. Plans only — nothing
executes — so the whole 130-query sweep stays cheap. This is the
global net under tests/test_plans.py's per-query pins: a NEW query
with a scale bug fails here on day one, before any verdict reads its
plan."""

from __future__ import annotations

from big_data_analytics_final_project_spark.plans.lint import (
    ALLOW,
    COLLECT_ALLOW,
    lint_collect_sites,
    lint_registry,
)
from big_data_analytics_final_project_spark.queries import all_queries

from .conftest import SF_SMOKE


def test_registry_plans_free_of_scale_antipatterns(spark):
    findings = lint_registry(spark, SF_SMOKE)
    bad = [f for f in findings if not f.allowed]
    assert not bad, [(f.query, f.check) for f in bad]


def test_allowlist_entries_still_needed(spark):
    """Every allowlist entry must still match a real finding — a stale
    entry would silently mask a future regression of the same kind on
    that query."""
    findings = lint_registry(spark, SF_SMOKE, names=set(ALLOW))
    hit = {(f.query, f.check) for f in findings if f.allowed}
    want = {(q, c) for q, checks in ALLOW.items() for c in checks}
    assert hit == want, f"stale allowlist entries: {want - hit}"


def test_allowlist_names_are_registered():
    assert set(ALLOW) <= set(all_queries())


def test_no_unallowlisted_driver_materialization():
    """Every `.collect()`/`.toPandas()`/`.head()`/`.first()` site in
    package source must carry an aggregate-boundedness reason in
    COLLECT_ALLOW — the plan linter can't see these (they run at build
    time on the driver), and an unbounded one is how a distributed
    operator degrades into a driver-side loop (round-7 verdict #5)."""
    findings = lint_collect_sites()
    bad = [f for f in findings if not f.allowed]
    assert not bad, [(f.file, f.function, f.line, f.call) for f in bad]


def test_collect_allowlist_entries_still_needed():
    """A stale COLLECT_ALLOW row would silently pre-approve a future
    materialization added to that (file, function)."""
    hit = {(f.file, f.function) for f in lint_collect_sites() if f.allowed}
    assert hit == set(COLLECT_ALLOW), (
        f"stale entries: {set(COLLECT_ALLOW) - hit}"
    )
