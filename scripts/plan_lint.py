#!/usr/bin/env python
"""Sweep every registered query's physical plan for 100 TB
anti-patterns (cartesian products, row-wise Python UDFs, single-task
windows). Plans only — nothing executes. Exit 1 on any finding not on
the reason-carrying allowlist (plans/lint.py).

    python scripts/plan_lint.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_analytics_final_project_spark import get_session
from big_data_analytics_final_project_spark.plans.lint import lint_registry


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = set(args[1:]) or None
    spark = get_session(
        app_name="plan-lint", extra_conf={"spark.ui.enabled": "false"}
    )
    findings = lint_registry(spark, sf_dir, names)
    bad = [f for f in findings if not f.allowed]
    for f in findings:
        tag = "ALLOW" if f.allowed else "FAIL "
        why = f" — {f.reason}" if f.reason else ""
        print(f"{tag} {f.query}: {f.check}{why}")
    print(
        f"\n{len(bad)} violations, "
        f"{sum(1 for f in findings if f.allowed)} allowlisted"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
