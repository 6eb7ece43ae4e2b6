"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same shape at sf0.01). Strict equality —
any float drift is a bug in the query's numeric design, not noise."""

from __future__ import annotations

import os

import pytest

from big_data_analytics_final_project_spark.queries import all_queries

from .conftest import SF_SMOKE
from .parity import compare

SF_DIR = os.environ.get("PARITY_SF_DIR", SF_SMOKE)
SPECS = all_queries()
WITH_ORACLE = sorted(name for name, s in SPECS.items() if s.sql is not None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    result = spec.fn(spark, SF_DIR)
    oracle = duck.sql(spec.sql)
    compare(result, oracle)


def test_all_queries_have_entries():
    assert len(SPECS) >= 20
    no_oracle = [n for n, s in SPECS.items() if s.sql is None]
    # non-SQL-expressible ops are allowed, but must stay the exception
    assert len(no_oracle) <= max(2, len(SPECS) // 10), no_oracle
