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


def test_approx_count_distinct_within_hll_bound(spark):
    """The HLL++ sketch (the mergeable 100 TB answer for distinct
    counts) must track the exact daily_active_users result within its
    configured relative standard deviation (rsd 0.05, tested at 5σ —
    a deterministic bound in practice since the sketch is seedless)."""
    from pyspark.sql import functions as F

    from big_data_analytics_final_project_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    both = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
        )
        .collect()
    )
    assert both
    for r in both:
        assert abs(r["approx"] - r["exact"]) <= max(0.25 * r["exact"], 5), (
            r["day"],
            r["exact"],
            r["approx"],
        )


def test_approx_percentile_within_accuracy_bound(spark):
    """percentile_approx (the single-pass mergeable answer at 100 TB,
    where exact `percentile` must buffer each group's values) must land
    within its accuracy parameter's rank error of the exact threshold
    the integrated segmentation uses (AGG-10). With accuracy=10000 the
    rank error is n/10000 — at test scale that means the approx result
    must fall between neighboring order statistics of the exact rank."""
    from pyspark.sql import functions as F

    from big_data_analytics_final_project_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    n_groups = per_user.count()
    # rank error: 1/accuracy from the sketch + 1 order statistic because
    # approx returns a realized value while exact interpolates
    slack = 1.0 / n_groups + 1.0 / 10000
    lo_q, hi_q = max(0.0, 0.75 - slack), min(1.0, 0.75 + slack)
    row = per_user.agg(
        F.expr(f"CAST(percentile(n, {lo_q}) AS DOUBLE)").alias("lo"),
        F.expr(f"CAST(percentile(n, {hi_q}) AS DOUBLE)").alias("hi"),
        F.expr("CAST(percentile_approx(n, 0.75, 10000) AS DOUBLE)").alias("approx"),
    ).collect()[0]
    assert row["lo"] - 1e-9 <= row["approx"] <= row["hi"] + 1e-9, (row, n_groups)


def test_all_queries_have_entries():
    assert len(SPECS) >= 20
    no_oracle = [n for n, s in SPECS.items() if s.sql is None]
    # non-SQL-expressible ops are allowed, but must stay the exception
    assert len(no_oracle) <= max(2, len(SPECS) // 10), no_oracle


def test_split_assign_partitions_the_corpus(spark):
    """The frozen split must PARTITION the corpus: per-source doc and
    char totals across train/val/test equal the direct totals (no doc
    lost or double-assigned), and the global train share sits near the
    designed 80% (hash uniformity; loose bound, small-sample noise)."""
    from pyspark.sql import functions as F

    from big_data_analytics_final_project_spark.queries.curation import (
        corpus_split_assign,
    )
    from big_data_analytics_final_project_spark.sources import load_table

    out = corpus_split_assign(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    direct = {
        r["source"]: (r["n"], r["chars"])
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
        )
        .collect()
    }
    per_source: dict[str, list[int]] = {}
    total = {"train": 0, "val": 0, "test": 0}
    for r in out:
        agg = per_source.setdefault(r["source"], [0, 0])
        agg[0] += r["n_docs"]
        agg[1] += r["sum_chars"]
        total[r["split"]] += r["n_docs"]
    assert {s: tuple(v) for s, v in per_source.items()} == direct
    n_all = sum(total.values())
    assert 0.70 <= total["train"] / n_all <= 0.90, total


def test_mix_plan_shares_normalize_and_flatten(spark):
    """Mixing-plan invariants: both share columns sum to 1; the
    temperature reweighting FLATTENS the distribution (largest source
    is down-weighted relative to its natural share, smallest is
    up-weighted — boost ordering inverse to size); budget_epochs is
    consistent with its definition."""
    from big_data_analytics_final_project_spark.queries.curation import (
        corpus_mix_plan,
    )

    rows = corpus_mix_plan(spark, SF_DIR).collect()
    assert abs(sum(r["natural_share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["mix_share"] for r in rows) - 1.0) < 1e-9
    biggest = max(rows, key=lambda r: r["n_chars_total"])
    smallest = min(rows, key=lambda r: r["n_chars_total"])
    assert biggest["boost"] < 1.0 < smallest["boost"], (biggest, smallest)
    for r in rows:
        assert (
            abs(
                r["budget_epochs"]
                - 1e9 * r["mix_share"] / r["n_chars_total"]
            )
            < 1e-9
        )
