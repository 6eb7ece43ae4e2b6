"""r16 scan-allowance drains: `overlap_coeff_pairs` and the fuzzy
prefix-blocked query both stage their corpus-derived frame through ONE
eager localCheckpoint (the lm_train_score pattern that took documents
5→1 in r15). These pins hold the materialized single-scan posture
row-identical to the lazy multi-scan shape plan tooling sees — any
value drift the checkpoint introduces breaks here before the oracle
gate."""

from __future__ import annotations

from big_data_analytics_final_project_spark.operators.checkpoints import (
    lazy_results,
)
from big_data_analytics_final_project_spark.operators.dedup import (
    overlap_coeff_pairs,
)
from big_data_analytics_final_project_spark.queries.dedup import (
    OVERLAP_THRESHOLD,
    dedup_fuzzy_pairs_q,
)

from .conftest import SF_SMOKE


def test_overlap_lazy_twin_row_identical(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    mat = overlap_coeff_pairs(docs, threshold=OVERLAP_THRESHOLD).collect()
    with lazy_results():
        lazy = overlap_coeff_pairs(
            docs, threshold=OVERLAP_THRESHOLD
        ).collect()
    assert sorted(map(tuple, mat)) == sorted(map(tuple, lazy))
    assert mat, "empty relation would make the pin vacuous"


def test_fuzzy_lazy_twin_row_identical(spark):
    mat = dedup_fuzzy_pairs_q(spark, SF_SMOKE).collect()
    with lazy_results():
        lazy = dedup_fuzzy_pairs_q(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, mat)) == sorted(map(tuple, lazy))
    assert mat, "empty relation would make the pin vacuous"


def test_overlap_executed_scans_is_one(spark):
    """The r16 drain's physical contract, pinned per pytest run (not
    just per round-end audit): the materialized overlap operator reads
    the documents parquet exactly ONCE across ALL its executions —
    checkpoint fill included — and the result plan reads no parquet."""
    from big_data_analytics_final_project_spark.plans import (
        executed_scan_counts,
    )

    from .conftest import require_classic

    require_classic(spark)
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")

    def _run():
        df = overlap_coeff_pairs(docs, threshold=OVERLAP_THRESHOLD)
        df.collect()
        return df

    out, scans = executed_scan_counts(spark, _run)
    assert scans == {"documents": 1}, dict(scans)
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Scan parquet" not in plan, plan


def test_fuzzy_executed_scans_is_one(spark):
    """Same per-run pin for the fuzzy query's drain: one documents
    scan total (the slice-frame checkpoint fill), result plan
    parquet-free."""
    from big_data_analytics_final_project_spark.plans import (
        executed_scan_counts,
    )

    from .conftest import require_classic

    require_classic(spark)
    spark.catalog.clearCache()

    def _run():
        df = dedup_fuzzy_pairs_q(spark, SF_SMOKE)
        df.collect()
        return df

    out, scans = executed_scan_counts(spark, _run)
    assert scans == {"documents": 1}, dict(scans)
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Scan parquet" not in plan, plan


def test_collapsed_lazy_twin_row_identical(spark):
    """The r16 collapsed-drain differential: the two-checkpoint
    materialized posture must be value-identical to the lazy
    multi-scan shape, on the expand path the registered query runs."""
    from big_data_analytics_final_project_spark.operators.dedup import (
        jaccard_pairs_collapsed,
    )
    from big_data_analytics_final_project_spark.queries.dedup import (
        JACCARD_THRESHOLD,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    mat = jaccard_pairs_collapsed(
        docs, threshold=JACCARD_THRESHOLD, use_shingles=True
    ).collect()
    with lazy_results():
        lazy = jaccard_pairs_collapsed(
            docs, threshold=JACCARD_THRESHOLD, use_shingles=True
        ).collect()
    assert sorted(map(tuple, mat)) == sorted(map(tuple, lazy))
    assert mat, "empty relation would make the pin vacuous"


def test_collapsed_executed_scans_is_two(spark):
    """The collapsed drain's physical contract, pinned per pytest run:
    exactly TWO documents reads across all executions (the rep-frame
    fill + the member-mapping fill — the documented no-raw-text floor)
    and a parquet-free result plan."""
    from big_data_analytics_final_project_spark.plans import (
        executed_scan_counts,
    )
    from big_data_analytics_final_project_spark.queries.dedup import (
        dedup_jaccard_collapsed_q,
    )

    from .conftest import require_classic

    require_classic(spark)
    spark.catalog.clearCache()

    def _run():
        df = dedup_jaccard_collapsed_q(spark, SF_SMOKE)
        df.collect()
        return df

    out, scans = executed_scan_counts(spark, _run)
    assert scans == {"documents": 2}, dict(scans)
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Scan parquet" not in plan, plan


def test_collapsed_compact_path_single_fill(spark):
    """expand=False never builds the member mapping: ONE documents
    read (the rep-frame fill alone)."""
    from big_data_analytics_final_project_spark.operators.dedup import (
        jaccard_pairs_collapsed,
    )
    from big_data_analytics_final_project_spark.plans import (
        executed_scan_counts,
    )
    from big_data_analytics_final_project_spark.queries.dedup import (
        JACCARD_THRESHOLD,
    )

    from .conftest import require_classic

    require_classic(spark)
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")

    def _run():
        df = jaccard_pairs_collapsed(
            docs, threshold=JACCARD_THRESHOLD, use_shingles=True,
            expand=False,
        )
        df.collect()
        return df

    _, scans = executed_scan_counts(spark, _run)
    assert scans == {"documents": 1}, dict(scans)
