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
