"""Priority sampling (operators/sampling.py): the Duffield-Lund-Thorup
weighted sample's deterministic contract — exact top-k by the md5
race, estimator weights max(w, tau), degenerate exactness when the
population fits in k — plus the r9-slated `doc_weighted_sample`
query's full oracle parity (bit-exact doubles: the priority uses only
correctly-rounded IEEE multiply/divide, no libm)."""

from __future__ import annotations

import hashlib

from big_data_analytics_final_project_spark.operators.sampling import (
    priority_sample,
    priority_sample_sql,
)

_U32 = 4294967296.0


def _ref_priority(doc_id, w, salt=":psample"):
    h = int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8], 16)
    return float(w) * _U32 / (h + 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_sample_is_exact_topk_by_priority(spark):
    rows = [(i, (i % 7) + 1) for i in range(200)]
    got = priority_sample(_mk(spark, rows), "w", 20).collect()
    assert len(got) == 20
    ref = sorted(
        ((_ref_priority(i, w), i, w) for i, w in rows), reverse=True
    )
    want_ids = {i for _, i, _ in ref[:20]}
    assert {r.doc_id for r in got} == want_ids
    tau = ref[20][0]
    for r in got:
        assert r.priority == _ref_priority(r.doc_id, r.w)
        assert r.est_weight == max(float(r.w), tau)


def test_estimator_weights_never_below_true_weight(spark):
    rows = [(i, 1 + (i * 37) % 100) for i in range(500)]
    got = priority_sample(_mk(spark, rows), "w", 50).collect()
    taus = {r.est_weight for r in got if r.est_weight != float(r.w)}
    # one global tau: every adjusted weight is the same threshold
    assert len(taus) <= 1
    for r in got:
        assert r.est_weight >= float(r.w)


def test_degenerates_to_population_when_small(spark):
    """Fewer positive-weight rows than k: all return, est_weight == w
    exactly (tau = 0), and zero/NULL/negative weights are excluded."""
    rows = [(1, 5), (2, 3), (3, 0), (4, -2), (5, None)]
    got = {
        r.doc_id: r.est_weight
        for r in priority_sample(_mk(spark, rows), "w", 10).collect()
    }
    assert got == {1: 5.0, 2: 3.0}


def test_inclusion_tracks_weight(spark):
    """A 1000x-weight item is drawn with near-certainty: P(miss) =
    (1 - p)^... effectively zero under the md5 race — and across 5
    disjoint salt runs the heavy item appears every time while any
    FIXED light item does not (weights really steer inclusion)."""
    rows = [(0, 100000)] + [(i, 10) for i in range(1, 400)]
    df = _mk(spark, rows)
    heavy_hits = 0
    light_ids = []
    for s in range(5):
        ids = {
            r.doc_id
            for r in priority_sample(
                df, "w", 20, salt=f":inc{s}"
            ).collect()
        }
        heavy_hits += 0 in ids
        light_ids.append(ids - {0})
    assert heavy_hits == 5
    # some light id missed by at least one run (all-runs agreement on
    # 19-of-399 uniform picks has probability ~0)
    assert set.intersection(*light_ids) == set() or len(
        set.union(*light_ids)
    ) > max(len(s) for s in light_ids)


def test_oracle_parity(spark):
    """Registry bar for the r9-slated `doc_weighted_sample`
    (queries/curation.py): bit-exact Spark==DuckDB at both scales,
    doubles included."""
    import duckdb

    from big_data_analytics_final_project_spark.queries.curation import (
        _doc_weighted_sample_sql,
        doc_weighted_sample,
    )

    from .conftest import SF_CORRECT, SF_SMOKE
    from .parity import compare

    for sf in (SF_SMOKE, SF_CORRECT):
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        compare(doc_weighted_sample(spark, sf), con.sql(_doc_weighted_sample_sql()))
        con.close()


def test_sql_twin_matches_operator_on_synthetic(spark, tmp_path):
    """The exported oracle builder agrees with the operator on a frame
    with duplicate weights and adversarial sizes (k+1 boundary)."""
    import duckdb

    from .parity import compare

    rows = [(i, 7) for i in range(12)]  # all-equal weights: race only
    df = _mk(spark, rows)
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    got = priority_sample(df, "w", 11, id_col="doc_id").orderBy("doc_id")
    compare(
        got,
        con.sql(
            priority_sample_sql("t", "w", 11, select_cols="doc_id, w")
        ),
    )
    con.close()
