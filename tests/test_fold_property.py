"""Property test for the shared retry-guarded zone fold
(streaming/fold.py): under ARBITRARY at-least-once delivery schedules
— every batch delivered once in order, plus hypothesis-chosen
re-deliveries of earlier batches interleaved afterward — the zone
must equal the clean once-each fold (which itself must equal a pure
dict reference). This is the exactly-once-effective contract all
three streaming monitors inherit."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.streaming.fold import (
    retry_guarded_fold,
)

# batches: list of batches; each batch is a list of (key, value) rows.
# Keys overlap across batches so merges genuinely accumulate.
_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=5,
    ),
    min_size=1,
    max_size=4,
)


@given(
    data=_batches,
    redeliver=st.lists(
        st.integers(min_value=0, max_value=3), min_size=0, max_size=3
    ),
)
@settings(
    max_examples=6,  # each example folds two real parquet zones
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_redelivery_never_changes_the_zone(spark, data, redeliver):
    def fold_schedule(schedule, zone):
        for bid in schedule:
            rows = data[bid]
            partial = (
                spark.createDataFrame(rows, "k: bigint, v: bigint")
                .groupBy("k")
                .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n"))
            )
            retry_guarded_fold(
                partial,
                bid,
                zone,
                key_cols=["k"],
                partition_by=["k"],
                merge_aggs=lambda: [
                    F.sum("v").alias("v"),
                    F.sum("n").alias("n"),
                ],
            )

    def zone_state(zone):
        return {
            r["k"]: (r["v"], r["n"])
            for r in spark.read.parquet(zone).collect()
        }

    root = tempfile.mkdtemp(prefix="fold_prop_")
    try:
        clean, noisy = f"{root}/clean", f"{root}/noisy"
        once = list(range(len(data)))
        fold_schedule(once, clean)
        # re-deliveries reference only batches that were delivered
        replays = [b for b in redeliver if b < len(data)]
        fold_schedule(once + replays, noisy)
        want = {}
        for rows in data:
            for k, v in rows:
                pv, pn = want.get(k, (0, 0))
                want[k] = (pv + v, pn + 1)
        assert zone_state(clean) == want
        assert zone_state(noisy) == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_crashed_first_write_self_heals(spark):
    """A crashed FIRST write leaves the zone dir holding only
    _temporary/ attempt debris. The fold must treat that as 'no zone
    yet' and degrade to a plain first write — a bare fs.exists probe
    would route every retry into reading an empty parquet zone and
    wedge the stream permanently (the upsert_zone self-heal case,
    now shared via sinks.has_committed_files)."""
    import os

    root = tempfile.mkdtemp(prefix="fold_crash_")
    try:
        zone = f"{root}/zone"
        debris = f"{zone}/_temporary/0/task_0"
        os.makedirs(debris)
        with open(f"{debris}/part-00000.parquet", "wb") as f:
            f.write(b"not a parquet file")
        partial = (
            spark.createDataFrame([(1, 5), (2, 7)], "k: bigint, v: bigint")
            .groupBy("k")
            .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n"))
        )
        retry_guarded_fold(
            partial,
            0,
            zone,
            key_cols=["k"],
            partition_by=["k"],
            merge_aggs=lambda: [F.sum("v").alias("v"), F.sum("n").alias("n")],
        )
        got = {
            r["k"]: (r["v"], r["n"])
            for r in spark.read.parquet(zone).collect()
        }
        assert got == {1: (5, 1), 2: (7, 1)}
    finally:
        shutil.rmtree(root, ignore_errors=True)
