"""The streaming profile monitor (streaming/profile.py): the
maintained zone must agree with the batch `table_profile` — exactly on
every mergeable stat, within HLL error on distincts — and chunking
must cost NO accuracy (union-over-state == single-pass sketch,
register-for-register, so the estimates are IDENTICAL)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.profile import (
    table_profile,
)
from big_data_analytics_final_project_spark.sources import load_table
from big_data_analytics_final_project_spark.streaming import (
    EVENT_SCHEMA,
    read_event_stream,
)
from big_data_analytics_final_project_spark.streaming.profile import (
    fold_profile_batch,
    maintain_profile,
    read_profile,
)

from .conftest import SF_SMOKE

_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


@pytest.fixture(scope="module")
def streamed_zone(spark):
    root = tempfile.mkdtemp(prefix="stream_prof_")
    src = f"{root}/src"
    events = (
        load_table(spark, SF_SMOKE, "events")
        .select(*[f.name for f in EVENT_SCHEMA.fields])
        .withColumn(
            "_chunk", F.ntile(3).over(Window.orderBy("ts", "event_id"))
        )
    )
    for c in (1, 2, 3):
        events.filter(F.col("_chunk") == c).drop("_chunk").coalesce(
            1
        ).write.mode("append").parquet(src)
    zone = f"{root}/zone"
    q = (
        maintain_profile(
            read_event_stream(spark, src), zone, f"{root}/ckpt", _COLS
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    yield {"root": root, "zone": zone, "src": src}
    shutil.rmtree(root, ignore_errors=True)


def test_streamed_profile_matches_batch(spark, streamed_zone):
    batch = {
        r["column_name"]: r
        for r in table_profile(
            load_table(spark, SF_SMOKE, "events"), _COLS
        ).collect()
    }
    got = {
        r["column_name"]: r
        for r in read_profile(spark, streamed_zone["zone"]).collect()
    }
    assert set(got) == set(_COLS)
    for c in _COLS:
        b, g = batch[c], got[c]
        # mergeable stats: EXACT
        for f in (
            "n_rows",
            "n_nulls",
            "min_num",
            "max_num",
            "min_us",
            "max_us",
            "min_str",
            "max_str",
        ):
            assert g[f] == b[f], (c, f, g[f], b[f])
        # distinct: HLL estimate within 5% of exact (lgk=12)
        exact = b["n_distinct"]
        assert abs(g["n_distinct"] - exact) <= max(0.05 * exact, 2), (
            c,
            g["n_distinct"],
            exact,
        )


def test_chunking_stays_inside_the_sketch_error_bound(spark, streamed_zone):
    """Folding the WHOLE event log as one batch vs the 3-chunk
    streamed zone: estimates may differ slightly (sparse-mode chunk
    sketches promote on union — module docstring), but BOTH must sit
    within the lgk=12 error bound of each other and of exact (checked
    against exact in the companion test)."""
    root = streamed_zone["root"]
    whole_zone = f"{root}/zone_whole"
    events = load_table(spark, SF_SMOKE, "events")
    fold_profile_batch(events, 0, whole_zone, _COLS)
    streamed = {
        r["column_name"]: r["n_distinct"]
        for r in read_profile(spark, streamed_zone["zone"]).collect()
    }
    whole = {
        r["column_name"]: r["n_distinct"]
        for r in read_profile(spark, whole_zone).collect()
    }
    assert set(streamed) == set(whole)
    for c, est in whole.items():
        assert abs(streamed[c] - est) <= max(0.05 * est, 2), (
            c,
            streamed[c],
            est,
        )


def test_retry_is_noop(spark, streamed_zone):
    zone = streamed_zone["zone"]
    before = sorted(
        map(tuple, read_profile(spark, zone).collect())
    )
    zone_df = spark.read.parquet(zone)
    bmax = zone_df.agg(F.max("last_batch_id")).collect()[0][0]
    some_events = load_table(spark, SF_SMOKE, "events").limit(50)
    fold_profile_batch(some_events, bmax, zone, _COLS)
    after = sorted(map(tuple, read_profile(spark, zone).collect()))
    assert after == before
