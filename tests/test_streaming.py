"""Structured Streaming surface tests.

Drives the real streaming path end-to-end: parquet file-drop source
(3 chronological chunks, 1 file per micro-batch), watermarked
event-time aggregation, and the foreachBatch sink — then checks the
streamed result against the identical batch computation (Spark's
unified model: same expressions, two execution modes).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.sessionize import sessionize
from big_data_analytics_final_project_spark.sources import load_table
from big_data_analytics_final_project_spark.streaming import (
    EVENT_SCHEMA,
    deduped_stream,
    purchase_click_join_stream,
    read_event_stream,
    sessionized_stream,
    tumbling_counts,
    write_foreach_batch,
)
from big_data_analytics_final_project_spark.streaming.stateful import (
    stateful_sessionize,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stream_dirs(spark):
    """Source dir with events split into 3 chronological parquet drops
    (micro-batch analog of the reference's chunked sessions_*.json,
    data_generator.py:241-248), plus scratch dirs for sink/checkpoint."""
    root = tempfile.mkdtemp(prefix="stream_test_")
    src = f"{root}/src"
    events = (
        load_table(spark, SF_SMOKE, "events")
        .select(*[f.name for f in EVENT_SCHEMA.fields])
        .withColumn("_chunk", F.ntile(3).over(Window.orderBy("ts", "event_id")))
    )
    for c in (1, 2, 3):
        events.filter(F.col("_chunk") == c).drop("_chunk").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    yield {"root": root, "src": src}
    shutil.rmtree(root, ignore_errors=True)


def test_tumbling_stream_matches_batch(spark, stream_dirs):
    """Streamed watermarked tumbling counts == the same aggregation run
    in batch over the same files."""
    stream = read_event_stream(spark, stream_dirs["src"])
    q = (
        tumbling_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_test")
        .option("checkpointLocation", f"{stream_dirs['root']}/ckpt_tumbling")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
        ).collect()
    }
    assert got == want


def test_sliding_stream_matches_batch(spark, stream_dirs):
    """The 2h/1h sliding window (events_sliding_2h's expression) is
    streaming-shared: watermarked incremental execution produces the
    same windows as the batch run over the same files."""
    stream = read_event_stream(spark, stream_dirs["src"])
    windowed = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    q = (
        windowed.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sliding_test")
        .option("checkpointLocation", f"{stream_dirs['root']}/ckpt_sliding")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = {
        (r["window_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM sliding_test").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    want = {
        (r["window_start"], r["n_events"])
        for r in (
            batch.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "n_events")
        ).collect()
    }
    assert got == want


def test_foreach_batch_sink_appends_all_rows(spark, stream_dirs):
    """foreachBatch parquet sink (the SNK-1 batched-put analog) lands
    every filtered row exactly once across micro-batches."""
    out = f"{stream_dirs['root']}/out"
    stream = read_event_stream(spark, stream_dirs["src"]).where(
        F.col("event_type") == "purchase"
    )
    q = (
        write_foreach_batch(stream, out, f"{stream_dirs['root']}/ckpt_feb")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = spark.read.parquet(f"{out}/batch=*").count()
    want = (
        spark.read.schema(EVENT_SCHEMA)
        .parquet(stream_dirs["src"])
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert want > 0 and got == want


def test_stateful_sessionize_matches_batch(spark, stream_dirs):
    """applyInPandasWithState sessionizer: every emitted (closed)
    session must be byte-identical to the batch gaps-and-islands
    result, and every session that a later event closes (all but each
    user's final session) MUST have been emitted."""
    gap_s = 1800
    stream = read_event_stream(spark, stream_dirs["src"])
    q = (
        stateful_sessionize(stream, gap_seconds=gap_s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_session_test")
        .option("checkpointLocation", f"{stream_dirs['root']}/ckpt_stateful")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            round(r["duration_s"], 6),
        )
        for r in spark.sql("SELECT * FROM stateful_session_test").collect()
    }

    batch_events = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    batch = sessionize(
        batch_events, gap_seconds=gap_s, tiebreak_col="event_id"
    ).collect()
    want = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            round(r["duration_s"], 6),
        )
        for r in batch
    }
    # emitted ⊆ batch, values identical
    assert got, "no sessions were emitted"
    for key, val in got.items():
        assert key in want and want[key] == val, f"mismatch for {key}"
    # completeness: non-final sessions are always closed by a successor
    last_start = {}
    for r in batch:
        key = r["user_id"]
        if key not in last_start or r["session_start"] > last_start[key]:
            last_start[key] = r["session_start"]
    non_final = {k for k in want if k[1] != last_start[k[0]]}
    missing = non_final - set(got)
    assert not missing, f"{len(missing)} successor-closed sessions not emitted"


def test_stateful_sessionize_multi_chunk_groups(spark, stream_dirs):
    """With a tiny Arrow batch size, one group's rows arrive as MANY
    pandas chunks (in no particular order); the fold must concat+sort
    before folding or sessions merge wrongly. Emitted sessions still
    match the batch sessionizer exactly."""
    gap_s = 1800
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "3")
    try:
        stream = read_event_stream(spark, stream_dirs["src"])
        q = (
            stateful_sessionize(stream, gap_seconds=gap_s)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("stateful_chunked_test")
            .option(
                "checkpointLocation", f"{stream_dirs['root']}/ckpt_chunked"
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            round(r["duration_s"], 6),
        )
        for r in spark.sql("SELECT * FROM stateful_chunked_test").collect()
    }
    batch_events = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    want = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            round(r["duration_s"], 6),
        )
        for r in sessionize(
            batch_events, gap_seconds=gap_s, tiebreak_col="event_id"
        ).collect()
    }
    assert got, "no sessions were emitted"
    for k, v in got.items():
        assert k in want and want[k] == v, f"mismatch for {k}"


def test_deduped_stream_drops_redelivery(spark, stream_dirs):
    """An at-least-once source (every chunk delivered twice, in
    separate micro-batches) must land each event_id exactly once
    through dropDuplicatesWithinWatermark."""
    root = stream_dirs["root"]
    dup_src = f"{root}/dup_src"
    base = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    for _ in range(2):  # same rows twice = re-delivery
        base.coalesce(1).write.mode("append").parquet(dup_src)
    stream = read_event_stream(spark, dup_src)
    q = (
        deduped_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_test")
        .option("checkpointLocation", f"{root}/ckpt_dedup")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS nd FROM dedup_stream_test"
    ).collect()[0]
    want = base.select("event_id").distinct().count()
    assert got["n"] == got["nd"] == want


def test_stream_stream_join_matches_batch(spark, stream_dirs):
    """Watermarked stream-stream interval self-join lands exactly the
    pairs the identical batch join produces over the same files."""
    stream = read_event_stream(spark, stream_dirs["src"])
    q = (
        purchase_click_join_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_test")
        .option("checkpointLocation", f"{stream_dirs['root']}/ckpt_ssjoin")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = {
        (r["purchase_event_id"], r["click_event_id"])
        for r in spark.sql("SELECT * FROM ss_join_test").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    want = {
        (r["purchase_event_id"], r["click_event_id"])
        for r in purchase_click_join_stream(batch).collect()
    }
    assert want, "batch twin produced no pairs — fixture too sparse"
    assert got == want


def test_continuous_hourly_rollup(spark, stream_dirs):
    """The streaming-maintained rollup zone must equal the batch
    hourly aggregate over the same files, and re-folding an already
    -applied batch (foreachBatch retry semantics) must change nothing."""
    from big_data_analytics_final_project_spark.streaming.rollup import (
        fold_hourly_batch,
        maintain_hourly_rollup,
        read_hourly_rollup,
    )

    root = stream_dirs["root"]
    zone = f"{root}/rollup_zone"
    stream = read_event_stream(spark, stream_dirs["src"])
    q = (
        maintain_hourly_rollup(stream, zone, f"{root}/ckpt_rollup")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"

    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    want = {
        (r["hour"], r["n_events"], round(r["sum_value"], 6))
        for r in (
            batch.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(38,6)"))
                .cast("double")
                .alias("sum_value"),
            )
        ).collect()
    }
    got = {
        (r["hour"], r["n_events"], round(r["sum_value"], 6))
        for r in read_hourly_rollup(spark, zone).collect()
    }
    assert got == want

    # retry of the LAST batch id must be a no-op (idempotent merge):
    # re-deliver rows for exactly the hours that batch last touched
    zone_df = spark.read.parquet(zone)
    bmax = zone_df.agg(F.max("last_batch_id")).collect()[0][0]
    hours_b = [
        r["hour"]
        for r in zone_df.filter(F.col("last_batch_id") == bmax)
        .select("hour")
        .collect()
    ]
    retry_rows = batch.filter(
        F.date_trunc("hour", F.col("ts")).isin(hours_b)
    )
    assert retry_rows.take(1), "retry fixture is empty"
    fold_hourly_batch(retry_rows, bmax, zone)
    again = {
        (r["hour"], r["n_events"], round(r["sum_value"], 6))
        for r in read_hourly_rollup(spark, zone).collect()
    }
    assert again == want


def test_stream_static_join_matches_batch(spark, stream_dirs):
    """Stream-static dim join: each micro-batch joins the (broadcast)
    static customer dim — no state store involved, the streaming twin
    of every fact→dim join in the batch surface. Streamed result must
    equal the batch join over the same files."""
    static_dim = (
        load_table(spark, SF_SMOKE, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            "c_mktsegment",
        )
    )
    stream = read_event_stream(spark, stream_dirs["src"])
    joined = (
        stream.join(F.broadcast(static_dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        joined.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_static_test")
        .option("checkpointLocation", f"{stream_dirs['root']}/ckpt_sstatic")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = {
        (r["c_mktsegment"], r["n_events"])
        for r in spark.sql("SELECT * FROM stream_static_test").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    want = {
        (r["c_mktsegment"], r["n_events"])
        for r in (
            batch.join(F.broadcast(static_dim), "user_id")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_events"))
        ).collect()
    }
    assert want and got == want


def test_session_window_stream_smoke(spark, stream_dirs):
    """session_window sessionization runs incrementally and yields
    per-user sessions with the declared schema."""
    stream = read_event_stream(spark, stream_dirs["src"])
    q = (
        sessionized_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_test")
        .option("checkpointLocation", f"{stream_dirs['root']}/ckpt_session")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    rows = spark.sql("SELECT * FROM session_test")
    assert rows.columns == [
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        "sum_value",
    ]
    assert rows.count() > 0


def test_transform_with_state_profile_matches_batch(spark, stream_dirs):
    """transformWithStateInPandas (the Spark-4 stateful API) lifetime
    profile: after the chunked stream drains, each user's LATEST
    emitted row must equal the batch aggregate over the same files
    bit-for-bit — the integer micro-unit totals make the running sum
    independent of how the stream was chunked."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState needs the protobuf state-server "
        "protocol; not shipped in this container (env-blocked, like "
        "the media codecs) — runs on any real cluster. Installing it "
        "was considered (round-6 review) and rejected: this sandbox's "
        "policy prohibits pip/apt installs, so the gap is closable "
        "only where the dependency is already present. The fold logic "
        "itself is unit-tested against a fake handle above.",
    )
    from big_data_analytics_final_project_spark.streaming.tws import (
        user_profile_stream,
    )

    stream = read_event_stream(spark, stream_dirs["src"])
    q = (
        user_profile_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_profile_test")
        .option("checkpointLocation", f"{stream_dirs['root']}/ckpt_tws")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    emitted = spark.sql("SELECT * FROM tws_profile_test").collect()
    # latest emission per user = the row with the largest n_events
    got = {}
    for r in emitted:
        cur = got.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            got[r["user_id"]] = (
                r["n_events"],
                r["n_purchases"],
                r["sum_value_q"],
                r["first_us"],
                r["last_us"],
            )

    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    want = {
        r["user_id"]: (
            r["n_events"],
            r["n_purchases"],
            r["sum_value_q"],
            r["first_us"],
            r["last_us"],
        )
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("bigint")).alias(
                "n_purchases"
            ),
            F.sum(
                F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("bigint")
            ).alias("sum_value_q"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_tws_processor_fold_logic_unit():
    """The TWS processor's fold must be chunking-independent: feeding
    the same rows as one batch, two batches, or many per-batch chunks
    yields the identical profile (the integer micro-unit discipline),
    and matches a direct recompute."""
    import numpy as np
    import pandas as pd

    from big_data_analytics_final_project_spark.streaming.tws import (
        UserProfileProcessor,
        quantize_micro,
    )

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

    rng = np.random.RandomState(3)
    n = 200
    pdf = pd.DataFrame(
        {
            "user_id": np.full(n, 7),
            "event_type": rng.choice(["purchase", "view", "click"], n),
            "value": np.where(rng.rand(n) < 0.1, np.nan, rng.rand(n) * 100),
            "ts": pd.to_datetime(
                rng.randint(1_600_000_000, 1_600_100_000, n), unit="s"
            ),
        }
    )

    def run(chunks):
        proc = UserProfileProcessor()
        handle = FakeHandle()
        proc.init(handle)
        out = None
        for batch in chunks:
            for res in proc.handleInputRows((7,), iter(batch), None):
                out = res
        return tuple(out.iloc[0])

    one = run([[pdf]])
    two = run([[pdf.iloc[:90]], [pdf.iloc[90:]]])
    many = run([[pdf.iloc[i : i + 37] for i in range(0, n, 37)]])
    assert one == two == many
    assert one[1] == n  # n_events
    assert one[2] == int((pdf["event_type"] == "purchase").sum())
    assert one[3] == quantize_micro(pdf["value"])
    ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
    assert one[4] == ts_us.min() and one[5] == ts_us.max()

    # NaT timestamps are IGNORED, not folded in as INT64_MIN (round-5
    # ADVICE): a batch whose ts column contains nulls must leave
    # first/last at the non-null extremes, and an all-NaT first batch
    # must merge cleanly with a later real-timestamp batch.
    nat_pdf = pdf.copy()
    nat_pdf.loc[nat_pdf.index[:50], "ts"] = pd.NaT
    with_nat = run([[nat_pdf]])
    good_us = (
        nat_pdf["ts"].dropna().astype("datetime64[us]").astype("int64")
    )
    assert with_nat[4] == good_us.min() and with_nat[5] == good_us.max()
    all_nat = pdf.copy()
    all_nat["ts"] = pd.NaT
    staged = run([[all_nat], [pdf]])
    assert staged[4] == ts_us.min() and staged[5] == ts_us.max()
    assert staged[1] == 2 * n


def test_run_collapse_fold_guards_empty_state():
    """r8 advice fix, pinned at the fold level (no Spark): a key
    invoked with NO prior state and only empty chunks must store
    nothing and arm no timeout (state.update would otherwise hold
    (None, -1, ...) forever-idle keys), and a defensively-stored empty
    state that times out must flush silently — never the NULL-typed
    epoch row the advisor described."""
    import pandas as pd

    from big_data_analytics_final_project_spark.streaming.stateful import (
        _make_run_fold,
    )

    class FakeGroupState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False
            self.timeout_ms = None
            self.removed = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            if self._v is None:
                raise ValueError("no state")
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None
            self.removed = True

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

        def getCurrentWatermarkMs(self):
            return 0

    fold = _make_run_fold(3600 * 1_000_000)

    # no prior state + only empty chunks: nothing stored, no timeout
    st = FakeGroupState()
    assert list(fold((7,), iter([pd.DataFrame()]), st)) == []
    assert st._v is None and st.timeout_ms is None

    # an empty stored state that times out: silent flush, no emission
    st2 = FakeGroupState()
    st2._v = (None, -1, -1, 0, 0)
    st2.hasTimedOut = True
    assert list(fold((7,), iter([]), st2)) == []
    assert st2.removed

    # positive path still arms: one real row stores a run + timeout
    st3 = FakeGroupState()
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([1_600_000_000], unit="s"),
            "event_id": [1],
            "event_type": ["click"],
            "value": [2.5],
        }
    )
    assert list(fold((7,), iter([pdf]), st3)) == []  # run stays open
    assert st3._v is not None and st3.timeout_ms is not None


def test_stateful_run_collapse_matches_batch(spark, stream_dirs):
    """applyInPandasWithState run collapse (VALUE-change islands):
    every emitted (closed) run must equal the batch gaps-and-islands
    window result — same boundaries, counts, and exact micro-unit
    value totals — and every run a later cross-type event closes (all
    but each user's final run) MUST have been emitted."""
    from big_data_analytics_final_project_spark.streaming.stateful import (
        stateful_run_collapse,
    )

    stream = read_event_stream(spark, stream_dirs["src"])
    q = (
        stateful_run_collapse(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_runs_test")
        .option("checkpointLocation", f"{stream_dirs['root']}/ckpt_runs")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = {
        (r["user_id"], r["run_start"]): (
            r["event_type"],
            r["run_end"],
            r["n_events"],
            r["sum_micro"],
        )
        for r in spark.sql("SELECT * FROM stateful_runs_test").collect()
    }

    # batch twin: the same lag-change-flag + running-sum numbering
    # user_event_runs uses, with the stream's micro quantization
    ev = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chg = F.when(
        F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 0
    ).otherwise(1)
    batch = (
        ev.withColumn("run_id", F.sum(chg).over(frame))
        .groupBy("user_id", "run_id", "event_type")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1e6 + 0.5)
            ).alias("sum_micro"),
        )
        .collect()
    )
    want = {
        (r["user_id"], r["run_start"]): (
            r["event_type"],
            r["run_end"],
            r["n_events"],
            r["sum_micro"],
        )
        for r in batch
    }
    assert got, "no runs were emitted"
    for key, val in got.items():
        assert key in want and want[key] == val, f"mismatch for {key}"
    # completeness: non-final runs are always closed by a successor
    last_start = {}
    for r in batch:
        if (
            r["user_id"] not in last_start
            or r["run_start"] > last_start[r["user_id"]]
        ):
            last_start[r["user_id"]] = r["run_start"]
    non_final = {k for k in want if k[1] != last_start[k[0]]}
    missing = non_final - set(got)
    assert not missing, f"{len(missing)} successor-closed runs not emitted"


def test_stateful_run_collapse_multi_chunk_groups(spark, stream_dirs):
    """With a tiny Arrow batch size, one group's rows arrive as MANY
    pandas chunks in no particular order; the run fold must
    concat+sort before folding or runs split/merge wrongly. Emitted
    runs still match the batch window exactly."""
    from big_data_analytics_final_project_spark.streaming.stateful import (
        stateful_run_collapse,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "3")
    try:
        stream = read_event_stream(spark, stream_dirs["src"])
        q = (
            stateful_run_collapse(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("stateful_runs_chunked")
            .option(
                "checkpointLocation", f"{stream_dirs['root']}/ckpt_runs_chunk"
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = {
        (r["user_id"], r["run_start"]): (
            r["event_type"],
            r["run_end"],
            r["n_events"],
            r["sum_micro"],
        )
        for r in spark.sql("SELECT * FROM stateful_runs_chunked").collect()
    }
    ev = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chg = F.when(
        F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 0
    ).otherwise(1)
    want = {
        (r["user_id"], r["run_start"]): (
            r["event_type"],
            r["run_end"],
            r["n_events"],
            r["sum_micro"],
        )
        for r in (
            ev.withColumn("run_id", F.sum(chg).over(frame))
            .groupBy("user_id", "run_id", "event_type")
            .agg(
                F.min("ts").alias("run_start"),
                F.max("ts").alias("run_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum(
                    F.floor(
                        F.coalesce(F.col("value"), F.lit(0.0)) * 1e6 + 0.5
                    )
                ).alias("sum_micro"),
            )
            .collect()
        )
    }
    assert got, "no runs were emitted"
    for k, v in got.items():
        assert k in want and want[k] == v, f"mismatch for {k}"


def test_stateful_run_collapse_recovers_from_checkpoint(spark):
    """State-store persistence across RESTARTS: drain two chunks, stop,
    land a third, restart on the SAME checkpoint — open runs must
    survive the restart (a run spanning the stop/start boundary is
    closed by a post-restart event exactly once), and the union of
    both runs' emissions must match the batch result with no
    duplicates."""
    import tempfile as _tf

    from big_data_analytics_final_project_spark.streaming.stateful import (
        stateful_run_collapse,
    )

    root = _tf.mkdtemp(prefix="runs_recovery_")
    src = f"{root}/src"
    events = (
        load_table(spark, SF_SMOKE, "events")
        .select(*[f.name for f in EVENT_SCHEMA.fields])
        .withColumn(
            "_chunk", F.ntile(3).over(Window.orderBy("ts", "event_id"))
        )
    )
    for c in (1, 2):
        events.filter(F.col("_chunk") == c).drop("_chunk").coalesce(
            1
        ).write.mode("append").parquet(src)

    out = f"{root}/out"

    def drain():
        # memory sink cannot resume from a checkpoint; a foreachBatch
        # parquet append is the recoverable sink shape (and the one a
        # real pipeline uses). idle_close is pushed past the whole
        # data span: the idle FLUSH is a policy (it deliberately
        # splits a run when a user goes quiet), and this test isolates
        # STATE persistence — a run spanning the restart must close by
        # type change exactly once, not by the flush policy firing in
        # between.
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            stateful_run_collapse(
                read_event_stream(spark, src),
                idle_close_seconds=90 * 24 * 3600,
            )
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish"

    drain()
    events.filter(F.col("_chunk") == 3).drop("_chunk").coalesce(
        1
    ).write.mode("append").parquet(src)
    drain()

    emitted = spark.read.parquet(out).collect()
    keys = [(r["user_id"], r["run_start"]) for r in emitted]
    assert len(keys) == len(set(keys)), "duplicate emission across restart"
    got = {
        (r["user_id"], r["run_start"]): (
            r["event_type"],
            r["run_end"],
            r["n_events"],
            r["sum_micro"],
        )
        for r in emitted
    }

    ev = spark.read.schema(EVENT_SCHEMA).parquet(src)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chg = F.when(
        F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 0
    ).otherwise(1)
    batch = (
        ev.withColumn("run_id", F.sum(chg).over(frame))
        .groupBy("user_id", "run_id", "event_type")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1e6 + 0.5)
            ).alias("sum_micro"),
        )
        .collect()
    )
    want = {
        (r["user_id"], r["run_start"]): (
            r["event_type"],
            r["run_end"],
            r["n_events"],
            r["sum_micro"],
        )
        for r in batch
    }
    assert got, "no runs were emitted"
    for k, v in got.items():
        assert k in want and want[k] == v, f"mismatch for {k}"
    # completeness: every run closed by a successor is in the union —
    # in particular the runs whose closing event arrived AFTER the
    # restart (the state-survival property this test exists for)
    last_start = {}
    for r in batch:
        if (
            r["user_id"] not in last_start
            or r["run_start"] > last_start[r["user_id"]]
        ):
            last_start[r["user_id"]] = r["run_start"]
    non_final = {k for k in want if k[1] != last_start[k[0]]}
    missing = non_final - set(got)
    assert not missing, f"{len(missing)} successor-closed runs not emitted"
    shutil.rmtree(root, ignore_errors=True)


def test_cms_sketch_stream_matches_batch(spark, stream_dirs):
    """The Count-Min build (operators/sketches.count_min_sketch) is
    mode-agnostic: the SAME operator code over the chunked stream
    (complete-mode aggregation — explode + groupBy count are both
    stream-supported) must converge to exactly the batch sketch, which
    is the merge-by-addition property exercised by Spark's own
    incremental state instead of a manual union."""
    from big_data_analytics_final_project_spark.operators.sketches import (
        count_min_sketch,
    )

    stream = read_event_stream(spark, stream_dirs["src"]).select("user_id")
    q = (
        count_min_sketch(stream, "user_id", depth=3, width=64)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_stream_test")
        .option("checkpointLocation", f"{stream_dirs['root']}/ckpt_cms")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"
    got = {
        (r.r, r.bucket): r.cnt
        for r in spark.sql("SELECT * FROM cms_stream_test").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).parquet(stream_dirs["src"]).select(
        "user_id"
    )
    want = {
        (r.r, r.bucket): r.cnt
        for r in count_min_sketch(batch, "user_id", depth=3, width=64).collect()
    }
    assert got == want and got
