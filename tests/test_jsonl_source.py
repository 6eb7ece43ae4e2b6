"""Spark-4 Python DataSource connector (sources/jsonl_source.py):
filter-pushdown contract, permissive error-skip, chunk partitioning."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan
from pyspark.sql.types import StructType

from big_data_analytics_final_project_spark.sources.jsonl_source import (
    ChunkedJsonlDataSource,
    ChunkedJsonlReader,
)

SCHEMA_DDL = "event_id bigint, event_type string, value double"


def _schema() -> StructType:
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(SCHEMA_DDL)


def _write_chunks(root: str, n_chunks: int = 3, bad_lines: int = 0) -> int:
    os.makedirs(root, exist_ok=True)
    n = 0
    for c in range(n_chunks):
        with open(f"{root}/chunk_{c}.json", "w") as f:
            for i in range(10):
                eid = c * 10 + i
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "event_type": "purchase" if eid % 3 == 0 else "view",
                            "value": eid * 1.5,
                        }
                    )
                    + "\n"
                )
                n += 1
            for _ in range(bad_lines if c == 0 else 0):
                f.write("{not json]\n")
    return n


def _read(spark, root: str, mode: str = "permissive"):
    try:
        spark.dataSource.register(ChunkedJsonlDataSource)
    except Exception:
        pass  # already registered in this session
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return (
        spark.read.format("chunked_jsonl")
        .schema(SCHEMA_DDL)
        .option("path", root)
        .option("mode", mode)
        .load()
    )


def test_reads_all_chunks(spark, tmp_path):
    root = f"{tmp_path}/jsonl_all"
    n = _write_chunks(root)
    df = _read(spark, root)
    assert df.count() == n
    # one input partition per chunk: distinct spark partition count
    parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert parts == 3


def test_pushdown_consumes_equalto_and_matches_post_filter(spark, tmp_path):
    root = f"{tmp_path}/jsonl_push"
    _write_chunks(root)
    df = _read(spark, root).filter(F.col("event_type") == "purchase")
    rows = df.collect()
    assert {r.event_type for r in rows} == {"purchase"}
    assert len(rows) == 10  # event_id % 3 == 0 of 30


def test_permissive_skips_malformed_failfast_raises(spark, tmp_path):
    root = f"{tmp_path}/jsonl_bad"
    n = _write_chunks(root, bad_lines=4)
    assert _read(spark, root, mode="permissive").count() == n
    with pytest.raises(Exception, match="not json|JSON|PYTHON_DATA_SOURCE"):
        _read(spark, root, mode="failfast").count()


def test_permissive_nulls_type_mismatches(spark, tmp_path):
    """A well-formed object whose field TYPE mismatches the schema (a
    string in the bigint column) must NULL that field in permissive
    mode — Spark's own permissive JSON reader contract — and fail the
    task in failfast (round-5 ADVICE: it used to fail the whole task
    in both modes via ArrowInvalid)."""
    root = f"{tmp_path}/jsonl_mismatch"
    n = _write_chunks(root)
    with open(f"{root}/chunk_0.json", "a") as f:
        f.write(
            json.dumps(
                {"event_id": "not-a-number", "event_type": "view", "value": 1.0}
            )
            + "\n"
        )
    df = _read(spark, root, mode="permissive")
    rows = df.collect()
    assert len(rows) == n + 1  # the mismatching ROW is kept
    assert sum(1 for r in rows if r.event_id is None) == 1  # field nulled
    assert {r.event_type for r in rows if r.event_id is None} == {"view"}
    with pytest.raises(Exception):
        _read(spark, root, mode="failfast").count()


def test_append_respects_gapped_chunk_numbering(spark, tmp_path):
    """Appending to a zone whose chunk numbering has gaps (retention
    sweeps, manual deletes) must mint max(index)+1 — never clobber an
    existing chunk by re-counting files (round-5 ADVICE)."""
    root = f"{tmp_path}/jsonl_gaps"
    os.makedirs(root)
    for idx in (0, 7):
        with open(f"{root}/chunk_{idx:05d}.json", "w") as f:
            f.write(
                json.dumps(
                    {"event_id": idx, "event_type": "view", "value": 0.0}
                )
                + "\n"
            )
    try:
        spark.dataSource.register(ChunkedJsonlDataSource)
    except Exception:
        pass
    df = spark.createDataFrame(
        [(100, "view", 1.0)], SCHEMA_DDL
    ).coalesce(1)
    df.write.format("chunked_jsonl").option("path", root).mode(
        "append"
    ).save()
    import glob as g

    names = sorted(os.path.basename(p) for p in g.glob(f"{root}/*.json"))
    assert names == [
        "chunk_00000.json",
        "chunk_00007.json",
        "chunk_00008.json",
    ]
    ids = sorted(r.event_id for r in _read(spark, root).collect())
    assert ids == [0, 7, 100]


def test_pushfilters_contract_unit():
    """pushFilters must consume only top-level EqualTo on schema
    columns and return every other filter BY REFERENCE."""
    reader = ChunkedJsonlReader(_schema(), {"path": "/nonexistent"})
    eq = EqualTo(("event_type",), "purchase")
    eq_unknown = EqualTo(("nope",), 1)
    gt = GreaterThan(("value",), 3.0)
    remaining = list(reader.pushFilters([eq, eq_unknown, gt]))
    assert reader.pushed == [eq]
    assert remaining == [eq_unknown, gt]
    assert remaining[0] is eq_unknown and remaining[1] is gt


def test_missing_chunks_and_schema_errors(spark, tmp_path):
    with pytest.raises(Exception):
        _read(spark, f"{tmp_path}/does_not_exist").count()
    ds = ChunkedJsonlDataSource({})
    with pytest.raises(NotImplementedError):
        ds.schema()


def test_streaming_source_incremental_chunks(spark, tmp_path):
    """The streaming side of the connector: chunk-count offsets give
    exactly-once per chunk — a first availableNow run drains the
    existing chunks; after a NEW chunk lands, a second run on the SAME
    checkpoint consumes only the new chunk (no replay, no loss)."""
    root = f"{tmp_path}/jsonl_stream"
    ckpt = f"{tmp_path}/jsonl_stream_ckpt"
    out = f"{tmp_path}/jsonl_stream_out"
    n0 = _write_chunks(root, n_chunks=3)

    def drain():
        # parquet sink, not memory: the memory sink cannot recover
        # from a checkpoint, and recovery is exactly what this test
        # exercises
        stream = (
            spark.readStream.format("chunked_jsonl")
            .schema(SCHEMA_DDL)
            .option("path", root)
            .load()
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish"
        return spark.read.schema(SCHEMA_DDL).parquet(out).collect()

    try:
        spark.dataSource.register(ChunkedJsonlDataSource)
    except Exception:
        pass

    first = drain()
    assert len(first) == n0
    assert {r.event_id for r in first} == set(range(30))

    # a fourth chunk lands
    with open(f"{root}/chunk_3.json", "w") as f:
        for i in range(30, 35):
            f.write(
                json.dumps(
                    {"event_id": i, "event_type": "view", "value": i * 1.5}
                )
                + "\n"
            )
    total = drain()
    # exactly-once: the old chunks are NOT replayed, the new one lands
    assert {r.event_id for r in total} == set(range(35))
    assert len(total) == 35


def test_stream_writer_zone_to_zone_exactly_once(spark, tmp_path):
    """The connector's fourth surface: readStream from zone A,
    writeStream to zone B through the SAME format — chunks land as
    batch_{epoch}_{i}.json, the batch reader round-trips them, and a
    second drain after new data arrives in A moves only the delta
    (exactly-once end to end across both the reader's offsets and the
    writer's per-epoch commits)."""
    src = f"{tmp_path}/stream_w_src"
    dst = f"{tmp_path}/stream_w_dst"
    ckpt = f"{tmp_path}/stream_w_ckpt"
    n0 = _write_chunks(src, n_chunks=3)
    os.makedirs(dst, exist_ok=True)
    try:
        spark.dataSource.register(ChunkedJsonlDataSource)
    except Exception:
        pass

    def drain():
        stream = (
            spark.readStream.format("chunked_jsonl")
            .schema(SCHEMA_DDL)
            .option("path", src)
            .load()
        )
        q = (
            stream.writeStream.format("chunked_jsonl")
            .option("path", dst)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish"
        return _read(spark, dst).collect()

    first = drain()
    assert {r.event_id for r in first} == set(range(n0))
    import glob as g

    assert not g.glob(f"{dst}/_staging_*/*"), "staged files leaked"

    with open(f"{src}/chunk_3.json", "w") as f:
        for i in range(30, 35):
            f.write(
                json.dumps(
                    {"event_id": i, "event_type": "view", "value": i * 1.5}
                )
                + "\n"
            )
    total = drain()
    assert {r.event_id for r in total} == set(range(35))
    assert len(total) == 35


def test_stream_writer_commit_idempotent_per_epoch(tmp_path):
    """A micro-batch replayed after a crash between commit and
    checkpoint must overwrite its own chunks, never duplicate them —
    the commit carries the batchId and clears that epoch's files
    first."""
    from pyspark.sql.types import _parse_datatype_string

    from big_data_analytics_final_project_spark.sources.jsonl_source import (
        ChunkedJsonlStreamWriter,
        _StagedChunk,
    )

    dst = f"{tmp_path}/idem_zone"
    os.makedirs(dst)
    w = ChunkedJsonlStreamWriter(
        _parse_datatype_string(SCHEMA_DDL), {"path": dst}
    )

    def stage(tag):
        os.makedirs(w.staging, exist_ok=True)
        p = os.path.join(w.staging, f"part_{tag}.json")
        with open(p, "w") as f:
            f.write(json.dumps({"event_id": 1}) + "\n")
        return _StagedChunk(staged_path=p, n_rows=1)

    w.commit([stage("a")], batchId=7)
    w.commit([stage("b")], batchId=7)  # replay of the same epoch
    files = sorted(os.listdir(dst))
    assert files == ["batch_000007_00000.json"], files


def test_stream_writer_sweeps_dead_run_staging(tmp_path):
    """A streaming query that crashes mid-epoch (driver death — no
    abort call) leaves its `_staging_<uuid>` dir in the zone. A new
    run mints a fresh uuid, so without a sweep the dead dirs
    accumulate forever. END of commit removes every `_staging_*` dir
    (epochs are serialized — nothing is legitimately in flight then;
    sweeping earlier is unsafe because Spark reconstructs the writer
    per process, so the committing instance cannot recognize the
    task-side dir as its own). Committed chunks survive."""
    from pyspark.sql.types import _parse_datatype_string

    from big_data_analytics_final_project_spark.sources.jsonl_source import (
        ChunkedJsonlStreamWriter,
        _StagedChunk,
    )

    dst = f"{tmp_path}/sweep_zone"
    os.makedirs(os.path.join(dst, "_staging_deadbeef"))
    with open(
        os.path.join(dst, "_staging_deadbeef", "part_00001_a0.json"), "w"
    ) as f:
        f.write(json.dumps({"event_id": 1}) + "\n")
    # committed chunks from the dead run must survive the sweep
    with open(os.path.join(dst, "batch_000001_00000.json"), "w") as f:
        f.write(json.dumps({"event_id": 2}) + "\n")

    w = ChunkedJsonlStreamWriter(
        _parse_datatype_string(SCHEMA_DDL), {"path": dst}
    )
    # construction must NOT sweep (another live instance may own a dir)
    assert os.path.isdir(os.path.join(dst, "_staging_deadbeef"))

    # tasks stage under a DIFFERENT instance's uuid than the committer
    # (Spark reconstructs the writer per process) — model that by
    # staging outside w.staging
    task_staging = os.path.join(dst, "_staging_task_instance")
    os.makedirs(task_staging, exist_ok=True)
    staged = os.path.join(task_staging, "part_00000_a0.json")
    with open(staged, "w") as f:
        f.write(json.dumps({"event_id": 3}) + "\n")
    w.commit([_StagedChunk(staged_path=staged, n_rows=1)], batchId=2)

    left = sorted(os.listdir(dst))
    assert left == [
        "batch_000001_00000.json",
        "batch_000002_00000.json",
    ], left


def test_writer_roundtrip_overwrite_and_append(spark, tmp_path):
    """Write side: staged files land atomically as chunk_NNNNN.json on
    commit; overwrite replaces the zone, append adds chunks; the batch
    reader round-trips the rows exactly."""
    root = f"{tmp_path}/jsonl_write"
    df = spark.createDataFrame(
        [(i, "purchase" if i % 2 == 0 else "view", i * 2.5) for i in range(40)],
        SCHEMA_DDL,
    ).repartition(4)
    try:
        spark.dataSource.register(ChunkedJsonlDataSource)
    except Exception:
        pass
    df.write.format("chunked_jsonl").option("path", root).mode(
        "overwrite"
    ).save()
    import glob as g

    chunks = sorted(g.glob(f"{root}/*.json"))
    assert len(chunks) == 4 and not g.glob(f"{root}/_staging_*")
    back = _read(spark, root)
    assert sorted(r.event_id for r in back.collect()) == list(range(40))

    # append: new chunks join the zone, old rows stay
    df2 = spark.createDataFrame([(100, "view", 1.0)], SCHEMA_DDL).coalesce(1)
    df2.write.format("chunked_jsonl").option("path", root).mode(
        "append"
    ).save()
    ids = sorted(r.event_id for r in _read(spark, root).collect())
    assert ids == list(range(40)) + [100]

    # overwrite: zone is replaced, not merged
    df2.write.format("chunked_jsonl").option("path", root).mode(
        "overwrite"
    ).save()
    assert [r.event_id for r in _read(spark, root).collect()] == [100]
