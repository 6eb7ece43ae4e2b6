"""Spark-4 Python DataSource connector: chunked-JSONL zone scan.

The reference reaches its external stores through hand-rolled
connectors — happybase HBase scans with batch/timeout tuning
(integrated_query_engagement_vs_spend.py:44-57) and a chunked
sessions_0..9.json zone loaded file-by-file with per-line error
skipping (load_hbase_sessions_stream.py:27-79). This is the engine's
native analog, written against the official `pyspark.sql.datasource`
API (public since Spark 4.0, filter pushdown since 4.1):

- **one input partition per chunk file** — the chunk layout IS the
  parallelism, exactly like the reference's sessions_N.json split
  (and like HBase region splits);
- **explicit schema** via the caller (inference would be an extra full
  pass over 100 TB);
- **EqualTo pushdown** (`pushFilters`) applied INSIDE the reader — the
  HBase scan-filter analog: rows are dropped at the source before they
  ever cross into the exchange;
- **Arrow RecordBatch output** — the reader yields columnar batches,
  not per-row tuples, so the Python→JVM hop is one Arrow buffer per
  chunk (the same batch discipline as the mapInPandas operators);
- **permissive mode** — malformed lines are skipped per chunk, the
  reference's try/except-per-line ingest contract (SRC-5).

At 100 TB a Python source is still the slow path versus the built-in
parquet/json readers (every byte funnels through Python) — the role of
this connector is the EXTENSION POINT: the same class shape reads any
store with a Python client (an internal KV service, a vector DB, a
feature store), partitioned, filter-pushed, and Arrow-batched.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class ChunkedJsonlDataSource(DataSource):
    """`spark.read.format("chunked_jsonl").schema(...).load(path)` —
    and the same zone as a STREAM: `spark.readStream.format(...)`,
    where each newly arriving chunk file becomes (part of) a
    micro-batch, with exactly-once replay from the chunk-count offset
    (the reference's "load sessions_N.json as they land" loop,
    load_hbase_sessions_stream.py:27-79, as a real Structured
    Streaming source with checkpointed offsets instead of a cursor
    file)."""

    @classmethod
    def name(cls) -> str:
        return "chunked_jsonl"

    def schema(self):
        raise NotImplementedError(
            "chunked_jsonl requires an explicit .schema(...) — schema "
            "inference over a 100 TB zone is a full extra pass"
        )

    def reader(self, schema: StructType) -> "ChunkedJsonlReader":
        return ChunkedJsonlReader(schema, self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> "ChunkedJsonlStreamReader":
        return ChunkedJsonlStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "ChunkedJsonlWriter":
        return ChunkedJsonlWriter(schema, self.options, overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> "ChunkedJsonlStreamWriter":
        return ChunkedJsonlStreamWriter(schema, self.options)


class ChunkedJsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("chunked_jsonl: 'path' option is required")
        self.schema = schema
        self.path = path
        self.permissive = (
            str(options.get("mode", "permissive")).lower() == "permissive"
        )
        self.pushed: list[EqualTo] = []

    def pushFilters(self, filters):
        # consume top-level EqualTo on scan columns (the HBase
        # SingleColumnValueFilter analog); everything else stays with
        # Spark. Each returned filter must be an input filter by
        # reference (API contract).
        names = {f.name for f in self.schema.fields}
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in names
            ):
                self.pushed.append(f)
            else:
                yield f

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, "*.json")))
        if not files:
            raise FileNotFoundError(
                f"chunked_jsonl: no *.json chunks under {self.path}"
            )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        import pyarrow as pa

        fields = [f.name for f in self.schema.fields]
        checks = [(f.attribute[0], f.value) for f in self.pushed]
        cols: dict[str, list] = {n: [] for n in fields}
        for row in _parse_chunk(partition.value, self.permissive, checks):
            for n in fields:
                cols[n].append(row.get(n))
        # one Arrow batch per chunk: schema-driven types, single
        # Python->JVM hop
        arrow_schema = pa.schema(
            [
                (f.name, _arrow_type(f.dataType.simpleString()))
                for f in self.schema.fields
            ]
        )
        yield pa.RecordBatch.from_arrays(
            [
                _arrow_column(
                    cols[f.name],
                    _arrow_type(f.dataType.simpleString()),
                    self.permissive,
                )
                for f in self.schema.fields
            ],
            schema=arrow_schema,
        )


class ChunkedJsonlStreamReader(SimpleDataSourceStreamReader):
    """Chunk-count offsets: offset {"i": n} = the first n chunk files
    (sorted by name) are committed. `read` consumes every chunk that
    has landed since; `readBetweenOffsets` replays a committed range
    deterministically after restart — together, exactly-once per
    chunk. Chunks must be append-only and named monotonically (the
    reference's sessions_0..9.json convention)."""

    def __init__(self, schema: StructType, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("chunked_jsonl: 'path' option is required")
        self.schema = schema
        self.path = path
        self.permissive = (
            str(options.get("mode", "permissive")).lower() == "permissive"
        )

    def _files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.path, "*.json")))

    def _rows(self, files: list[str]) -> list[tuple]:
        # materialized list, not a generator: the runner pickles the
        # returned rows to ship them into the plan
        fields = [f.name for f in self.schema.fields]
        return [
            tuple(row.get(n) for n in fields)
            for path in files
            for row in _parse_chunk(path, self.permissive, [])
        ]

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        files = self._files()
        i0 = int(start["i"])
        return self._rows(files[i0:]), {"i": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        return self._rows(files[int(start["i"]) : int(end["i"])])


@dataclass
class _StagedChunk(WriterCommitMessage):
    staged_path: str
    n_rows: int


class ChunkedJsonlWriter(DataSourceWriter):
    """Write side of the connector: each task streams its partition to
    a STAGED file; `commit` (driver, after every task succeeded)
    renames the staged files into place as chunk_NNNNN.json — so
    readers never observe a half-written zone, and a failed job leaves
    only the staging dir for `abort` to delete. Same durable-staging
    discipline as sinks.upsert_zone; rename is atomic within a
    filesystem (at cloud scale the rename becomes the object-store
    manifest commit — the seam is the same)."""

    def __init__(
        self, schema: StructType, options: dict, overwrite: bool
    ) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("chunked_jsonl: 'path' option is required")
        self.path = path
        self.overwrite = overwrite
        # one staging namespace per write job, minted driver-side so
        # every pickled task copy shares it
        self.staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")

    def write(self, iterator) -> _StagedChunk:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else os.getpid()
        # the attempt id is part of the staged name: a speculative or
        # retried duplicate of this task writes its OWN staged file
        # instead of interleaving with the first attempt's; only the
        # attempt whose commit message reaches the driver is renamed
        # into place, the loser is swept with the staging dir
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        os.makedirs(self.staging, exist_ok=True)
        staged = os.path.join(
            self.staging, f"part_{pid:05d}_a{attempt}.json"
        )
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedChunk(staged_path=staged, n_rows=n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "*.json")):
                os.remove(old)
        # next index = max(existing)+1, NOT the file count: a zone
        # whose chunk numbering has gaps (manual deletes, partial
        # retention sweeps) must never have a new chunk os.replace()
        # an existing one
        existing = [
            int(m.group(1))
            for p in glob.glob(os.path.join(self.path, "chunk_*.json"))
            if (m := re.fullmatch(r"chunk_(\d+)\.json", os.path.basename(p)))
        ]
        nxt = max(existing) + 1 if existing else 0
        for i, msg in enumerate(m for m in messages if m is not None):
            final = os.path.join(self.path, f"chunk_{nxt + i:05d}.json")
            os.replace(msg.staged_path, final)
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class ChunkedJsonlStreamWriter(DataSourceStreamWriter):
    """Streaming write side — completes the connector's fourth surface
    (batch read / batch write / stream read / stream write): every
    micro-batch lands as `batch_{batchId}_{i}.json` chunks the batch
    and stream READERS pick up by the same `*.json` glob.

    Exactly-once discipline: per-task staging + driver-side rename (as
    the batch writer), and the commit is IDEMPOTENT PER EPOCH — chunk
    names carry the batchId, and commit first clears any chunks a
    previous attempt of the SAME batch left behind, so a micro-batch
    replayed after a crash-between-commit-and-checkpoint overwrites
    its own output instead of duplicating it (the object-store
    manifest-commit seam, same as the batch writer's rename).

    Zone discipline: a stream-written zone should receive ONLY stream
    writes — `batch_` names sort before `chunk_` names, so appending
    stream chunks to a zone that already has batch `chunk_` files
    would insert files before the stream READER's count offset and
    break its exactly-once replay.
    """

    def __init__(self, schema: StructType, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("chunked_jsonl: 'path' option is required")
        self.path = path
        # one staging namespace per streaming query run; staged files
        # are named per (batch, partition, attempt) so epochs never
        # collide inside it
        self.staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")

    def write(self, iterator) -> _StagedChunk:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else os.getpid()
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        os.makedirs(self.staging, exist_ok=True)
        staged = os.path.join(
            self.staging, f"part_{pid:05d}_a{attempt}.json"
        )
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedChunk(staged_path=staged, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        # idempotent replay: clear this epoch's chunks from any prior
        # attempt before renaming the new ones into place
        for old in glob.glob(
            os.path.join(self.path, f"batch_{batchId:06d}_*.json")
        ):
            os.remove(old)
        for i, msg in enumerate(m for m in messages if m is not None):
            final = os.path.join(
                self.path, f"batch_{batchId:06d}_{i:05d}.json"
            )
            os.replace(msg.staged_path, final)
        # Sweep EVERY `_staging_*` dir in the zone, not just
        # self.staging: Spark reconstructs the writer in separate
        # processes (task side vs the driver's commit runner), so the
        # committing instance's uuid differs from the one the tasks
        # staged under, and a crashed previous RUN (driver death — no
        # abort call) leaves its dir behind forever. Micro-batch
        # epochs are serialized, so at end-of-commit nothing is
        # legitimately in flight — anything still staged is a dead
        # attempt's or dead run's file. (Sweeping any earlier is
        # unsafe for exactly the same multi-instance reason: an
        # instance can't tell its siblings' live dirs from dead ones
        # until the epoch's renames are done.)
        for stale in glob.glob(os.path.join(self.path, "_staging_*")):
            shutil.rmtree(stale, ignore_errors=True)

    def abort(self, messages, batchId: int) -> None:
        for msg in messages:
            if msg is not None:
                try:
                    os.remove(msg.staged_path)
                except OSError:
                    pass


def _parse_chunk(path: str, permissive: bool, checks: list):
    """Per-line JSON objects from one chunk file; malformed lines skip
    in permissive mode; `checks` are pushed (column, value) equalities
    applied at the source."""
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                row = json.loads(line)
                if not isinstance(row, dict):
                    raise ValueError("not an object")
            except ValueError:
                if permissive:
                    continue
                raise
            if any(row.get(c) != v for c, v in checks):
                continue
            yield row


def _arrow_column(values: list, typ, permissive: bool):
    """Column build honoring the per-LINE permissive contract: a
    well-formed JSON object whose field TYPE mismatches the declared
    schema (a string in a bigint column) must null that field, not
    fail the whole task — Spark's own permissive JSON reader
    semantics. Fast path is one pa.array over the chunk; only a
    mismatching chunk pays the per-value scrub."""
    import pyarrow as pa

    errs = (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError)
    try:
        return pa.array(values, type=typ)
    except errs:
        if not permissive:
            raise
    scrubbed = []
    for v in values:
        if v is not None:
            try:
                pa.scalar(v, type=typ)
            except errs:
                v = None
        scrubbed.append(v)
    return pa.array(scrubbed, type=typ)


def _arrow_type(spark_simple: str):
    import pyarrow as pa

    return {
        "bigint": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
    }[spark_simple]
