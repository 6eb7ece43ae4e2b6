"""Multimodal column plumbing: image/audio/video as opaque binary.

Design (the Spark-side contract is real and tested; the codec calls are
stubbed because no media libraries exist in this container):

- A multimodal table is any DataFrame with a `binary` payload column
  plus typed metadata columns (media_type, byte_len, format sniffed
  from magic bytes).
- Metadata extraction is pure column expressions (JVM-side).
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  `mapInPandas` — one Python worker per partition, whole Arrow record
  batches per call, never row-at-a-time. At 100 TB the decode stage is
  CPU-bound and embarrassingly parallel: `repartition` by size so every
  task gets comparable byte volume, then pipeline decode → feature UDF
  in one stage.

`decode_image` raises NotImplementedError (clearly-marked stub);
`fake_decode_meta` is the deterministic stand-in used by tests to prove
the batch plumbing (schema, Arrow batch shape, partition behavior).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_PREFIXES = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "664c6143": "flac",
}


def with_binary_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns from the raw binary payload — byte length
    and a magic-byte format sniff. Pure expressions; no Python."""
    hex8 = F.lower(F.hex(F.substring(F.col(payload_col), 1, 4)))
    fmt = F.lit("unknown")
    # longest-prefix-first chain so 'ffd8ff' (3 bytes) doesn't shadow 4-byte magics
    for prefix, name in sorted(MAGIC_PREFIXES.items(), key=lambda kv: -len(kv[0])):
        fmt = F.when(hex8.startswith(prefix), F.lit(name)).otherwise(fmt)
    return df.withColumn("byte_len", F.length(F.col(payload_col))).withColumn(
        "format", fmt
    )


DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("checksum_hex", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode (PIL/libjpeg) — NOT AVAILABLE in this
    environment. The Arrow plumbing it would ride on is exercised by
    `fake_decode_meta` below with an identical signature."""
    raise NotImplementedError(
        "image codecs are not installed in this container; "
        "use fake_decode_meta for plumbing tests"
    )


def resize_image(df: DataFrame, width: int, height: int, payload_col: str = "payload") -> DataFrame:
    """Real image resize — NOT AVAILABLE (no codec libs). Same
    mapInPandas shape as `fake_decode_meta`: binary in, binary out,
    one row per input."""
    raise NotImplementedError(
        "image codecs are not installed in this container; "
        "the batch contract is exercised by fake_decode_meta"
    )


def sample_frames(df: DataFrame, n_frames: int, payload_col: str = "payload") -> DataFrame:
    """Real video frame sampling — NOT AVAILABLE (no codec libs). Row
    expansion shape (1 input → n_frames outputs) is exercised by
    `fake_sample_frames`."""
    raise NotImplementedError(
        "video codecs are not installed in this container; "
        "use fake_sample_frames for plumbing tests"
    )


FEATURE_DIM = 16  # md5 digest bytes

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
    ]
)


def fake_feature_vector(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic feature-extraction stage over `mapInPandas`: each
    binary payload becomes a FEATURE_DIM-dim double vector (md5 digest
    bytes / 255). Shape-identical to a real embedding-extraction UDF
    (binary in, `array<double>` out, one row per input), so its output
    feeds the similarity operators directly — and because the vector
    is hash-derived it is reproducible in the DuckDB oracle."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "vec": pdf[payload_col].map(
                        lambda b: [
                            x / 255.0 for x in hashlib.md5(bytes(b)).digest()
                        ]
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def fake_sample_frames(
    df: DataFrame,
    n_frames: int = 3,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic frame-sampling stand-in: 1 input row → `n_frames`
    output rows (media_id, frame_idx, md5(payload || ':' || idx)) —
    exercises the row-EXPANDING mapInPandas contract a real video
    sampler has (output batches larger than input batches)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sums = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                for i in range(n_frames):
                    ids.append(int(mid))
                    idxs.append(i)
                    sums.append(
                        hashlib.md5(bytes(payload) + f":{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_checksum": sums,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=FRAME_SCHEMA)


PCM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("rms_micro", T.LongType()),
    ]
)


def pcm16_stats(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    data_offset: int = 44,
) -> DataFrame:
    """REAL audio decode — not a stub: 16-bit PCM needs no codec, so
    the sample data after the 44-byte WAV header is decoded with
    `np.frombuffer(..., '<i2')` inside Arrow-batched `mapInPandas` and
    reduced to per-file loudness stats (sample count, exact integer
    energy Σv², peak |v|, micro-quantized RMS). This is the exact
    plumbing the codec-gated image/video decoders document
    (binary in → vectorized numpy → typed rows out), exercised END TO
    END on bytes that are genuinely decoded, and it is what an audio
    lake runs for silence/clipping screens before anything ships to
    GPUs.

    Determinism: Σv² and peak are exact integers; RMS is
    sqrt(sum_sq/n) — one IEEE divide (sum_sq < 2^53, exactly
    representable) and one correctly-rounded sqrt on identical inputs
    in any engine — quantized to integer micro-units."""
    import math

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ns, sqs, pks, rms = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                samples = np.frombuffer(
                    bytes(payload)[data_offset:], dtype="<i2"
                )
                n = int(samples.size)
                wide = samples.astype(np.int64)
                ss = int((wide * wide).sum()) if n else 0
                pk = int(np.abs(wide).max()) if n else 0
                r = (
                    int(math.floor(math.sqrt(ss / n) * 1e6 + 0.5))
                    if n
                    else 0
                )
                ids.append(int(mid))
                ns.append(n)
                sqs.append(ss)
                pks.append(pk)
                rms.append(r)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sum_sq": pd.Series(sqs, dtype="int64"),
                    "peak": pd.Series(pks, dtype="int64"),
                    "rms_micro": pd.Series(rms, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=PCM_STATS_SCHEMA
    )


def fake_decode_meta(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic stand-in decoder over `mapInPandas`.

    Consumes Arrow batches of (id, payload-bytes), emits typed metadata
    rows: md5 checksum and fake dimensions derived from the payload
    bytes. Shape-identical to what a real decoder stage returns, so the
    partitioning / schema / batch contract is fully tested.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int32"),
                    "checksum_hex": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fake_width": payloads.map(
                        lambda b: (len(b) % 640) + 1
                    ).astype("int32"),
                    "fake_height": payloads.map(
                        lambda b: (bytes(b)[0] if len(b) else 0) + 1
                    ).astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=DECODED_META_SCHEMA
    )
