"""Multimodal metadata query — oracle-checkable part of the binary
plumbing (operators/multimodal.py). The testdata has no media blobs, so
the payload is the utf-8 encoding of `documents.text`: the binary
column mechanics (byte length, magic sniff, hex digest) are identical
to a real media table's metadata pass."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    fake_feature_vector,
    fake_sample_frames,
    with_binary_meta,
)
from ..operators.similarity import cosine_sql, knn_bruteforce
from ..sources import load_table
from . import QuerySpec


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        with_binary_meta(_payloads(spark, sf_dir))
        .select(
            "media_id",
            "byte_len",
            "format",
            F.lower(F.hex(F.substring(F.col("payload"), 1, 8))).alias("head_hex"),
            F.md5(F.col("payload")).alias("payload_md5"),
        )
        .orderBy("media_id")
    )


BINARY_META_SQL = """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS byte_len,
       'unknown' AS format,
       lower(substring(hex(encode(text)), 1, 16)) AS head_hex,
       md5(text) AS payload_md5
FROM documents
ORDER BY media_id
"""


def media_png_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural binary parse with PURE expressions — no UDF, no
    codec: each doc gets a deterministic, spec-correct PNG header
    (signature + IHDR chunk, width/height derived from doc_id), and
    the query recovers the dimensions by offset arithmetic on the
    binary (big-endian uint32 at bytes 17-20 / 21-24), plus the magic
    sniff. The oracle re-derives width/height from first principles —
    the hash match proves the parse reads exactly what was encoded.

    At 100 TB this is the metadata pass a media lake runs BEFORE any
    decode: JVM-side, codegen'd, one scan, zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    width = (F.col("doc_id") % 1920 + 16).cast("bigint")
    height = ((F.col("doc_id") * 7) % 1080 + 16).cast("bigint")
    payload = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A0000000D49484452"),  # sig + len + IHDR
            F.lpad(F.hex(width), 8, "0"),
            F.lpad(F.hex(height), 8, "0"),
            F.lit("0802000000"),  # bit depth, color, comp, filter, interlace
        )
    )
    synthesized = docs.select(
        F.col("doc_id").alias("media_id"), payload.alias("payload")
    )
    parsed = with_binary_meta(synthesized).select(
        "media_id",
        "format",
        "byte_len",
        F.conv(F.hex(F.substring(F.col("payload"), 17, 4)), 16, 10)
        .cast("bigint")
        .alias("width"),
        F.conv(F.hex(F.substring(F.col("payload"), 21, 4)), 16, 10)
        .cast("bigint")
        .alias("height"),
    )
    return parsed.orderBy("media_id")


MEDIA_PNG_DIMS_SQL = """
SELECT doc_id AS media_id,
       'png' AS format,
       29 AS byte_len,
       CAST(doc_id % 1920 + 16 AS BIGINT) AS width,
       CAST((doc_id * 7) % 1080 + 16 AS BIGINT) AS height
FROM documents
ORDER BY media_id
"""


_N_MEDIA_QUERIES = 3
_K_MEDIA = 3
_N_FRAMES = 3

# md5 hex pair → byte value, shared by the feature-vector oracle.
_HEXPOS = "(strpos('0123456789abcdef', h[{hi}]) - 1)"


def _hexbyte(i: int) -> str:
    """SQL for md5-digest byte i (0-based) from hex string column h."""
    hi = _HEXPOS.format(hi=2 * i + 1)
    lo = _HEXPOS.format(hi=2 * i + 2)
    return f"({hi} * 16 + {lo})"


def media_feature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal pipeline end-to-end: binary payloads →
    Arrow-batched mapInPandas feature extraction (operators/multimodal.
    fake_feature_vector, the stand-in for a real embedding UDF) → exact
    cosine top-k (operators/similarity.knn_bruteforce). The oracle
    rebuilds the identical md5-derived vectors in SQL — so the WHOLE
    pipeline including the Python batch stage is value-checked."""
    feats = fake_feature_vector(_payloads(spark, sf_dir))
    return knn_bruteforce(
        feats,
        lambda c: c < _N_MEDIA_QUERIES,
        k=_K_MEDIA,
        id_col="media_id",
        vec_col="vec",
    )


def _media_feature_knn_sql() -> str:
    vec = ", ".join(f"{_hexbyte(i)} / 255.0" for i in range(16))
    cos = cosine_sql("q.qv", "c.cv")
    return f"""
WITH hashed AS (SELECT doc_id AS _id, md5(text) AS h FROM documents),
base AS (SELECT _id, [{vec}] AS _v FROM hashed),
queries AS (SELECT _id AS query_id, _v AS qv FROM base WHERE _id < {_N_MEDIA_QUERIES}),
cands AS (SELECT _id AS neighbor_id, _v AS cv FROM base),
scored AS (
  SELECT q.query_id, c.neighbor_id, {cos} AS cosine_sim
  FROM cands c CROSS JOIN queries q
  WHERE c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cosine_sim
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
  ) AS rank
  FROM scored
)
WHERE rank <= {_K_MEDIA}
ORDER BY query_id, rank
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding mapInPandas (1 payload → N frame rows) — the
    frame-sampling batch contract, value-checked via deterministic
    per-frame checksums."""
    frames = fake_sample_frames(_payloads(spark, sf_dir), n_frames=_N_FRAMES)
    return frames.orderBy("media_id", "frame_idx")


MEDIA_FRAME_SAMPLE_SQL = f"""
SELECT doc_id AS media_id, CAST(r.i AS INT) AS frame_idx,
       md5(text || ':' || r.i) AS frame_checksum
FROM documents, range(0, {_N_FRAMES}) r(i)
ORDER BY media_id, frame_idx
"""


QUERIES: dict[str, QuerySpec] = {
    "binary_meta": QuerySpec(binary_meta, BINARY_META_SQL),
    "media_png_dims": QuerySpec(media_png_dims, MEDIA_PNG_DIMS_SQL),
    "media_feature_knn": QuerySpec(media_feature_knn, _media_feature_knn_sql()),
    "media_frame_sample": QuerySpec(media_frame_sample, MEDIA_FRAME_SAMPLE_SQL),
}
