"""Multimodal metadata query — oracle-checkable part of the binary
plumbing (operators/multimodal.py). The testdata has no media blobs, so
the payload is the utf-8 encoding of `documents.text`: the binary
column mechanics (byte length, magic sniff, hex digest) are identical
to a real media table's metadata pass."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import with_binary_meta
from ..sources import load_table
from . import QuerySpec


def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return (
        with_binary_meta(payloads)
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


QUERIES: dict[str, QuerySpec] = {
    "binary_meta": QuerySpec(binary_meta, BINARY_META_SQL),
}
