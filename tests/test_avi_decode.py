"""avi_frame_pixel_stats decodes REAL uncompressed AVIs. The writer
here is an independent code path (struct.pack, not the registry's
Spark byte expressions), so agreement is a genuine round-trip proof —
and the corruption tests pin the container checks (geometry cross-
validation, frame-count audit, stride discipline) that make the
decoder a validator rather than a byte-shoveler."""

from __future__ import annotations

import os
import struct
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_analytics_final_project_spark.operators.multimodal import (
    avi_frame_pixel_stats,
)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        out += b"\x00"  # RIFF word alignment
    return out


def write_avi(frames: list[np.ndarray]) -> bytes:
    """Minimal spec-correct uncompressed 24-bit AVI. `frames` are
    (h, w, 3) uint8 arrays in IMAGE row order (top-down) with the last
    axis in STORED channel order (0=B, 1=G, 2=R) — the writer does the
    bottom-up flip and stride padding itself."""
    h, w, _ = frames[0].shape
    stride = (3 * w + 3) // 4 * 4
    frame_size = stride * h
    avih = struct.pack(
        "<IIIIIIIIII16x",
        33333, 0, 0, 0, len(frames), 0, 1, frame_size, w, h,
    )
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII8x", 0, 0, 0, 0, 1, 30, 0, len(frames), frame_size, 0, 0
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0
    )
    movi_body = b"movi"
    for img in frames:
        rows = bytearray()
        for r in range(h - 1, -1, -1):  # bottom-up storage
            rows += img[r].tobytes()  # already BGR along the last axis
            rows += b"\x00" * (stride - 3 * w)
        movi_body += _chunk(b"00db", bytes(rows))
    hdrl_body = (
        b"hdrl"
        + _chunk(b"avih", avih)
        + _chunk(b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf))
    )
    riff_body = b"AVI " + _chunk(b"LIST", hdrl_body) + _chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _decode(spark, payload: bytes) -> dict:
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id: long, payload: binary"
    )
    return {r.frame_idx: r for r in avi_frame_pixel_stats(df).collect()}


def test_roundtrip_independent_writer(spark):
    """Two random frames; width 5 forces a nonzero stride pad
    (15 bytes -> 16), height 4 exercises the flip."""
    rng = np.random.default_rng(42)
    frames = [
        rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
        for _ in range(2)
    ]
    rows = _decode(spark, write_avi(frames))
    assert set(rows) == {0, 1}
    for fi, img in enumerate(frames):
        got = rows[fi]
        arr = img.astype(np.int64)
        assert (got.width, got.height, got.n_frames) == (5, 4, 2)
        assert got.sum_b == int(arr[:, :, 0].sum())
        assert got.sum_g == int(arr[:, :, 1].sum())
        assert got.sum_r == int(arr[:, :, 2].sum())
        assert got.px_min == int(arr.min())
        assert got.px_max == int(arr.max())
        # image top row = LAST stored scanline: fails without the flip
        assert got.top_row_sum == int(arr[0].sum())


def test_writers_agree(spark):
    """The registry's Spark-expression AVI writer and this struct.pack
    writer encode the same pixel formula; the decoder must see
    identical stats from both — two independent encoders, one
    container format."""
    from big_data_analytics_final_project_spark.queries import (
        multimodal as mm,
    )

    doc_id = 7
    w, h, nf = doc_id % 6 + 4, doc_id % 4 + 3, doc_id % 4 + 2
    frames = []
    for f in range(nf):
        img = np.zeros((h, w, 3), dtype=np.uint8)
        for r in range(h):
            for c in range(w):
                for ch in range(3):  # stored order: 0=B, 1=G, 2=R
                    img[r, c, ch] = (
                        doc_id * 31 + f * 53 + r * 17 + c * 7 + ch * 11
                    ) % 256
        frames.append(img)
    independent = _decode(spark, write_avi(frames))

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame([(doc_id,)], "doc_id: long").select(
            "doc_id",
            F.lit("x").alias("text"),
            F.lit("en").alias("lang"),
            F.lit("t").alias("source"),
            F.lit(1).cast("long").alias("n_chars"),
        ).write.parquet(os.path.join(td, "documents.parquet"))
        registry = {
            r.frame_idx: r for r in mm.media_avi_frames(spark, td).collect()
        }

    assert set(registry) == set(independent) == set(range(nf))
    for fi in registry:
        a, b = registry[fi].asDict(), independent[fi].asDict()
        a.pop("media_id"), b.pop("media_id")  # 7 vs the fixture's 1
        assert a == b


def test_rejects_frame_count_mismatch(spark):
    frames = [np.zeros((3, 4, 3), dtype=np.uint8)] * 2
    buf = bytearray(write_avi(frames))
    i = buf.index(b"avih") + 8 + 16  # dwTotalFrames in the avih body
    struct.pack_into("<I", buf, i, 5)  # claim 5 frames, ship 2
    with pytest.raises(Exception, match="frames"):
        _decode(spark, bytes(buf))


def test_rejects_geometry_disagreement(spark):
    frames = [np.zeros((3, 4, 3), dtype=np.uint8)]
    buf = bytearray(write_avi(frames))
    i = buf.index(b"strf") + 8 + 4  # biWidth in the BITMAPINFOHEADER
    struct.pack_into("<i", buf, i, 9)
    with pytest.raises(Exception, match="geometry"):
        _decode(spark, bytes(buf))


def test_rejects_truncated_frame(spark):
    frames = [np.zeros((3, 4, 3), dtype=np.uint8)]
    buf = bytearray(write_avi(frames))
    i = buf.index(b"00db") + 4
    (size,) = struct.unpack_from("<I", buf, i)
    struct.pack_into("<I", buf, i, size - 4)  # lie about the length
    with pytest.raises(Exception, match="stride"):
        _decode(spark, bytes(buf))
