"""png_pixel_stats decodes REAL PNGs — including what the registry's
`media_png_pixels` synth deliberately can't exercise: dynamically
compressed deflate streams (the synth writes stored blocks so pure
expressions suffice), the sequential Average/Paeth filters, multi-IDAT
files, and corrupt-chunk rejection. The encoder here is its own code
path (zlib.compress + forward filtering), so agreement is a genuine
round-trip proof, not the decoder reading its own handwriting."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from big_data_analytics_final_project_spark.operators.multimodal import (
    png_pixel_stats,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_rows(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Forward-apply PNG filters (bpp=1) — the encoder side, written
    independently of the decoder's reconstruction."""
    h, w = px.shape
    out = bytearray()
    for r in range(h):
        ft = ftypes[r % len(ftypes)]
        out.append(ft)
        above = px[r - 1].astype(int) if r else np.zeros(w, dtype=int)
        row = px[r].astype(int)
        for c in range(w):
            left = int(row[c - 1]) if c else 0
            ul = int(above[c - 1]) if c else 0
            up = int(above[c])
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            out.append((int(row[c]) - pred) % 256)
    return bytes(out)


def _encode_png(px: np.ndarray, ftypes: list[int], n_idat: int = 1) -> bytes:
    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    z = zlib.compress(_filter_rows(px, ftypes), level=6)
    step = max(1, len(z) // n_idat + 1)
    idats = b"".join(
        _chunk(b"IDAT", z[i : i + step]) for i in range(0, len(z), step)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + idats
        + _chunk(b"IEND", b"")
    )


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "media_id BIGINT, payload BINARY")
    got = png_pixel_stats(df).orderBy("media_id").collect()
    return {r.media_id: r for r in got}


def test_all_filter_types_and_compressed_stream(spark):
    """Average (3) and Paeth (4) filters plus a real zlib.compress
    stream — none of which the expression-synthesized registry PNGs
    use — reconstruct to the exact pixels."""
    rng = np.random.default_rng(7)
    imgs = {
        1: rng.integers(0, 256, size=(9, 13), dtype=np.uint8),
        2: rng.integers(0, 256, size=(5, 7), dtype=np.uint8),
    }
    rows = [
        (1, _encode_png(imgs[1], ftypes=[3, 4, 1, 2, 0])),
        (2, _encode_png(imgs[2], ftypes=[4])),
    ]
    by_id = _stats(spark, rows)
    for mid, px in imgs.items():
        r = by_id[mid]
        wide = px.astype(np.int64)
        assert (r.width, r.height) == (px.shape[1], px.shape[0])
        assert r.n_pixels == px.size
        assert r.px_sum == int(wide.sum())
        assert r.px_min == int(wide.min())
        assert r.px_max == int(wide.max())
        assert r.px_sum_sq == int((wide * wide).sum())


def test_multi_idat_concatenation(spark):
    """IDAT payloads split across several chunks must be concatenated
    before inflate — per the PNG spec the chunk boundaries are
    arbitrary and may fall mid-deflate-symbol."""
    px = np.arange(60, dtype=np.uint8).reshape(6, 10) * 4 % 256
    by_id = _stats(spark, [(5, _encode_png(px, ftypes=[0, 1, 2], n_idat=4))])
    r = by_id[5]
    assert r.n_pixels == 60 and r.px_sum == int(px.astype(np.int64).sum())


def test_bad_crc_rejected(spark):
    px = np.zeros((3, 3), dtype=np.uint8)
    buf = bytearray(_encode_png(px, ftypes=[0]))
    buf[-5] ^= 0xFF  # corrupt IEND's CRC
    df = spark.createDataFrame(
        [(9, bytes(buf))], "media_id BIGINT, payload BINARY"
    )
    with pytest.raises(Exception, match="bad CRC"):
        png_pixel_stats(df).collect()


def test_non_png_rejected(spark):
    df = spark.createDataFrame(
        [(3, b"\xff\xd8\xffnot a png")], "media_id BIGINT, payload BINARY"
    )
    with pytest.raises(Exception, match="bad signature"):
        png_pixel_stats(df).collect()


def test_resize_image_honors_caller_column_names(spark):
    """r8 advice fix: output columns are named after the CALLER's
    id/payload columns — a doc_id in must come back as doc_id, not be
    silently renamed to media_id."""
    from big_data_analytics_final_project_spark.operators.multimodal import (
        encode_png_gray8,
        resize_image,
    )
    import numpy as np

    px = np.arange(12, dtype=np.int64).reshape(3, 4) * 20
    df = spark.createDataFrame(
        [(5, bytearray(encode_png_gray8(px)))], "doc_id: long, blob: binary"
    )
    out = resize_image(df, width=2, height=2, id_col="doc_id",
                       payload_col="blob")
    assert out.columns == ["doc_id", "blob"]
    [r] = out.collect()
    assert r["doc_id"] == 5 and bytes(r["blob"])[:4] == b"\x89PNG"


def test_resize_image_real_roundtrip(spark):
    """resize_image is a REAL resize for the codec-free format: decode
    → nearest-neighbor resample → re-encode. The output must be a
    valid PNG (it round-trips through the decoder) whose pixels equal
    the integer-arithmetic nearest-neighbor mapping of the source —
    downscale and upscale both checked."""
    from big_data_analytics_final_project_spark.operators.multimodal import (
        decode_png_gray8,
        resize_image,
    )

    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, size=(10, 14), dtype=np.uint8)
    rows = [(1, _encode_png(src, ftypes=[0, 1, 2]))]
    df = spark.createDataFrame(rows, "media_id BIGINT, payload BINARY")

    for tw, th in ((7, 5), (21, 15)):
        out = resize_image(df, width=tw, height=th).collect()
        assert len(out) == 1
        w, h, px = decode_png_gray8(bytes(out[0].payload))
        assert (w, h) == (tw, th)
        want = src.astype(np.int64)[
            np.ix_((np.arange(th) * 10) // th, (np.arange(tw) * 14) // tw)
        ]
        assert (px == want).all()


def test_resize_feeds_pixel_stats(spark):
    """Pipeline composition: resize output flows straight back into
    png_pixel_stats (binary contract preserved end to end)."""
    from big_data_analytics_final_project_spark.operators.multimodal import (
        resize_image,
    )

    src = np.arange(48, dtype=np.uint8).reshape(6, 8)
    df = spark.createDataFrame(
        [(7, _encode_png(src, ftypes=[0]))], "media_id BIGINT, payload BINARY"
    )
    stats = png_pixel_stats(resize_image(df, width=4, height=3)).collect()
    assert len(stats) == 1
    r = stats[0]
    want = src.astype(np.int64)[
        np.ix_((np.arange(3) * 6) // 3, (np.arange(4) * 8) // 4)
    ]
    assert (r.width, r.height, r.n_pixels) == (4, 3, 12)
    assert r.px_sum == int(want.sum())
    assert r.px_sum_sq == int((want * want).sum())
