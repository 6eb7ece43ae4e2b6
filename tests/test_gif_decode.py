"""gif_pixel_stats decodes REAL GIFs: the encoder (now hosted in
operators/multimodal.py as `lzw_encode_gif`/`encode_gif` so the
`media_gif_pixels` registry query can synthesize payloads) is a
genuine LZW COMPRESSOR (string-table build, variable-width code
emission, 12-bit cap with CLEAR resets) written independently of the
decoder's table reconstruction, so round-trip agreement proves the
decompression algorithm — including the KwKwK case and width growth —
not just byte shuffling. Container corruption tests pin the validator
behavior."""

from __future__ import annotations


import numpy as np
import pytest

from big_data_analytics_final_project_spark.operators.multimodal import (
    _lzw_decode_gif,
    decode_gif_frame,
    gif_pixel_stats,
)
from big_data_analytics_final_project_spark.operators.multimodal import (
    encode_gif as write_gif,
)
from big_data_analytics_final_project_spark.operators.multimodal import (
    lzw_encode_gif as lzw_encode,
)


def _stats(spark, payload: bytes):
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id: long, payload: binary"
    )
    return gif_pixel_stats(df).collect()[0]


def test_lzw_pure_roundtrip():
    """No Spark, no container: the compressor and decompressor are
    independent implementations, fuzzed over repetitive AND random
    sequences (repetition exercises table growth + KwKwK)."""
    rng = np.random.default_rng(3)
    for trial in range(8):
        n = int(rng.integers(1, 4000))
        if trial % 2:
            seq = rng.integers(0, 256, size=n).tolist()
        else:  # heavy repetition: long runs build deep table chains
            seq = (rng.integers(0, 4, size=max(1, n // 50)).repeat(50))[
                :n
            ].tolist()
        enc = lzw_encode(seq, 8)
        assert _lzw_decode_gif(enc, 8, len(seq)) == seq


def test_gif_decode_roundtrip(spark):
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, size=(11, 13), dtype=np.int64)
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    w, h, got_idx, got_pal = decode_gif_frame(write_gif(idx, palette))
    assert (w, h) == (13, 11)
    assert (got_idx == idx).all()
    assert (got_pal == palette).all()

    r = _stats(spark, write_gif(idx, palette))
    px = palette[idx.reshape(-1)].astype(np.int64)
    assert (r.width, r.height, r.n_pixels) == (13, 11, 143)
    assert (r.sum_r, r.sum_g, r.sum_b) == tuple(
        int(px[:, c].sum()) for c in range(3)
    )
    assert (r.idx_min, r.idx_max) == (int(idx.min()), int(idx.max()))


def test_gif_small_palette_and_runs(spark):
    """2-bit palette + long runs: the narrow-code path (width starts
    at 3 bits) and table-growth boundaries."""
    idx = np.tile(np.array([[0, 0, 1, 1], [2, 2, 3, 3]]), (6, 7))[:10, :25]
    palette = np.array(
        [[0, 0, 0], [85, 85, 85], [170, 170, 170], [255, 255, 255]],
        dtype=np.uint8,
    )
    r = _stats(spark, write_gif(idx.astype(np.int64), palette, min_code_size=2))
    px = palette[idx.reshape(-1)].astype(np.int64)
    assert r.n_pixels == 250
    assert r.sum_g == int(px[:, 1].sum())


def test_gif_rejects_interlace_and_truncation(spark):
    idx = np.zeros((4, 4), dtype=np.int64)
    palette = np.zeros((2, 3), dtype=np.uint8)
    buf = bytearray(write_gif(idx, palette, min_code_size=2))
    i = buf.index(b"\x2c") + 9  # image descriptor packed byte
    buf[i] |= 0x40
    with pytest.raises(Exception, match="interlaced"):
        decode_gif_frame(bytes(buf))

    good = write_gif(idx, palette, min_code_size=2)
    with pytest.raises(Exception):
        # chop the data sub-blocks: LZW must fail loudly, not pad
        decode_gif_frame(good[:-6] + b"\x00\x3b")


def test_gif_truncation_raises_clean_valueerror():
    """r8 advice fix: sub-block walks are bounded — a payload cut off
    mid-extension or mid-image-data raises the module's clean
    ValueError diagnostics, never IndexError."""
    idx = np.zeros((4, 4), dtype=np.int64)
    palette = np.zeros((2, 3), dtype=np.uint8)
    good = bytearray(write_gif(idx, palette, min_code_size=2))
    # graphic-control-style extension with an unterminated sub-block
    i = good.index(b"\x2c")
    cut = bytes(good[:i]) + b"\x21\xf9\x04"  # extension, then EOF
    with pytest.raises(ValueError, match="truncated GIF"):
        decode_gif_frame(cut)
    # image data cut before the 0-terminator
    with pytest.raises(ValueError):
        decode_gif_frame(bytes(good[:-3]))
