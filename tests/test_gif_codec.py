"""Vendored GIF codec: bit-exact palette round-trips through a real LZW
compressor (dictionary growth, variable code width, 12-bit reset, KwKwK),
interlacing, dispatch through decode_image, and corrupt-stream errors."""

from __future__ import annotations

import numpy as np
import pytest

from simpy__kafka__flink__kafka_spark.functions.gif import (
    _lzw_decode, _lzw_encode, decode_gif, encode_gif)
from simpy__kafka__flink__kafka_spark.functions.multimodal import decode_image


def _few_color(h: int, w: int, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = (rng.integers(0, 5, (h, w)) * 50).astype(np.uint8)
    return np.stack([base, 255 - base, base // 2], 2)


def test_roundtrip_bit_exact():
    img = _few_color(37, 23)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_interlaced_roundtrip():
    img = _few_color(37, 23)
    raw = encode_gif(img, interlace=True)
    assert np.array_equal(decode_gif(raw), img)


def test_256_colors_exercise_width_growth():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (80, 90), np.uint8)
    img = np.stack([g, g, g], 2)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_long_runs_exercise_kwkwk():
    runs = np.repeat(np.arange(8, dtype=np.uint8) * 30, 100).reshape(20, 40)
    img = np.stack([runs, runs, runs], 2)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_lzw_stream_roundtrip_and_truncation():
    data = bytes([1, 2, 3, 1, 2, 3, 1, 2, 3, 0] * 20)
    enc = _lzw_encode(2, data)
    assert _lzw_decode(2, enc, len(data)) == data
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(2, enc[:2], len(data))


def test_too_many_colors_rejected():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)  # ~1000 unique colors
    with pytest.raises(ValueError, match="unique colors"):
        encode_gif(img)


def test_decode_image_dispatches_gif():
    img = _few_color(12, 8)
    out = decode_image(encode_gif(img))
    assert np.array_equal(out, img)


def test_non_gif_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG? nope")


def test_corrupt_first_code_after_clear_raises_value_error():
    # first code after CLEAR outside the table must raise the documented
    # ValueError, not KeyError (regression)
    # min_size=2: clear=4, end=5; pack codes [4, 7] LSB-first at width 3
    acc = 4 | (7 << 3)
    data = bytes([acc & 0xFF])
    with pytest.raises(ValueError, match="corrupt GIF LZW code"):
        _lzw_decode(2, data, 4)
