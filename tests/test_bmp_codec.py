"""Vendored BMP codec: bit-exact 24-bit round-trips (odd widths exercise
row padding), top-down and 32-bit decoder paths via hand-built fixtures,
dispatch through decode_image, and unsupported-variant errors."""

from __future__ import annotations

import numpy as np
import pytest

from simpy__kafka__flink__kafka_spark.functions.bmp import (
    decode_bmp, encode_bmp)
from simpy__kafka__flink__kafka_spark.functions.multimodal import decode_image


def _noise(h: int, w: int, seed: int = 6) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


@pytest.mark.parametrize("dims", [(8, 8), (9, 7), (3, 5)])  # odd: padding
def test_roundtrip_bit_exact(dims):
    img = _noise(*dims)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def _hand_bmp(px: np.ndarray, bpp: int, top_down: bool) -> bytes:
    h, w = px.shape[:2]
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    raster = np.zeros((h, stride), np.uint8)
    bgr = px[:, :, ::-1]
    if nch == 4:
        bgr = np.concatenate([bgr, np.full((h, w, 1), 255, np.uint8)], 2)
    rows = bgr if top_down else bgr[::-1]
    raster[:, : w * nch] = rows.reshape(h, w * nch)
    data = raster.tobytes()
    out = bytearray(b"BM")
    out += (54 + len(data)).to_bytes(4, "little")
    out += b"\x00" * 4 + (54).to_bytes(4, "little")
    out += (40).to_bytes(4, "little") + w.to_bytes(4, "little")
    out += (h if not top_down else -h).to_bytes(4, "little", signed=True)
    out += (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
    out += (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
    out += b"\x00" * 16 + data
    return bytes(out)


def test_top_down_and_32bit_paths():
    img = _noise(6, 5)
    assert np.array_equal(decode_bmp(_hand_bmp(img, 24, top_down=True)), img)
    assert np.array_equal(decode_bmp(_hand_bmp(img, 32, top_down=False)), img)
    assert np.array_equal(decode_bmp(_hand_bmp(img, 32, top_down=True)), img)


def test_decode_image_dispatches_bmp():
    img = _noise(4, 9)
    assert np.array_equal(decode_image(encode_bmp(img)), img)


def test_unsupported_variants_raise():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX nope")
    raw = bytearray(encode_bmp(_noise(4, 4)))
    raw[28] = 8  # 8-bit paletted
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp(bytes(raw))


def test_resize_bmp_reencodes_in_kind():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        resize_image)
    img = _noise(16, 12)
    out = resize_image(encode_bmp(img), 6, 8)
    assert out[:2] == b"BM"
    expect = img[(np.arange(8) * 16 // 8)][:, (np.arange(6) * 12 // 6)]
    assert np.array_equal(decode_bmp(out), expect)
