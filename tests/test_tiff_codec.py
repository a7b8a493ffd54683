"""Vendored baseline TIFF codec: bit-exact round-trips (uncompressed and
PackBits), grayscale + both photometric polarities, big-endian byte
order, multi-strip layout, dispatch through decode_image, and
unsupported-variant errors."""

from __future__ import annotations

import numpy as np
import pytest

from simpy__kafka__flink__kafka_spark.functions.multimodal import decode_image
from simpy__kafka__flink__kafka_spark.functions.tiff import (
    _packbits_decode, _packbits_encode, decode_tiff, encode_tiff)


def _noise(h: int, w: int, seed: int = 4) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


def test_uncompressed_roundtrip_bit_exact():
    img = _noise(23, 17)
    assert np.array_equal(decode_tiff(encode_tiff(img)), img)


def test_packbits_roundtrip_and_compression():
    img = _noise(23, 17)
    assert np.array_equal(decode_tiff(encode_tiff(img, packbits=True)), img)
    runs = np.repeat(np.arange(8, dtype=np.uint8) * 30, 90).reshape(24, 30)
    runs3 = np.stack([runs] * 3, 2)
    raw = encode_tiff(runs3, packbits=True)
    assert len(raw) < 24 * 30 * 3 // 4     # real compression on runs
    assert np.array_equal(decode_tiff(raw), runs3)


def test_packbits_stream_edge_cases():
    data = bytes([1, 2, 3, 3, 3, 3, 7, 8, 9, 9, 5] * 50)
    assert _packbits_decode(_packbits_encode(data), len(data)) == data
    with pytest.raises(ValueError, match="truncated"):
        _packbits_decode(_packbits_encode(data)[:3], len(data))


def _gray_tiff(px: np.ndarray, bo: str, photometric: int,
               strips: int = 1) -> bytes:
    """Hand-built grayscale TIFF in either byte order, optionally split
    into multiple strips — exercises decoder paths the product encoder
    (little-endian chunky RGB, single strip) does not emit."""
    h, w = px.shape
    rows_per = -(-h // strips)
    strip_data = [px[i * rows_per:(i + 1) * rows_per].tobytes()
                  for i in range(strips)]

    def b(v: int, n: int) -> bytes:
        return v.to_bytes(n, bo)  # type: ignore[arg-type]

    entries = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
               (259, 3, 1, 1), (262, 3, 1, photometric),
               (273, 4, strips, None), (277, 3, 1, 1),
               (278, 3, 1, rows_per), (279, 4, strips, None)]
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    arr_off = ifd_off + ifd_len
    offsets_arr_len = 4 * strips if strips > 1 else 0
    counts_arr_len = 4 * strips if strips > 1 else 0
    data_off = arr_off + offsets_arr_len + counts_arr_len
    strip_offs = []
    o = data_off
    for sd in strip_data:
        strip_offs.append(o)
        o += len(sd)
    out = bytearray((b"II" if bo == "little" else b"MM"))
    out += b(42, 2) + b(ifd_off, 4)
    out += b(len(entries), 2)
    for tag, typ, cnt, val in entries:
        out += b(tag, 2) + b(typ, 2) + b(cnt, 4)
        if tag == 273:
            if strips == 1:
                out += b(strip_offs[0], 4)
            else:
                out += b(arr_off, 4)
        elif tag == 279:
            if strips == 1:
                out += b(len(strip_data[0]), 4)
            else:
                out += b(arr_off + offsets_arr_len, 4)
        elif typ == 3:
            # SHORT value left-justified in the 4-byte field
            out += b(val, 2) + b(0, 2)
        else:
            out += b(val, 4)
    out += b(0, 4)
    if strips > 1:
        for so in strip_offs:
            out += b(so, 4)
        for sd in strip_data:
            out += b(len(sd), 4)
    for sd in strip_data:
        out += sd
    return bytes(out)


def test_grayscale_big_endian_and_polarity():
    g = (np.mgrid[0:9, 0:7][0] * 29 % 256).astype(np.uint8)
    for bo in ("little", "big"):
        out = decode_tiff(_gray_tiff(g, bo, photometric=1))
        assert np.array_equal(out[:, :, 0], g) and out.shape == (9, 7, 3)
        inv = decode_tiff(_gray_tiff(g, bo, photometric=0))  # WhiteIsZero
        assert np.array_equal(inv[:, :, 0], 255 - g)


def test_multi_strip_layout():
    g = (np.mgrid[0:10, 0:6][1] * 37 % 256).astype(np.uint8)
    out = decode_tiff(_gray_tiff(g, "little", photometric=1, strips=3))
    assert np.array_equal(out[:, :, 0], g)


def test_decode_image_dispatches_tiff():
    img = _noise(8, 6)
    assert np.array_equal(decode_image(encode_tiff(img)), img)


def test_unsupported_variants_raise():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"II+\x00 not tiff")
    img = _noise(8, 6)
    raw = bytearray(encode_tiff(img))
    # rewrite Compression (tag 259) value to 2 (CCITT Group 3)
    i = raw.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    raw[i + 8] = 2
    with pytest.raises(ValueError, match="unsupported TIFF compression"):
        decode_tiff(bytes(raw))


def test_lzw_roundtrip_and_width_growth():
    from simpy__kafka__flink__kafka_spark.functions.tiff import (
        _lzw_decode_tiff, _lzw_encode_tiff)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (23, 17, 3), np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(img, lzw=True)), img)
    # 90x80 noise pushes the code width through 10/11/12 bits and over
    # the 4094-entry reset; runs compress >10x
    big = rng.integers(0, 256, (90, 80, 3), np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(big, lzw=True)), big)
    runs = np.repeat(np.arange(8, dtype=np.uint8) * 30, 300).reshape(40, 60)
    r3 = np.stack([runs] * 3, 2)
    enc = encode_tiff(r3, lzw=True)
    assert len(enc) < 40 * 60 * 3 // 10
    assert np.array_equal(decode_tiff(enc), r3)
    data = bytes((rng.integers(0, 8, 30000, np.uint8) * 31).astype(np.uint8))
    assert _lzw_decode_tiff(_lzw_encode_tiff(data), len(data)) == data
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode_tiff(_lzw_encode_tiff(data)[:10], len(data))


def test_jpeg_in_tiff_rejected():
    img = _noise(8, 6)
    raw = bytearray(encode_tiff(img, lzw=True))
    i = raw.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
    raw[i + 8] = 7  # JPEG-in-TIFF
    with pytest.raises(ValueError, match="unsupported TIFF compression"):
        decode_tiff(bytes(raw))
