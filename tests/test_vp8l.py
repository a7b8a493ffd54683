"""VP8L lossless-WebP codec (functions/vp8l.py): encode->decode
roundtrips across all tree shapes, the decoder's LZ77 and color-cache
paths via hand-built bitstreams, and the typed seams."""

from __future__ import annotations

import numpy as np
import pytest

from simpy__kafka__flink__kafka_spark.functions.vp8l import (
    _canonical, _flat_lengths, _LsbWriter, _write_tree, decode_vp8l,
    encode_vp8l)


def test_roundtrip_property_random_images():
    rng = np.random.RandomState(11)
    for h, w, k in [(4, 8, 16), (3, 5, 3), (1, 1, 1), (7, 2, 256),
                    (2, 2, 2), (5, 9, 7), (14, 3, 200)]:
        img = rng.randint(0, k, size=(h, w, 4)).astype(np.uint8)
        dec = decode_vp8l(encode_vp8l(img))
        assert np.array_equal(dec, img), (h, w, k)


def test_subtract_green_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(6, 7, 4)).astype(np.uint8)
    buf = encode_vp8l(img, subtract_green=True)
    assert np.array_equal(decode_vp8l(buf), img)
    # the transform changes the BITSTREAM, not the pixels
    assert buf != encode_vp8l(img)


def test_container_and_dims_agree():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        image_dims)

    img = np.full((6, 10, 4), 42, dtype=np.uint8)
    buf = encode_vp8l(img)
    assert image_dims(buf) == ("webp", 10, 6)
    assert np.array_equal(decode_vp8l(buf), img)


def _header(w: _LsbWriter, wd: int, h: int, cache_bits: int = 0) -> None:
    w.bits(wd - 1, 14)
    w.bits(h - 1, 14)
    w.bits(0, 1)            # alpha hint
    w.bits(0, 3)            # version
    w.bits(0, 1)            # no transforms
    if cache_bits:
        w.bits(1, 1)
        w.bits(cache_bits, 4)
    else:
        w.bits(0, 1)
    w.bits(0, 1)            # no entropy image


def test_lz77_backward_copy_direct_distance():
    """Pixels [A, B, B, B, B]: two literals then a (len 3, dist 1)
    backward reference.  Distance prefix code 13 + 5 extra bits 24
    decodes to value 121 -> direct distance 1 (the >120 path)."""
    w = _LsbWriter()
    _header(w, 5, 1)
    greens = {10: 1, 20: 2, 258: 2}        # 258 = length code 2 (len 3)
    _write_tree(w, greens)
    for chan_val in (7, 9, 255):           # red, blue, alpha: single
        _write_tree(w, {chan_val: 1})
    _write_tree(w, {13: 1})                # distance tree: code 13 only
    g = _canonical(greens)
    w.code(*g[10])                         # literal A (r/b/a zero-bit)
    w.code(*g[20])                         # literal B
    w.code(*g[258])                        # length code 2 -> len 3
    w.bits(24, 5)                          # distance extra bits
    buf = bytes([0x2F]) + w.payload()
    dec = decode_vp8l(buf)
    assert dec.shape == (1, 5, 4)
    assert list(dec[0, :, 1]) == [10, 20, 20, 20, 20]
    assert list(dec[0, :, 0]) == [7] * 5 and list(dec[0, :, 3]) == [255] * 5


def test_color_cache_hit():
    """Literal pixel, then a cache reference resolving to it."""
    cache_bits = 4
    argb = (255 << 24) | (7 << 16) | (10 << 8) | 9
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    w = _LsbWriter()
    _header(w, 2, 1, cache_bits=cache_bits)
    greens = {10: 1, 256 + 24 + idx: 1}
    _write_tree(w, greens)
    for chan_val in (7, 9, 255):
        _write_tree(w, {chan_val: 1})
    _write_tree(w, {13: 1})
    g = _canonical(greens)
    w.code(*g[10])
    w.code(*g[256 + 24 + idx])
    dec = decode_vp8l(bytes([0x2F]) + w.payload())
    assert list(dec[0, :, 1]) == [10, 10]
    assert list(dec[0, :, 2]) == [9, 9]


def test_typed_seams_and_errors():
    img = np.zeros((2, 2, 4), dtype=np.uint8)
    full = encode_vp8l(img)
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8l(full[:-2])
    # transform bit set -> documented seam
    w = _LsbWriter()
    w.bits(0, 14); w.bits(0, 14); w.bits(0, 1); w.bits(0, 3)
    w.bits(1, 1)                           # a transform follows
    with pytest.raises(NotImplementedError, match="transform"):
        decode_vp8l(bytes([0x2F]) + w.payload() + bytes(4))
    # entropy image bit -> documented seam
    w = _LsbWriter()
    _header(w, 1, 1)
    b = bytearray(bytes([0x2F]) + w.payload() + bytes(4))
    # header is 14+14+1+3+1+1+1 = 35 bits; entropy bit is bit 34 of the
    # payload -> flip it
    b[1 + (34 >> 3)] |= 1 << (34 & 7)
    with pytest.raises(NotImplementedError, match="entropy"):
        decode_vp8l(bytes(b))
    # near-distance map (code <= 120) -> documented seam
    w = _LsbWriter()
    _header(w, 5, 1)
    greens = {10: 1, 20: 2, 258: 2}
    _write_tree(w, greens)
    for chan_val in (7, 9, 255):
        _write_tree(w, {chan_val: 1})
    _write_tree(w, {2: 1})                 # distance code 2 -> value 3
    g = _canonical(greens)
    w.code(*g[10]); w.code(*g[20]); w.code(*g[258])
    with pytest.raises(NotImplementedError, match="near-distance"):
        decode_vp8l(bytes([0x2F]) + w.payload())


def test_flat_lengths_kraft_exact():
    for k in (1, 2, 3, 5, 16, 100, 256):
        lens = _flat_lengths(list(range(k)))
        if k == 1:
            continue
        assert sum(2.0 ** -v for v in lens.values()) == 1.0


def test_webp_roundtrip_stats_matches_id_arithmetic(spark):
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        webp_roundtrip_stats)

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    got = {r.doc_id: r for r in webp_roundtrip_stats(docs).collect()}
    for i in range(12):
        want_g = sum((i + x + y) % 16 for x in range(8) for y in range(4))
        assert (got[i].width, got[i].height) == (8, 4)
        assert got[i].sum_g == want_g
        assert got[i].lossless == 1
