"""Property-based round-trips for the vendored codecs: hypothesis drives
random shapes/contents through every lossless codec asserting BIT-EXACT
reconstruction, and through JPEG asserting shape + bounded error.  Edge
shapes (1-pixel, single row/column, MCU-straddling odd dims) fall out of
the strategies rather than hand-picked fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from simpy__kafka__flink__kafka_spark.functions.bmp import (
    decode_bmp, encode_bmp)
from simpy__kafka__flink__kafka_spark.functions.flac import (
    decode_flac, encode_flac)
from simpy__kafka__flink__kafka_spark.functions.gif import (
    decode_gif, encode_gif)
from simpy__kafka__flink__kafka_spark.functions.jpeg import (
    decode_jpeg, encode_jpeg)
from simpy__kafka__flink__kafka_spark.functions.multimodal import (
    decode_png, encode_png)
from simpy__kafka__flink__kafka_spark.functions.tiff import (
    decode_tiff, encode_tiff)

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _img(seed: int, h: int, w: int, colors: int = 256) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if colors < 256:
        base = rng.integers(0, colors, (h, w, 3))
        return (base * (255 // max(1, colors - 1))).astype(np.uint8)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**32 - 1))
def test_png_roundtrip_property(dims, seed):
    px = _img(seed, *dims)
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**32 - 1),
       interlace=st.booleans())
def test_gif_roundtrip_property(dims, seed, interlace):
    # 6 levels/channel -> at most 216 distinct colors, inside GIF's 256
    px = _img(seed, *dims, colors=6)
    assert np.array_equal(decode_gif(encode_gif(px, interlace=interlace)),
                          px)


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**32 - 1),
       comp=st.sampled_from(["none", "packbits", "lzw"]))
def test_tiff_roundtrip_property(dims, seed, comp):
    px = _img(seed, *dims)
    raw = encode_tiff(px, packbits=comp == "packbits", lzw=comp == "lzw")
    assert np.array_equal(decode_tiff(raw), px)


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_property(dims, seed):
    px = _img(seed, *dims)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=15, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**32 - 1),
       sub=st.sampled_from(["4:4:4", "4:2:0"]),
       progressive=st.booleans())
def test_jpeg_shape_and_bounded_loss_property(dims, seed, sub, progressive):
    px = _img(seed, *dims)
    if sub == "4:2:0":
        # make chroma constant per 2x2 cell: 4:2:0's chroma averaging is
        # then lossless, so the q90 bound applies.  (Adversarial per-pixel
        # chroma under 2x2 averaging is LEGITIMATE large loss, not a bug.)
        h, w = px.shape[:2]
        half = px[::2, ::2]
        px = np.repeat(np.repeat(half, 2, 0), 2, 1)[:h, :w]
    out = decode_jpeg(encode_jpeg(px, quality=90, subsampling=sub,
                                  progressive=progressive))
    assert out.shape == px.shape
    # JPEG is lossy; bound the worst-case error loosely (noise at q90)
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 32


@settings(max_examples=20, deadline=None)
@given(n=st.integers(0, 3000), ch=st.integers(1, 2),
       seed=st.integers(0, 2**32 - 1),
       sub=st.sampled_from(["verbatim", "fixed", "lpc", "auto"]),
       block=st.sampled_from([192, 576, 1024]))
def test_flac_roundtrip_property(n, ch, seed, sub, block):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, (n, ch)).astype(np.int32)
    out, rate = decode_flac(encode_flac(samples, 16000, subframe=sub,
                                        block_size=block))
    assert rate == 16000
    assert np.array_equal(out, samples)


@settings(max_examples=10, deadline=None)
@given(n=st.integers(1, 2000), seed=st.integers(0, 2**32 - 1))
def test_flac_mid_side_roundtrip_property(n, seed):
    rng = np.random.default_rng(seed)
    st2 = rng.integers(-32768, 32768, (n, 2)).astype(np.int32)
    out, _ = decode_flac(encode_flac(st2, 8000, subframe="fixed",
                                     stereo="mid_side"))
    assert np.array_equal(out, st2)
