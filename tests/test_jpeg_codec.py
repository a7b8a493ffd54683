"""Vendored baseline JPEG codec: encoder/decoder round-trips at pinned
error bounds, 4:2:0 subsampling + restart markers, grayscale, dispatch
through decode_image/resize_image, the executed Arrow path, progressive
(SOF2) decode asserted bit-exact against sequential, and the remaining
unsupported-variant error contract (arithmetic-coded SOF9)."""

from __future__ import annotations

import numpy as np
import pytest

from simpy__kafka__flink__kafka_spark.functions.jpeg import (
    ZIGZAG, decode_jpeg, encode_jpeg)
from simpy__kafka__flink__kafka_spark.functions.multimodal import (
    decode_image, image_stats, resize_image)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 7) % 256, (xx * 11) % 256, ((yy + xx) * 3) % 256], 2
    ).astype(np.uint8)


def test_zigzag_is_a_permutation_with_known_prefix():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # T.81 figure 5: first six entries of the scan
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_flat_color_quality_100_is_bit_exact():
    img = np.full((16, 24, 3), [200, 30, 90], np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)


def test_gradient_roundtrip_error_bounds():
    img = _gradient(21, 13)  # odd dims exercise MCU padding + crop
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.mean() < 2.0 and d.max() <= 8


def test_noise_roundtrip_bounded_loss():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.mean() < 10.0 and d.max() < 64


def test_420_subsampling_with_restart_markers():
    # smooth non-wrapping gradient: chroma averaging across a 255->0 wrap
    # edge would dominate the error with legitimate (huge) JPEG loss
    yy, xx = np.mgrid[0:48, 0:37]
    img = np.stack([yy * 2, xx * 3, yy + xx], 2).astype(np.uint8)
    # 3x3 MCU grid at 4:2:0 -> 4 restart markers
    raw = encode_jpeg(img, quality=90, subsampling="4:2:0", restart_interval=2)
    assert b"\xff\xdd" in raw          # DRI emitted
    assert b"\xff\xd0" in raw          # at least one RST0
    out = decode_jpeg(raw)
    assert out.shape == img.shape
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.mean() < 4.0 and d.max() <= 16


def test_grayscale_single_component_replicates_channels():
    yy, xx = np.mgrid[0:17, 0:9]
    g = (yy * xx % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (17, 9, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])
    d = np.abs(out[:, :, 0].astype(int) - g.astype(int))
    assert d.max() <= 2


def test_decode_image_dispatches_jpeg():
    img = _gradient(16, 16)
    out = decode_image(encode_jpeg(img, quality=90))
    assert out.shape == (16, 16, 3)


def test_resize_jpeg_decodes_to_expected_dims():
    img = _gradient(32, 32)
    resized = resize_image(encode_jpeg(img, quality=90), 8, 12)
    assert resized[:2] == b"\xff\xd8"  # re-encoded as JPEG
    out = decode_jpeg(resized)
    assert out.shape == (12, 8, 3)
    # nearest-neighbor of a smooth gradient survives two lossy passes
    expect = img[(np.arange(12) * 32 // 12)][:, (np.arange(8) * 32 // 8)]
    d = np.abs(out.astype(int) - expect.astype(int))
    assert d.mean() < 6.0


def test_progressive_decode_is_bit_identical_to_sequential():
    # both modes transport the same quantized coefficients, so the decoded
    # images must match EXACTLY — any desync in the progressive scan
    # machinery (EOBRUN, ZRL, AC correction bits) breaks equality
    rng = np.random.default_rng(3)
    cases = [
        (np.full((16, 24, 3), [200, 30, 90], np.uint8), "4:4:4"),
        (_gradient(21, 13), "4:4:4"),
        (_gradient(48, 37), "4:2:0"),        # odd dims: true-grid AC scans
        (rng.integers(0, 256, (32, 32, 3), np.uint8), "4:4:4"),
        (rng.integers(0, 256, (17, 9, 3), np.uint8), "4:2:0"),
    ]
    for img, sub in cases:
        seq = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg(img, quality=85, subsampling=sub, progressive=True))
        assert np.array_equal(prog, seq), (img.shape, sub)


def test_progressive_grayscale_and_scan_structure():
    g = (np.mgrid[0:17, 0:9][0] * 13 % 256).astype(np.uint8)
    raw = encode_jpeg(g, quality=85, progressive=True)
    assert b"\xff\xc2" in raw              # SOF2
    assert raw.count(b"\xff\xda") == 4     # DC first/refine + AC first/refine
    seq = decode_jpeg(encode_jpeg(g, quality=85))
    assert np.array_equal(decode_jpeg(raw), seq)


def test_arithmetic_coded_sof9_raises_value_error():
    img = _gradient(8, 8)
    raw = bytearray(encode_jpeg(img, quality=90))
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(ValueError, match="SOF9"):
        decode_jpeg(bytes(raw))


def test_truncated_and_non_jpeg_raise_value_error():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    img = _gradient(8, 8)
    raw = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(raw[:20])  # header cut mid-segment


def test_image_stats_arrow_path_over_jpeg(spark):
    rows = []
    for doc_id, (h, w) in enumerate([(8, 8), (16, 24), (21, 13)]):
        img = _gradient(h, w)
        rows.append((doc_id, bytearray(encode_jpeg(img, quality=95)),
                     ("image/jpeg", 0)))
    df = spark.createDataFrame(
        rows, "doc_id long, content binary, "
        "media_meta struct<media_type:string,n_bytes:long>")
    got = {r["doc_id"]: r for r in image_stats(df).collect()}
    assert got[0]["width"] == 8 and got[0]["height"] == 8
    assert got[1]["width"] == 24 and got[1]["height"] == 16
    assert got[2]["width"] == 13 and got[2]["height"] == 21
    # channel means within JPEG loss of the source image
    img2 = _gradient(16, 24)
    for c in range(3):
        assert abs(got[1]["mean_rgb"][c] - img2[:, :, c].mean()) < 3.0


def test_undeclared_scan_component_raises_value_error():
    raw = bytearray(encode_jpeg(_gradient(8, 8), quality=90))
    i = raw.find(b"\xff\xda")
    raw[i + 5] = 9  # scan selector -> component id 9 (not in SOF)
    with pytest.raises(ValueError, match="undeclared component"):
        decode_jpeg(bytes(raw))


def test_dqt_payload_is_zigzag_ordered():
    # quality 50 stores the Annex-K-shaped base table verbatim; the DQT
    # segment must carry it in ZIGZAG order: 16, 11, 12, 14, 12, ...
    # (naturals (0,0),(0,1),(1,0),(2,0),(1,1)).  A natural-order payload
    # would read 16, 11, 10, 16, 24 — regression for the gather/scatter
    # direction mix-up that self-consistent round-trips cannot catch.
    raw = encode_jpeg(_gradient(16, 16), quality=50)
    i = raw.find(b"\xff\xdb")
    payload = raw[i + 5:i + 5 + 64]
    assert list(payload[:6]) == [16, 11, 12, 14, 12, 10]


def test_exif_roundtrip_and_absence():
    from simpy__kafka__flink__kafka_spark.functions.jpeg import (
        build_exif_app1, jpeg_exif)

    app1 = build_exif_app1(6, "CamCo", "X100", "2026:08:16 12:00:00",
                           "2026:08:15 09:30:00")
    jpg = b"\xff\xd8" + app1 + b"\xff\xd9"
    got = jpeg_exif(jpg)
    assert got == {"has_exif": 1, "orientation": 6, "make": "CamCo",
                   "model": "X100", "datetime": "2026:08:16 12:00:00",
                   "datetime_original": "2026:08:15 09:30:00"}
    assert jpeg_exif(b"\xff\xd8\xff\xd9")["has_exif"] == 0


def test_exif_big_endian_and_past_other_segments():
    # MM byte order + APP0 before APP1: the scan must skip unrelated
    # segments and honor the declared byte order
    from simpy__kafka__flink__kafka_spark.functions.jpeg import (
        EXIF_TAG_ORIENTATION, jpeg_exif)

    ifd = (1).to_bytes(2, "big") + (
        EXIF_TAG_ORIENTATION.to_bytes(2, "big") + (3).to_bytes(2, "big")
        + (1).to_bytes(4, "big") + (8).to_bytes(2, "big") + b"\0\0"
    ) + (0).to_bytes(4, "big")
    tiff = b"MM" + (42).to_bytes(2, "big") + (8).to_bytes(4, "big") + ifd
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\0" * 9
    jpg = b"\xff\xd8" + app0 + app1 + b"\xff\xd9"
    assert jpeg_exif(jpg)["orientation"] == 8


def test_exif_malformed_typed():
    import pytest

    from simpy__kafka__flink__kafka_spark.functions.jpeg import jpeg_exif

    with pytest.raises(ValueError):
        jpeg_exif(b"not a jpeg")
    # APP1 declaring a length past the buffer
    bad = b"\xff\xd8\xff\xe1" + (5000).to_bytes(2, "big") + b"Exif\x00\x00"
    with pytest.raises(ValueError):
        jpeg_exif(bad)


def test_jpeg_exif_stats_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["jpeg_exif_stats"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "jpeg_exif_stats")


def test_exif_out_of_range_orientation_reads_absent(spark):
    from simpy__kafka__flink__kafka_spark.functions.jpeg import (
        EXIF_TAG_ORIENTATION, jpeg_exif, jpeg_exif_stats)

    # orientation as LONG with a value past int32
    ifd = (1).to_bytes(2, "little") + (
        EXIF_TAG_ORIENTATION.to_bytes(2, "little")
        + (4).to_bytes(2, "little") + (1).to_bytes(4, "little")
        + (2**31 + 7 & 0xFFFFFFFF).to_bytes(4, "little")
    ) + (0).to_bytes(4, "little")
    tiff = b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little") + ifd
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    jpg = b"\xff\xd8" + app1 + b"\xff\xd9"
    assert jpeg_exif(jpg)["orientation"] is None
    media = spark.createDataFrame([(1, bytearray(jpg))],
                                  "doc_id long, content binary")
    row = jpeg_exif_stats(media).collect()[0]
    assert row["has_exif"] == 1 and row["orientation"] is None
