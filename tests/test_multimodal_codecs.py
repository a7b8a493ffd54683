"""Vendored dependency-free codecs: P6 PPM decode/resize and PCM WAV
decode, plus the EXECUTED Arrow path (image_stats over mapInPandas) —
these turn the former NotImplementedError seams into live pipelines for
uncompressed formats.  Compressed formats still raise the documented
NotImplementedError (also pinned here)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from simpy__kafka__flink__kafka_spark.functions.multimodal import (
    audio_stats, decode_audio, decode_image, decode_ppm, encode_ppm,
    image_stats, resize_image)


def _ppm_bytes(w: int, h: int, comment: bool = False) -> bytes:
    px = (np.arange(w * h * 3) % 251).astype(np.uint8).reshape(h, w, 3)
    raw = encode_ppm(px)
    if comment:
        raw = raw.replace(b"P6\n", b"P6\n# a comment\n", 1)
    return raw


def _wav_bytes(n_frames: int = 400, rate: int = 8000, ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(ch)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        t = np.arange(n_frames * ch)
        wv.writeframes(
            (np.sin(t / 10.0) * 1000).astype(np.int16).tobytes())
    return buf.getvalue()


def test_ppm_roundtrip_and_comment_header():
    raw = _ppm_bytes(5, 3)
    px = decode_ppm(raw)
    assert px.shape == (3, 5, 3)
    assert encode_ppm(px) == raw
    px2 = decode_ppm(_ppm_bytes(5, 3, comment=True))
    assert np.array_equal(px, px2)


def test_decode_image_dispatches_ppm():
    px = decode_image(_ppm_bytes(4, 4))
    assert px.shape == (4, 4, 3)


def test_decode_image_unsupported_format_raises_documented_seam():
    # WebP is a remaining codec seam (PPM/PNG/JPEG/GIF/TIFF/BMP vendored)
    with pytest.raises(NotImplementedError, match="imaging library"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP garbage")


def _png_bytes(px: np.ndarray, filters: list[int]) -> bytes:
    """Minimal PNG writer with an explicit filter type per scanline —
    forward-filters each row so the decoder's defilter paths all get
    exercised."""
    import struct as st
    import zlib

    h, w, ch = px.shape
    ctype = 2 if ch == 3 else 6
    flat = px.astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y, f in zip(range(h), filters):
        line = flat[y].reshape(-1)
        enc = line.copy()
        if f == 1:
            for x in range(w * ch - 1, ch - 1, -1):
                enc[x] = (line[x] - line[x - ch]) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            for x in range(w * ch):
                left = line[x - ch] if x >= ch else 0
                enc[x] = (line[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            for x in range(w * ch):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pr) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (st.pack(">I", len(data)) + typ + data
                + st.pack(">I", zlib.crc32(typ + data)))

    ihdr = st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decode_all_filter_types():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_png)

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                    [0, 1, 2, 3, 4]):
        got = decode_png(_png_bytes(px, filters))
        assert np.array_equal(got, px), f"filters {filters}"


def test_png_rgba_alpha_dropped_and_dispatch():
    rng = np.random.default_rng(8)
    rgba = rng.integers(0, 256, size=(3, 6, 4), dtype=np.uint8)
    got = decode_image(_png_bytes(rgba, [0, 2, 4]))
    assert np.array_equal(got, rgba[:, :, :3])


def test_png_unsupported_variants_raise_value_error():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_png)
    import struct as st
    import zlib

    def chunk(typ, data):
        return (st.pack(">I", len(data)) + typ + data
                + st.pack(">I", zlib.crc32(typ + data)))

    # 16-bit depth remains the documented seam (Adam7 decodes now)
    for ihdr in (st.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0),
                 st.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)):
        bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="unsupported PNG"):
            decode_png(bad)
    # palette without PLTE is malformed, not unsupported
    ihdr = st.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(bad)


def test_png_palette_all_depths_and_crc():
    """Round-13 widening: palette PNGs at depths 1/2/4/8 decode through
    the PLTE map (indices packed MSB-first by an independent writer);
    chunk CRCs are verified."""
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_png, encode_png, encode_png_indexed)

    rng = np.random.default_rng(31)
    for depth in (1, 2, 4, 8):
        n = 1 << min(depth, 3)
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, size=(6, 7))
        got = decode_png(encode_png_indexed(idx, pal, depth))
        assert np.array_equal(got, pal[idx]), depth
    # odd widths exercise the partial last byte
    pal = np.array([[9, 8, 7], [1, 2, 3]], np.uint8)
    idx = np.array([[0, 1, 1], [1, 0, 0]])
    assert np.array_equal(decode_png(encode_png_indexed(idx, pal, 1)),
                          pal[idx])
    # CRC corruption is a typed error, not a silent mis-decode
    px = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    buf = bytearray(encode_png(px))
    buf[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(buf))


def test_png_grayscale_and_gray_alpha():
    """Type 0 replicates gray to RGB; type 4 drops alpha — hand-built
    streams with Up/Sub filters so the 1- and 2-byte-per-pixel filter
    offsets are exercised."""
    import struct as st
    import zlib

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_png)

    def chunk(typ, data):
        return (st.pack(">I", len(data)) + typ + data
                + st.pack(">I", zlib.crc32(typ + data)))

    def png(ctype, w, h, filtered_rows):
        ihdr = st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        raw = b"".join(bytes([f]) + bytes(r) for f, r in filtered_rows)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    # gray 3x2: row0 unfiltered [10,20,30]; row1 Up-filtered (+5 each)
    out = decode_png(png(0, 3, 2, [(0, [10, 20, 30]), (2, [5, 5, 5])]))
    assert out.shape == (2, 3, 3)
    assert list(out[0, :, 0]) == [10, 20, 30]
    assert list(out[1, :, 1]) == [15, 25, 35]     # replicated channel
    assert np.array_equal(out[:, :, 0], out[:, :, 2])

    # gray+alpha 2x2 with a Sub-filtered row (bpp=2 offsets):
    # row1 raw bytes (7, 0, 250, 0) -> gray pixels 7, (7+250)&255 = 1
    out = decode_png(png(4, 2, 2, [(0, [50, 255, 60, 255]),
                                   (1, [7, 0, 250, 0])]))
    assert out.shape == (2, 2, 3)
    assert list(out[1, :, 0]) == [7, 1]
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_resize_ppm_nearest_neighbor():
    raw = _ppm_bytes(8, 8)
    small = resize_image(raw, 4, 2)
    px = decode_ppm(small)
    assert px.shape == (2, 4, 3)
    # corner pixel is preserved exactly by nearest-neighbor
    assert np.array_equal(px[0, 0], decode_ppm(raw)[0, 0])


def test_decode_audio_wav_pcm():
    samples, rate = decode_audio(_wav_bytes(n_frames=400, rate=8000, ch=2))
    assert rate == 8000
    assert samples.shape == (400, 2)
    assert samples.dtype == np.int16


def test_decode_audio_unsupported_format_raises_documented_seam():
    # MP3 is a remaining codec seam (PCM WAV and FLAC decode vendored)
    with pytest.raises(NotImplementedError, match="audio I/O library"):
        decode_audio(b"\xff\xfb mp3 garbage")


def test_image_stats_arrow_path(spark):
    rows = [(1, _ppm_bytes(6, 4)), (2, _ppm_bytes(3, 3))]
    media = spark.createDataFrame(
        rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in image_stats(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (6, 4)
    assert (got[2]["width"], got[2]["height"]) == (3, 3)
    exp = [round(float(m), 6)
           for m in decode_ppm(rows[0][1]).mean(axis=(0, 1))]
    assert got[1]["mean_rgb"] == exp


def test_wav_header_fields_honored():
    # hand-check the RIFF header our fixture writes (guards the stdlib
    # round-trip against silent format drift)
    raw = _wav_bytes(n_frames=10, rate=44100, ch=1)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    rate = struct.unpack("<I", raw[raw.index(b"fmt ") + 12:][:4])[0]
    assert rate == 44100


def test_audio_stats_arrow_path(spark):
    rows = [(1, _wav_bytes(n_frames=200, rate=8000, ch=1)),
            (2, _wav_bytes(n_frames=300, rate=16000, ch=2))]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in audio_stats(media).collect()}
    assert (got[1]["n_frames"], got[1]["sample_rate"],
            got[1]["n_channels"]) == (200, 8000, 1)
    assert (got[2]["n_frames"], got[2]["sample_rate"],
            got[2]["n_channels"]) == (300, 16000, 2)
    samples, _ = decode_audio(rows[0][1])
    exp = round(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))), 6)
    assert got[1]["rms"] == exp


def test_png_encode_roundtrip_bit_exact():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_png, encode_png)
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (13, 7, 3), np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_resize_png_and_gif_reencode_in_kind():
    from simpy__kafka__flink__kafka_spark.functions.gif import (
        decode_gif, encode_gif)
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_png, encode_png)
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (16, 12, 3), np.uint8)
    out = resize_image(encode_png(px), 6, 8)
    assert out[:8] == b"\x89PNG\r\n\x1a\n"
    expect = px[(np.arange(8) * 16 // 8)][:, (np.arange(6) * 12 // 6)]
    assert np.array_equal(decode_png(out), expect)
    pal = (rng.integers(0, 4, (16, 12)) * 80).astype(np.uint8)
    img = np.stack([pal, pal, 255 - pal], 2)
    out_g = resize_image(encode_gif(img), 6, 8)
    assert out_g[:4] == b"GIF8"
    exp_g = img[(np.arange(8) * 16 // 8)][:, (np.arange(6) * 12 // 6)]
    assert np.array_equal(decode_gif(out_g), exp_g)


def test_audio_spectral_features_pure_numpy_reference(spark):
    """A hand-built sine WAV: peak bin, crossings, rms match an
    independent numpy computation on the SOURCE samples."""
    import numpy as np

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        audio_spectral_features, encode_wav)

    rate, n, k = 4000, 1000, 7
    t = np.arange(n)
    s = np.round(9000 * np.sin(2 * np.pi * k * t / n + 0.3)).astype(np.int16)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(s.reshape(-1, 1), rate)))],
        "doc_id long, content binary")
    row = audio_spectral_features(media).collect()[0]
    ch = s.astype(np.float64)
    assert row["n_samples"] == n and row["sample_rate"] == rate
    assert row["peak_bin"] == int(np.argmax(np.abs(np.fft.rfft(ch)))) == k
    assert row["peak_hz"] == k * rate / n
    sg = np.sign(ch)
    assert row["zero_crossings"] == int(np.count_nonzero(sg[1:] != sg[:-1]))
    assert row["rms"] == round(float(np.sqrt(np.mean(ch ** 2))), 6)


def test_audio_spectral_empty_decode_keeps_row(spark):
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        audio_spectral_features, encode_wav)
    import numpy as np

    media = spark.createDataFrame(
        [(5, bytearray(encode_wav(np.zeros((0, 1), np.int16), 8000)))],
        "doc_id long, content binary")
    row = audio_spectral_features(media).collect()[0]
    assert row["n_samples"] == 0 and row["peak_bin"] == -1
    assert row["zero_crossings"] == 0 and row["rms"] == 0.0


def test_audio_spectral_stats_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["audio_spectral_stats"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "audio_spectral_stats")


def test_png_adam7_interlace_all_types():
    """Round-13: Adam7 streams decode — the test writer slices the
    seven passes independently of the decoder's scatter and emits
    each sub-image with its own filter bytes."""
    import struct as st
    import zlib

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_png)

    PASSES = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    # the spec table's defining property: the seven lattices tile the
    # 8x8 grid exactly once (a wrong offset/step double-covers or
    # leaves holes — the mirror-proof check)
    cover = np.zeros((8, 8), int)
    for x0, y0, xs, ys in PASSES:
        cover[y0::ys, x0::xs] += 1
    assert (cover == 1).all()

    def chunk(typ, data):
        return (st.pack(">I", len(data)) + typ + data
                + st.pack(">I", zlib.crc32(typ + data)))

    def adam7_png(px, ctype, bitd=8, plte=None):
        h, w = px.shape[:2]
        nch = {0: 1, 2: 3, 3: 1}[ctype]
        raw = bytearray()
        for x0, y0, xs, ys in PASSES:
            sub = px[y0::ys, x0::xs]
            if sub.size == 0:
                continue
            for row in sub:
                raw.append(0)                        # filter None
                if bitd == 8:
                    raw += np.asarray(row, np.uint8).tobytes()
                else:
                    acc = bits = 0
                    for v in np.atleast_1d(row).reshape(-1):
                        acc = (acc << bitd) | int(v)
                        bits += bitd
                        if bits == 8:
                            raw.append(acc)
                            acc = bits = 0
                    if bits:
                        raw.append(acc << (8 - bits))
        ihdr = st.pack(">IIBBBBB", w, h, bitd, ctype, 0, 0, 1)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte.tobytes())
        return (out + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    rng = np.random.default_rng(41)
    # truecolor, several sizes incl. dims < 8 (empty passes)
    for h, w in [(16, 16), (9, 13), (5, 3), (1, 1), (2, 10)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(adam7_png(px, 2)), px), (h, w)
    # grayscale
    g = rng.integers(0, 256, size=(11, 7), dtype=np.uint8)
    out = decode_png(adam7_png(g, 0))
    assert np.array_equal(out[:, :, 0], g)
    # palette at depth 4
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(10, 9)).astype(np.uint8)
    out = decode_png(adam7_png(idx, 3, bitd=4, plte=pal))
    assert np.array_equal(out, pal[idx])


def test_mp4_stats_walk_and_typed_errors():
    """MP4 triage via the shared ISO-BMFF walk: mvhd v0 and v1
    layouts, handler->codec mapping, typed errors, mutation fuzz."""
    import random

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        build_mp4, mp4_stats)

    s = mp4_stats(build_mp4(90_000, 1000))
    assert s == {"major_brand": "isom", "timescale": 1000,
                 "duration_ms": 90_000, "n_traks": 2,
                 "video_codec": "avc1", "audio_codec": "mp4a",
                 # no sample_specs -> no index tables -> NULL triage
                 **{f"{p}_{k}": None for p in ("video", "audio")
                    for k in ("duration_ms", "n_samples", "bytes",
                              "bitrate_bps", "n_chunks")}}
    s1 = mp4_stats(build_mp4(48_000 * 3600, 48_000, mvhd_version=1,
                             tracks=(("soun", "Opus"),)))
    assert (s1["duration_ms"], s1["audio_codec"],
            s1["video_codec"]) == (3_600_000, "Opus", None)

    with pytest.raises(ValueError, match="ftyp"):
        mp4_stats(b"\x00\x00\x00\x08mdat")
    with pytest.raises(ValueError, match="moov"):
        mp4_stats(build_mp4(10)[:28])      # ftyp alone survives the cut
    zero_ts = build_mp4(10, 1000)
    bad = bytearray(zero_ts)
    i = bad.find(b"mvhd") + 4 + 12
    bad[i:i + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="timescale"):
        mp4_stats(bytes(bad))
    fixture = build_mp4(12_345, 1000)
    rng = random.Random(4242)
    for _ in range(300):
        mut = bytearray(fixture)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            out = mp4_stats(bytes(mut))
            assert out["timescale"] > 0
        except (ValueError, NotImplementedError):
            pass


def test_mp4_sample_tables():
    """Round-14 index triage: exact per-track duration from stts over
    the mdhd timescale, sample count and byte totals from stsz (both
    fixed-size and per-sample layouts), bitrate from the two, and
    edit-list tolerance — no sample data read."""
    import struct

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        build_mp4, mp4_stats)

    specs = {
        "vide": {"timescale": 30_000, "stts": [(60, 1001)],
                 "sizes": [1000 + i for i in range(60)], "n_chunks": 3},
        "soun": {"timescale": 48_000, "stts": [(93, 1024), (2, 960)],
                 "sizes": 250, "n_chunks": 2},
    }
    s = mp4_stats(build_mp4(2_000, 1000, sample_specs=specs,
                            with_edit_list=True))
    assert s["video_duration_ms"] == 60 * 1001 * 1000 // 30_000
    assert s["video_n_samples"] == 60
    assert s["video_bytes"] == sum(1000 + i for i in range(60))
    assert s["video_bitrate_bps"] == (s["video_bytes"] * 8000
                                      // s["video_duration_ms"])
    au = 93 * 1024 + 2 * 960
    assert s["audio_duration_ms"] == au * 1000 // 48_000
    assert s["audio_n_samples"] == 95
    assert s["audio_bytes"] == 250 * 95
    assert s["audio_bitrate_bps"] == (250 * 95 * 8000
                                      // s["audio_duration_ms"])

    # fixed-size stsz layout
    specs2 = {"vide": {"timescale": 90_000, "stts": [(10, 3000)],
                       "sizes": 512, "n_chunks": 1}}
    s2 = mp4_stats(build_mp4(1_000, 1000, tracks=(("vide", "av01"),),
                             sample_specs=specs2))
    assert (s2["video_bytes"], s2["video_n_samples"],
            s2["video_duration_ms"]) == (5120, 10, 333)
    assert s2["audio_n_samples"] is None

    # typed errors: an entry count past the box end must never drive
    # the loop, and a zero mdhd timescale is typed
    good = build_mp4(1_000, 1000, tracks=(("vide", "avc1"),),
                     sample_specs=specs2)
    bad = bytearray(good)
    i = bad.find(b"stts") + 8
    bad[i:i + 4] = struct.pack(">I", 1 << 24)
    with pytest.raises(ValueError, match="entries past its box end"):
        mp4_stats(bytes(bad))
    bad2 = bytearray(good)
    j = bad2.find(b"mdhd") + 4 + 12
    bad2[j:j + 4] = bytes(4)
    with pytest.raises(ValueError, match="mdhd timescale"):
        mp4_stats(bytes(bad2))


def test_mp4_stats_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["mp4_stats"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir, "mp4_stats")


def test_mp4_review_guards():
    """Review fixes: empty mvhd is typed (was IndexError), uint32
    timescale survives (int64 column), implausible v1 durations are
    typed before the Arrow cast could overflow."""
    import struct

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        build_mp4, mp4_stats)

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + bytes(4))
    with pytest.raises(ValueError, match="empty mvhd"):
        mp4_stats(ftyp + box(b"moov", box(b"mvhd", b"")))

    big_ts = 2_147_483_653                   # > int32
    mvhd = box(b"mvhd", bytes(12) + struct.pack(">I", big_ts)
               + struct.pack(">I", big_ts) + bytes(80))
    s = mp4_stats(ftyp + box(b"moov", mvhd))
    assert s["timescale"] == big_ts and s["duration_ms"] == 1000

    huge = box(b"mvhd", bytes([1, 0, 0, 0]) + bytes(16)
               + struct.pack(">I", 1000)
               + struct.pack(">Q", (1 << 64) - 1) + bytes(80))
    with pytest.raises(ValueError, match="implausible"):
        mp4_stats(ftyp + box(b"moov", huge))
