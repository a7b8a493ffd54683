"""Untrusted-bytes fuzz over the header walkers and codecs: every
parser that touches crawled content must yield a TYPED error
(ValueError / NotImplementedError) or a valid result on ANY mutation of
a valid stream — never an IndexError / struct.error / KeyError /
OverflowError leak (the ANCHOR_RE lesson: one adversarial page must not
take down an executor)."""

from __future__ import annotations

import random

import numpy as np
import pytest

OK_ERRORS = (ValueError, NotImplementedError)


def _fixtures() -> dict[str, bytes]:
    from simpy__kafka__flink__kafka_spark.functions.bmp import encode_bmp
    from simpy__kafka__flink__kafka_spark.functions.gif import encode_gif
    from simpy__kafka__flink__kafka_spark.functions.jpeg import encode_jpeg
    from simpy__kafka__flink__kafka_spark.functions.mp3 import (
        encode_mp3_frames)
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        encode_avif_stub, encode_png, encode_ppm, encode_webp_stub)
    from simpy__kafka__flink__kafka_spark.functions.tiff import encode_tiff
    from simpy__kafka__flink__kafka_spark.functions.vp8 import encode_vp8
    from simpy__kafka__flink__kafka_spark.functions.vp8l import encode_vp8l

    px = (np.arange(6 * 5 * 3, dtype=np.uint8).reshape(5, 6, 3))
    rgba = np.dstack([px, np.full((5, 6), 255, np.uint8)])
    return {
        "ppm": encode_ppm(px),
        "png": encode_png(px),
        "jpeg": encode_jpeg(px),
        "gif": encode_gif(px),
        "bmp": encode_bmp(px),
        "tiff": encode_tiff(px),
        "webp": encode_webp_stub(6, 5, "lossless"),
        "avif": encode_avif_stub(6, 5),
        "vp8l": encode_vp8l(rgba),
        "vp8": encode_vp8(px, qi=14),
        "mp3": encode_mp3_frames([9, 10, 9], id3_bytes=8),
    }


def _mutations(buf: bytes, rng: random.Random):
    # every truncation point (small fixtures, exhaustive is cheap)
    for cut in range(len(buf)):
        yield buf[:cut]
    # deterministic single-byte flips
    for _ in range(200):
        i = rng.randrange(len(buf))
        b = bytearray(buf)
        b[i] ^= 1 << rng.randrange(8)
        yield bytes(b)
    # random garbage of assorted sizes
    for n in (0, 1, 3, 7, 64):
        yield bytes(rng.randrange(256) for _ in range(n))


def test_image_dims_typed_errors_only():
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        image_dims)

    rng = random.Random(1234)
    for name, buf in _fixtures().items():
        if name == "mp3":
            continue
        for mut in _mutations(buf, rng):
            try:
                fmt, w, h = image_dims(mut)
                assert 0 < w < 2**31 and 0 < h < 2**31
            except OK_ERRORS:
                pass


def test_vp8l_decode_typed_errors_only():
    from simpy__kafka__flink__kafka_spark.functions.vp8l import (
        decode_vp8l, encode_vp8l)

    rng = random.Random(99)
    img = np.random.RandomState(2).randint(0, 40, size=(4, 6, 4)) \
        .astype(np.uint8)
    buf = encode_vp8l(img)
    for mut in _mutations(buf, rng):
        try:
            out = decode_vp8l(mut)
            assert out.ndim == 3 and out.shape[2] == 4
        except OK_ERRORS:
            pass


def test_mp3_stats_typed_errors_only():
    from simpy__kafka__flink__kafka_spark.functions.mp3 import (
        encode_mp3_frames, mp3_stream_stats)

    rng = random.Random(7)
    buf = encode_mp3_frames([9, 10, 9], id3_bytes=8)
    for mut in _mutations(buf, rng):
        try:
            s = mp3_stream_stats(mut)
            assert s.n_frames >= 1 and s.sample_rate > 0
        except OK_ERRORS:
            pass


def test_audio_container_stats_typed_errors_only():
    from simpy__kafka__flink__kafka_spark.functions.flac import encode_flac
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        _container_stats)

    rng = random.Random(55)
    samples = np.arange(16, dtype=np.int32) * 128
    for buf in (encode_flac(samples, 16000, subframe="fixed"),
                _fixtures()["mp3"]):
        for mut in _mutations(buf, rng):
            try:
                _container_stats(mut)
            except OK_ERRORS:
                pass


def test_crafted_max_output_headers_rejected_fast():
    """Mutation fuzzing cannot surface VALID-header resource bombs (the
    round-11 VP8L lesson): probe decode_image with crafted headers that
    declare maximal output over tiny payloads — each must fail the
    pixel budget in milliseconds, never allocate or loop on the
    declared dims."""
    import time

    from simpy__kafka__flink__kafka_spark.functions.bmp import encode_bmp
    from simpy__kafka__flink__kafka_spark.functions.gif import encode_gif
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_image, encode_png)

    px = np.zeros((2, 3, 3), np.uint8)
    bombs = []
    # PNG: IHDR w/h big-endian at bytes 16..23 (CRCs are not validated)
    png = bytearray(encode_png(px))
    png[16:24] = (60000).to_bytes(4, "big") + (60000).to_bytes(4, "big")
    bombs.append(bytes(png))
    # GIF: logical-screen w/h little-endian at bytes 6..9
    gif = bytearray(encode_gif(px))
    gif[6:10] = (60000).to_bytes(2, "little") * 2
    bombs.append(bytes(gif))
    # BMP: DIB w/h little-endian int32 at bytes 18..25
    bmp = bytearray(encode_bmp(px))
    bmp[18:26] = (60000).to_bytes(4, "little") * 2
    bombs.append(bytes(bmp))
    # VP8 (lossy WebP): 14-bit dims maxed at 16383x16383 = 2^28 px
    from simpy__kafka__flink__kafka_spark.functions.vp8 import (
        _riff_wrap_vp8, encode_vp8)
    vp8 = bytearray(encode_vp8(px, qi=10)[20:])
    vp8[6:10] = (16383).to_bytes(2, "little") * 2
    bombs.append(_riff_wrap_vp8(bytes(vp8)))
    for bomb in bombs:
        t0 = time.perf_counter()
        with pytest.raises(OK_ERRORS):
            decode_image(bomb)
        assert time.perf_counter() - t0 < 0.2


def test_png_inflate_bounded_against_zlib_expansion():
    """A PNG whose IDAT inflates far past the raster the header
    promised must fail the length check WITHOUT materializing the
    expansion (bounded decompressobj, not zlib.decompress)."""
    import struct
    import zlib

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        PNG_MAGIC, decode_png)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # tiny 2x2
    blob = zlib.compress(bytes(50_000_000))              # ~48 KB payload
    bomb = (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", blob)
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="raster length"):
        decode_png(bomb)


def test_parsers_reject_empty_and_tiny():
    from simpy__kafka__flink__kafka_spark.functions.mp3 import (
        mp3_stream_stats)
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        image_dims)
    from simpy__kafka__flink__kafka_spark.functions.vp8l import decode_vp8l

    for fn in (image_dims, decode_vp8l, mp3_stream_stats):
        for payload in (b"", b"\x00", b"\xff", b"RIFF", b"ID3"):
            with pytest.raises(OK_ERRORS):
                fn(payload)


def test_gif_descriptor_dims_gated_independently_of_screen():
    """Round-12 review fix: the LZW expansion target and the frame
    allocations derive from the image DESCRIPTOR dims, which are
    independent of the logical-screen dims the decode_image gate sees
    — a 1x1-screen GIF declaring a 60000x60000 descriptor must fail
    the budget inside decode_gif, fast."""
    import time

    from simpy__kafka__flink__kafka_spark.functions.gif import decode_gif
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_image)

    bomb = bytearray()
    bomb += b"GIF89a"
    bomb += (1).to_bytes(2, "little") * 2          # 1x1 logical screen
    bomb += bytes((0x80, 0, 0))                    # GCT flag, 2 entries
    bomb += bytes(6)                               # the 2-color table
    bomb += b"\x2c" + bytes(4)                     # descriptor at (0,0)
    bomb += (60000).to_bytes(2, "little") * 2      # 60000x60000 (!)
    bomb += bytes((0,))                            # no local table
    bomb += bytes((2, 1, 0x4C, 0))                 # min_size, tiny LZW
    bomb += b"\x3b"
    for fn in (decode_gif, decode_image):
        t0 = time.perf_counter()
        with pytest.raises(ValueError, match="decompression bomb"):
            fn(bytes(bomb))
        assert time.perf_counter() - t0 < 0.2


def test_decode_image_forwards_max_pixels_to_vp8l():
    """Round-12 review fix: the documented max_pixels override must
    reach decode_vp8l's inner guard — with a large explicit budget the
    bomb header PASSES both guards and fails later as a truncated
    stream, proving the override was forwarded (the inner payload-tied
    default would have rejected it as a bomb)."""
    import struct

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_image)

    from tests.test_vp8l import _bomb_stream

    payload = _bomb_stream()[:6]        # header only, trees cut off
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(ValueError, match="decompression bomb"):
        decode_image(riff)              # default budget still rejects
    with pytest.raises(ValueError, match="truncated"):
        decode_image(riff, max_pixels=1 << 30)


def test_flac_constant_subframe_bomb_rejected_fast():
    """The audio twin of the VP8L bomb: CONSTANT subframes emit a whole
    blocksize (up to 65536 samples) for a handful of bytes, so a short
    crafted frame train amplifies ~3000x into pure-Python sample
    lists.  The per-frame sample budget must reject it in milliseconds;
    a legit encode_flac stream still decodes, and an explicit
    max_samples override admits larger outputs."""
    import time

    from simpy__kafka__flink__kafka_spark.functions.flac import (
        decode_flac, encode_flac)

    # the guard fires per FRAME before its subframes decode, so a tiny
    # explicit budget on a legit stream exercises the same code path a
    # crafted constant-frame train would hit under the default budget
    samples = np.zeros(4096, dtype=np.int32)
    buf = encode_flac(samples, 16000)
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="decompression bomb"):
        decode_flac(buf, max_samples=100)
    assert time.perf_counter() - t0 < 0.2
    out, rate = decode_flac(buf)           # payload-tied default admits
    assert out.shape[0] == 4096 and rate == 16000


def test_decode_image_typed_errors_only_all_formats():
    """The round-12 gap that hid a JPEG IndexError leak: the decode
    fuzz previously covered only VP8L.  Run the FULL decode (not just
    the header walk) over every format's mutation corpus — typed
    errors or a valid array, never an untyped crash out of the Arrow
    task.  Sampled sparser than the header-walk fuzz (a full decode of
    a near-valid mutant costs real IDCT/defilter work; exhaustive
    truncation here measured ~9 min)."""
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_image)

    rng = random.Random(4321)
    for name, buf in _fixtures().items():
        if name in ("mp3", "webp", "avif"):   # not pixel-decodable
            continue
        muts = [buf[:cut] for cut in range(0, len(buf), 5)]
        for _ in range(48):
            b = bytearray(buf)
            b[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            muts.append(bytes(b))
        muts += [bytes(rng.randrange(256) for _ in range(n))
                 for n in (0, 1, 3, 7, 64)]
        for mut in muts:
            try:
                out = decode_image(mut)
                assert out.ndim == 3 and out.shape[2] == 3
            except OK_ERRORS:
                pass


def test_jpeg_huge_sof_dims_rejected_fast():
    """A JPEG whose SOF declares 60000x60000 must fail the budget
    BEFORE the MCU coefficient grids allocate (np.zeros over
    header-declared MCU counts) — and truncated scans raise the typed
    error, not IndexError."""
    import time

    from simpy__kafka__flink__kafka_spark.functions.jpeg import (
        decode_jpeg, encode_jpeg)

    px = np.zeros((2, 3, 3), np.uint8)
    buf = bytearray(encode_jpeg(px))
    i = buf.find(b"\xff\xc0")
    if i < 0:
        i = buf.find(b"\xff\xc2")
    buf[i + 5:i + 9] = (60000).to_bytes(2, "big") * 2
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="decompression bomb"):
        decode_jpeg(bytes(buf))
    assert time.perf_counter() - t0 < 0.2


def test_decode_audio_typed_errors_only():
    """decode_audio was the remaining unfuzzed decode surface: WAV's
    stdlib parser leaked wave.Error and FLAC's metadata walk leaked
    IndexError on truncations (round-12 review findings)."""
    from simpy__kafka__flink__kafka_spark.functions.flac import encode_flac
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_audio, encode_wav)

    rng = random.Random(31337)
    samples = (np.arange(64, dtype=np.int16) * 100).reshape(-1, 1)
    for buf in (bytes(encode_wav(samples, 8000)),
                encode_flac(samples.ravel().astype(np.int32), 8000)):
        for mut in _mutations(buf, rng):
            try:
                out, rate = decode_audio(mut)
                assert rate > 0
            except OK_ERRORS:
                pass


def test_audio_budget_admits_normal_songs_by_default():
    """Round-12 review fix: the image-tuned 2^22 cap rejected any FLAC
    past ~47 s of stereo CD audio; the audio cap (2^25) must admit a
    3-minute 44.1 kHz stereo song (15.9M samples) from a realistic
    multi-KB payload by default."""
    from simpy__kafka__flink__kafka_spark.functions._budget import (
        AUDIO_MAX_SAMPLES, sample_budget)

    three_min_stereo = 180 * 44_100 * 2
    assert three_min_stereo < AUDIO_MAX_SAMPLES
    assert sample_budget(200_000) >= three_min_stereo   # ~200 KB payload
    assert sample_budget(200_000, max_samples=10) == 10


def test_resize_image_forwards_max_pixels_to_inner_decoders():
    """The override must reach decode_gif's inner guards (the identical
    forwarding bug decode_image had for VP8L): with a large explicit
    budget the descriptor bomb passes BOTH gates and fails later as a
    truncated LZW stream — proving the forward happened."""
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        resize_image)

    bomb = bytearray()
    bomb += b"GIF89a"
    bomb += (1).to_bytes(2, "little") * 2
    bomb += bytes((0x80, 0, 0)) + bytes(6)
    bomb += b"\x2c" + bytes(4)
    bomb += (60000).to_bytes(2, "little") * 2
    bomb += bytes((0,))
    bomb += bytes((2, 1, 0x4C, 0))
    bomb += b"\x3b"
    with pytest.raises(ValueError, match="decompression bomb"):
        resize_image(bytes(bomb), 2, 2)
    with pytest.raises(ValueError, match="LZW|truncated"):
        resize_image(bytes(bomb), 2, 2, max_pixels=1 << 32)


def test_zip_walk_typed_errors_only():
    import io
    import zipfile

    from simpy__kafka__flink__kafka_spark.functions.zipfmt import (
        zip_central_stats)

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("a.txt"), b"payload data",
                   zipfile.ZIP_DEFLATED)
        z.writestr(zipfile.ZipInfo("b"), b"x" * 20, zipfile.ZIP_STORED)
    fixture = buf.getvalue()
    rng = random.Random(4321)
    for mut in _mutations(fixture, rng):
        try:
            s = zip_central_stats(mut)
            assert 0 <= s.n_entries < 2**16
            assert s.usize_total >= 0 and s.csize_total >= 0
        except OK_ERRORS:
            pass


def test_gunzip_members_typed_errors_only():
    import gzip

    from simpy__kafka__flink__kafka_spark.functions.html import (
        gunzip_members)

    fixture = gzip.compress(b"WARC/1.0\r\nrecord one") + gzip.compress(
        b"WARC/1.0\r\nrecord two")
    rng = random.Random(987)
    for mut in _mutations(fixture, rng):
        try:
            out, n = gunzip_members(mut, max_bytes=1 << 20)
            assert n >= 0 and len(out) <= (1 << 20)
        except OK_ERRORS:
            pass


def test_tar_walk_typed_errors_only():
    import io
    import tarfile

    from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
        tar_entries)

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as t:
        ti = tarfile.TarInfo("s/0.img")
        ti.size = 4
        t.addfile(ti, io.BytesIO(b"data"))
    fixture = buf.getvalue()
    rng = random.Random(555)
    for mut in _mutations(fixture, rng):
        try:
            ents = tar_entries(mut)
            assert all(e.size >= 0 for e in ents)
        except OK_ERRORS:
            pass


def test_jpeg_exif_typed_errors_only():
    from simpy__kafka__flink__kafka_spark.functions.jpeg import (
        build_exif_app1, jpeg_exif)

    app1 = build_exif_app1(3, "CamFuzz", "MX", "2026:01:01 00:00:00",
                           "2026:01:02 00:00:00")
    fixture = b"\xff\xd8" + app1 + b"\xff\xd9"
    rng = random.Random(777)
    for mut in _mutations(fixture, rng):
        try:
            d = jpeg_exif(mut)
            assert d["has_exif"] in (0, 1)
        except OK_ERRORS:
            pass


def test_pdf_walk_typed_errors_only():
    from simpy__kafka__flink__kafka_spark.functions.pdffmt import (
        build_pdf, pdf_stats)

    fixture = build_pdf(2)
    rng = random.Random(31337)
    for mut in _mutations(fixture, rng):
        try:
            s = pdf_stats(mut)
            assert s.n_objects >= 0 and s.n_pages >= 0
        except OK_ERRORS:
            pass


def test_id3_walk_typed_errors_only():
    from simpy__kafka__flink__kafka_spark.functions.mp3 import (
        build_id3v2, id3_frames)

    fixture = build_id3v2("Fuzz Title", "Fuzz Artist", "Al", "2026")
    rng = random.Random(909)
    for mut in _mutations(fixture, rng):
        try:
            d = id3_frames(mut)
            assert d["has_id3"] in (0, 1) and d["n_frames"] >= 0
        except OK_ERRORS:
            pass


def test_ogg_walk_typed_errors_only():
    from simpy__kafka__flink__kafka_spark.functions.ogg import (
        build_ogg, ogg_stats)

    fixture = build_ogg("vorbis", 2, 44100, [b"a" * 60, b"b" * 300])
    rng = random.Random(7621)
    for mut in _mutations(fixture, rng):
        try:
            s = ogg_stats(mut)
            assert s.n_pages >= 1 and s.body_bytes >= 0
        except OK_ERRORS:
            pass


def test_png_palette_walk_typed_errors_only():
    import numpy as np

    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        decode_png, encode_png_indexed)

    rng_np = np.random.default_rng(5)
    pal = rng_np.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng_np.integers(0, 16, size=(6, 7))
    fixture = encode_png_indexed(idx, pal, 4)
    rng = random.Random(977)
    for mut in _mutations(fixture, rng):
        try:
            out = decode_png(mut)
            assert out.shape[2] == 3
        except OK_ERRORS:
            pass
