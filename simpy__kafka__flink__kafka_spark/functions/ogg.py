"""OGG container page walk + Vorbis/Opus identification headers — the
remaining common crawled-audio container next to MP3/WAV/FLAC
(functions/mp3.py, flac.py): triage a .ogg/.opus payload WITHOUT
decoding audio — page accounting, stream serials, codec identity,
channel/rate provenance, and duration via the last granule position.

Vendored from the public RFC 3533 layout: each page is
``OggS`` + version(1) + header_type(1) + granule_position(8 LE) +
serial(4 LE) + page_seq(4 LE) + crc(4 LE) + n_segments(1) +
segment_table(n) + body(sum of segment lengths).  Page CRCs are
VERIFIED with the spec's CRC-32 (polynomial 0x04C11DB7, init 0, no
reflection, the CRC field zeroed during computation) — a corrupt page
is a typed error, not a mis-walk.  Codec identification from the
first page's body: ``\\x01vorbis`` (channels at offset 11, rate
12..16 LE) or ``OpusHead`` (channels at offset 9, input rate
12..16 LE).  Fixtures are written by :func:`build_ogg` from the same
public layout but independent arithmetic (the tar/zip/pdf
cross-validation posture); nothing is decompressed, so the only bomb
surface (segment tables walking past the buffer) is bounds-checked.

Reference parity note: no reference counterpart — a training-data
extension operator (the mp3_stats/id3_stats family).
"""

from __future__ import annotations

from dataclasses import dataclass

_CRC_TABLE: tuple[int, ...] = ()


def _crc_table() -> tuple[int, ...]:
    global _CRC_TABLE
    if not _CRC_TABLE:
        # build locally, assign ONCE: two threads racing the first
        # call must each produce the full table, never interleave
        # appends into a shared list (review find)
        tab = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000
                     else r << 1) & 0xFFFFFFFF
            tab.append(r)
        _CRC_TABLE = tuple(tab)
    return _CRC_TABLE


def ogg_crc(data: bytes) -> int:
    """RFC 3533 page CRC: unreflected CRC-32/0x04C11DB7, init 0,
    no final xor (NOT zlib's crc32 — different conventions)."""
    tab = _crc_table()
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ tab[((r >> 24) & 0xFF) ^ b]
    return r


@dataclass(frozen=True)
class OggStats:
    n_pages: int
    n_streams: int
    codec: str | None
    channels: int | None
    sample_rate: int | None
    last_granule: int
    body_bytes: int


def ogg_stats(content: bytes) -> OggStats:
    """Walk every page of an OGG stream.  Typed errors on: a missing
    capture pattern, a non-zero version, a page CRC mismatch, or a
    segment table / body running outside the buffer."""
    buf = bytes(content)
    if buf[:4] != b"OggS":
        raise ValueError("not an OGG stream (missing OggS capture)")
    pos = 0
    n_pages = 0
    serials: set[int] = set()
    codec: str | None = None
    channels: int | None = None
    rate: int | None = None
    last_granule = 0
    body_bytes = 0
    while pos < len(buf):
        if buf[pos:pos + 4] != b"OggS":
            raise ValueError(f"OGG capture pattern lost at offset {pos}")
        if pos + 27 > len(buf):
            raise ValueError("OGG page header truncated")
        if buf[pos + 4] != 0:
            raise ValueError(f"OGG version {buf[pos + 4]} unsupported")
        granule = int.from_bytes(buf[pos + 6:pos + 14], "little",
                                 signed=True)
        serial = int.from_bytes(buf[pos + 14:pos + 18], "little")
        declared_crc = int.from_bytes(buf[pos + 22:pos + 26], "little")
        n_seg = buf[pos + 26]
        seg_end = pos + 27 + n_seg
        if seg_end > len(buf):
            raise ValueError("OGG segment table outside buffer")
        body_len = sum(buf[pos + 27:seg_end])
        page_end = seg_end + body_len
        if page_end > len(buf):
            raise ValueError("OGG page body outside buffer")
        page = bytearray(buf[pos:page_end])
        page[22:26] = b"\0\0\0\0"          # CRC computed with field zeroed
        if ogg_crc(bytes(page)) != declared_crc:
            raise ValueError(f"OGG page CRC mismatch at offset {pos}")
        body = buf[seg_end:page_end]
        if n_pages == 0:
            if body[:7] == b"\x01vorbis" and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                rate = int.from_bytes(body[12:16], "little")
            elif body[:8] == b"OpusHead" and len(body) >= 16:
                codec = "opus"
                channels = body[9]
                rate = int.from_bytes(body[12:16], "little")
        serials.add(serial)
        if granule >= 0:
            last_granule = max(last_granule, granule)
        body_bytes += body_len
        n_pages += 1
        pos = page_end
    return OggStats(n_pages, len(serials), codec, channels, rate,
                    last_granule, body_bytes)


def build_ogg(codec: str, channels: int, rate: int,
              page_bodies: list[bytes], serial: int = 1) -> bytes:
    """OGG fixture writer: an identification page (``\\x01vorbis`` /
    ``OpusHead`` body) followed by one page per entry of
    ``page_bodies``, granules 960*(i+1), real computed CRCs — laid out
    from the RFC independently of the reader's offsets."""
    if codec == "vorbis":
        ident = (b"\x01vorbis" + bytes(4) + bytes([channels])
                 + rate.to_bytes(4, "little") + bytes(7))
    elif codec == "opus":
        ident = (b"OpusHead" + bytes([1, channels]) + bytes(2)
                 + rate.to_bytes(4, "little") + bytes(3))
    else:
        raise ValueError("codec must be vorbis|opus")

    def page(seq: int, granule: int, body: bytes, htype: int) -> bytes:
        if len(body) > 255 * 255:
            raise ValueError("fixture page body too large")
        segs = []
        rest = len(body)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)                    # final short (or 0) lacing
        hdr = (b"OggS" + bytes([0, htype])
               + granule.to_bytes(8, "little", signed=True)
               + serial.to_bytes(4, "little")
               + seq.to_bytes(4, "little")
               + b"\0\0\0\0"
               + bytes([len(segs)]) + bytes(segs))
        crc = ogg_crc(hdr + body)
        return (hdr[:22] + crc.to_bytes(4, "little") + hdr[26:] + body)

    out = page(0, 0, ident, 0x02)            # beginning-of-stream
    for i, body in enumerate(page_bodies):
        htype = 0x04 if i == len(page_bodies) - 1 else 0
        out += page(i + 1, 960 * (i + 1), body, htype)
    return out


def ogg_container_stats(media, id_col: str = "doc_id",
                        content_col: str = "content"):
    """Arrow-batched :func:`ogg_stats` over binary payloads.  Output:
    (id_col, n_pages, n_streams, codec, channels, sample_rate,
    last_granule, body_bytes)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("n_pages", T.IntegerType(), True),
        T.StructField("n_streams", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("last_granule", T.LongType(), True),
        T.StructField("body_bytes", T.LongType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            o = pdf[content_col].map(lambda b: ogg_stats(bytes(b)))
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "n_pages": o.map(lambda s: s.n_pages).astype("int32"),
                "n_streams": o.map(lambda s: s.n_streams).astype("int32"),
                "codec": o.map(lambda s: s.codec),
                "channels": o.map(lambda s: s.channels).astype("Int32"),
                "sample_rate": o.map(lambda s: s.sample_rate)
                .astype("Int32"),
                "last_granule": o.map(lambda s: s.last_granule)
                .astype("int64"),
                "body_bytes": o.map(lambda s: s.body_bytes)
                .astype("int64"),
            })

    return media.select(id_col, content_col).mapInPandas(run, schema)
