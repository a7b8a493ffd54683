"""MPEG audio (MP3) frame-walk STATS — the header-only half of MP3
support: frame count, sample rate, bitrate range, VBR flag, and exact
duration from walking the frame headers, with no PCM synthesis.  A full
MPEG-1 Layer III decoder (huffman tables, IMDCT, synthesis filterbank)
is out of scope for the dependency-free container — PCM decode remains
the documented seam in ``multimodal.py:decode_audio`` — but the stats a
corpus pipeline actually filters on (duration, bitrate, corruption)
come from the headers alone, exactly like ``warc_parse`` audits records
without executing their payloads.

Format facts used (public MPEG-1/2 audio spec):
- frame header = 32 bits: 11-bit sync (all ones), 2-bit version ID,
  2-bit layer, protection bit, 4-bit bitrate index, 2-bit sample-rate
  index, padding bit, then channel/mode/emphasis bits (ignored here);
- Layer III frame length = ``144000 * kbps // rate + padding`` for
  MPEG-1 and ``72000 * kbps // rate + padding`` for MPEG-2/2.5
  (576-sample granule halving);
- samples per Layer III frame: 1152 (MPEG-1) / 576 (MPEG-2/2.5);
- an ID3v2 tag ("ID3" + syncsafe length at offset 6..9) precedes the
  first frame in most real files and must be skipped.

Reference parity note: the reference trace pipeline has no media
surface; this belongs to the training-data extension operators
(multimodal columns).
"""

from __future__ import annotations

from dataclasses import dataclass

# bitrate tables, kbps, indexed by the 4-bit header field (0 = "free
# format" — unsupported here; 15 = invalid)
_BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320)
_BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                   144, 160)
_RATES = {
    3: (44100, 48000, 32000),   # version ID 3 = MPEG-1
    2: (22050, 24000, 16000),   # version ID 2 = MPEG-2
    0: (11025, 12000, 8000),    # version ID 0 = MPEG-2.5
}


@dataclass(frozen=True)
class Mp3Stats:
    n_frames: int
    sample_rate: int
    min_kbps: int
    max_kbps: int
    duration_ms: int
    vbr: bool
    # True when the stream's final frame HEADER declared a length that
    # extends past the end of the buffer — a cut-off download.  The
    # truncated frame is EXCLUDED from n_frames/duration_ms (its
    # samples never fully exist), so stats stay honest and the flag
    # lets a corpus quality filter drop or repair the file.
    truncated: bool = False


def id3v2_size(buf: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none): 10-byte header
    whose size field (offsets 6..9) is syncsafe (7 bits per byte), plus
    10 more when the v2.4 footer flag (header flags bit 0x10) is set —
    the declared size covers neither header nor footer."""
    if buf[:3] != b"ID3" or len(buf) < 10:
        return 0
    size = ((buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9]) + 10
    # the footer exists only in v2.4; earlier versions define no 0x10
    # flag, and honoring a stray one would skip 10 bytes of audio
    if buf[3] >= 4 and buf[5] & 0x10:
        size += 10
    return size


def mp3_stream_stats(buf: bytes) -> Mp3Stats:
    """Walk every Layer III frame header in ``buf`` (after skipping any
    ID3v2 tag) and fold the stats.  Raises ``ValueError`` on a stream
    with no valid frame, a reserved/free-format header, a layer other
    than III, or a mid-stream sample-rate change (one container, one
    clock).  A final frame whose declared length extends past the end
    of the buffer is excluded and surfaces as ``truncated=True``; a
    lost sync mid-buffer simply ends the frame train (trailing ID3v1 /
    APE tags are normal, not corruption)."""
    buf = bytes(buf)
    i = id3v2_size(buf)
    n_frames = 0
    total_samples = 0
    rate: int | None = None
    min_k = None
    max_k = None
    truncated = False
    while i + 4 <= len(buf):
        b0, b1, b2 = buf[i], buf[i + 1], buf[i + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break  # lost sync: end of the frame train (trailing tag etc.)
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version == 1 or layer != 0x1:  # reserved version / not Layer III
            raise ValueError(
                "unsupported MPEG header (reserved version or non-Layer-III)"
            )
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError(
                "free-format or invalid bitrate/sample-rate index")
        table = _BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3
        kbps = table[br_idx]
        frame_rate = _RATES[version][sr_idx]
        if rate is None:
            rate = frame_rate
        elif rate != frame_rate:
            raise ValueError("mid-stream sample-rate change")
        factor = 144000 if version == 3 else 72000
        frame_len = factor * kbps // frame_rate + padding
        if frame_len <= 4:
            raise ValueError("degenerate frame length")
        if i + frame_len > len(buf):
            # the header promises more payload than the buffer holds —
            # a cut-off final frame: don't count samples that were
            # never written
            truncated = True
            break
        n_frames += 1
        total_samples += 1152 if version == 3 else 576
        min_k = kbps if min_k is None else min(min_k, kbps)
        max_k = kbps if max_k is None else max(max_k, kbps)
        i += frame_len
    if n_frames == 0 or rate is None:
        raise ValueError("no MPEG audio frame found")
    return Mp3Stats(
        n_frames=n_frames,
        sample_rate=rate,
        min_kbps=min_k,
        max_kbps=max_k,
        duration_ms=total_samples * 1000 // rate,
        vbr=min_k != max_k,
        truncated=truncated,
    )


def encode_mp3_frames(bitrate_indexes: list[int], sr_idx: int = 0,
                      id3_bytes: int = 0) -> bytes:
    """Synthesize a VALID MPEG-1 Layer III frame train (header-correct,
    zeroed payload) — the fixture generator for the stats walker, the
    same synthesize-then-parse posture as the FLAC round-trip row.
    One frame per bitrate index; ``id3_bytes`` > 0 prepends an ID3v2
    tag of that payload size."""
    out = bytearray()
    if id3_bytes:
        out += b"ID3\x04\x00\x00"
        out += bytes(((id3_bytes >> 21) & 0x7F, (id3_bytes >> 14) & 0x7F,
                      (id3_bytes >> 7) & 0x7F, id3_bytes & 0x7F))
        out += bytes(id3_bytes)
    rate = _RATES[3][sr_idx]
    for br_idx in bitrate_indexes:
        kbps = _BITRATES_V1_L3[br_idx]
        frame_len = 144000 * kbps // rate  # no padding bit
        hdr = bytes((
            0xFF,
            0xFB,                       # sync low bits + MPEG-1 + Layer III
            (br_idx << 4) | (sr_idx << 2),
            0xC0,                       # mono, no emphasis
        ))
        out += hdr + bytes(frame_len - 4)
    return bytes(out)


# --- ID3v2 frame walk --------------------------------------------------------
# The audio analogue of the JPEG EXIF walk: provenance metadata a
# corpus pipeline triages on (title/artist dedup keys, year filters)
# without touching any audio frame.  Public id3.org layout: 10-byte
# tag header, then frames of [id 4][size 4][flags 2][data]; v2.3 sizes
# are plain big-endian, v2.4 syncsafe; v2.2 (round 13) uses 6-byte
# frame headers — [id 3][size 3] — with the three-char id aliases
# (TT2/TP1/TAL/TYE) and bit 6 meaning COMPRESSION (typed refusal);
# text-frame data leads with an encoding byte (0 latin-1, 1 utf-16 —
# BOM per spec but real taggers omit it, LE assumed then —
# 2 utf-16be, 3 utf-8).  The tag-header
# extended-header flag is honored (skipped by declared size, both the
# v2.3 excludes-itself and v2.4 syncsafe-includes-itself layouts);
# the unsynchronisation flag is a typed refusal (walking without
# undoing it would mis-read every size).

_TEXT_FRAMES = {"TIT2": "title", "TPE1": "artist",
                "TALB": "album", "TYER": "year", "TDRC": "year",
                # ID3v2.2 three-char ids (round 13 — the 2.2 walk)
                "TT2": "title", "TP1": "artist",
                "TAL": "album", "TYE": "year"}


def id3_frames(content: bytes) -> dict:
    """Walk a leading ID3v2.2/2.3/2.4 tag.  Returns {has_id3, version,
    n_frames, title, artist, album, year} — absent tag gives has_id3 0
    with null fields (the keep-empty contract); malformed tags raise
    the typed ValueError family.  Frame sizes are bounds-checked
    against the DECLARED tag extent before any slice, so a crafted
    size cannot walk past the tag or the buffer."""
    buf = bytes(content)
    out = {"has_id3": 0, "version": None, "n_frames": 0,
           "title": None, "artist": None, "album": None, "year": None}
    if buf[:3] != b"ID3" or len(buf) < 10:
        return out
    major = buf[3]
    if major not in (2, 3, 4):
        raise ValueError(f"unsupported ID3v2.{major} tag")
    if any(b & 0x80 for b in buf[6:10]):
        raise ValueError("ID3v2 size bytes must be syncsafe")
    tag_end = 10 + ((buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7)
                    | buf[9])
    if tag_end > len(buf):
        raise ValueError("ID3v2 tag declares more bytes than buffer")
    out["has_id3"], out["version"] = 1, f"2.{major}"
    flags = buf[5]
    if flags & 0x80:
        # unsynchronisation rewrites 0xFF 0x00 byte pairs throughout
        # the tag — walking without undoing it would mis-read sizes,
        # so refuse rather than silently mis-parse (typed seam)
        raise ValueError("ID3v2 unsynchronisation unsupported")
    if major == 2 and flags & 0x40:
        # in v2.2 bit 6 means COMPRESSION (no extended header exists)
        raise ValueError("ID3v2.2 compression unsupported")
    pos = 10
    if major != 2 and flags & 0x40:
        # extended header (ADVICE r12 / VERDICT task 4): skip by its
        # declared size — v2.3 stores a plain big-endian size that
        # EXCLUDES the 4 size bytes; v2.4 a syncsafe size that
        # INCLUDES the whole extended header
        if pos + 4 > tag_end:
            raise ValueError("ID3v2 extended header past tag extent")
        raw = buf[pos: pos + 4]
        if major == 4:
            if any(b & 0x80 for b in raw):
                raise ValueError(
                    "ID3v2.4 extended-header size must be syncsafe")
            ext_len = ((raw[0] << 21) | (raw[1] << 14) | (raw[2] << 7)
                       | raw[3])
            if ext_len < 6:
                raise ValueError("ID3v2.4 extended header too small")
        else:
            ext_len = 4 + int.from_bytes(raw, "big")
        if pos + ext_len > tag_end:
            raise ValueError("ID3v2 extended header past tag extent")
        pos += ext_len
    n = 0
    # v2.2 frames are [id 3][size 3] with no flags; v2.3/2.4 are
    # [id 4][size 4][flags 2]
    id_len = 3 if major == 2 else 4
    hdr_len = 6 if major == 2 else 10
    while pos + hdr_len <= tag_end:
        fid = buf[pos: pos + id_len]
        if fid == b"\0" * id_len:
            break                            # padding
        if not all(0x30 <= c <= 0x5A for c in fid):
            raise ValueError(f"ID3v2: bad frame id {fid!r}")
        raw_sz = buf[pos + id_len:
                     pos + hdr_len - (0 if major == 2 else 2)]
        if major == 4:
            if any(b & 0x80 for b in raw_sz):
                raise ValueError("ID3v2.4 frame size must be syncsafe")
            size = ((raw_sz[0] << 21) | (raw_sz[1] << 14)
                    | (raw_sz[2] << 7) | raw_sz[3])
        else:
            size = int.from_bytes(raw_sz, "big")
        data_end = pos + hdr_len + size
        if data_end > tag_end:
            raise ValueError(
                f"ID3v2 frame {fid.decode(errors='replace')} size "
                f"{size} runs past the tag")
        n += 1
        key = _TEXT_FRAMES.get(fid.decode("ascii", errors="replace"))
        if key is not None and size >= 1:
            enc = buf[pos + hdr_len]
            data = buf[pos + hdr_len + 1: data_end]
            try:
                if enc == 0:
                    text = data.decode("latin-1")
                elif enc == 1:
                    # spec says BOM-led UTF-16, but real taggers emit
                    # BOM-less frames too (ADVICE r12 / task 4) — and
                    # Python's bare 'utf-16' would silently assume LE;
                    # make the fallback explicit
                    if data[:2] in (b"\xff\xfe", b"\xfe\xff"):
                        text = data.decode("utf-16")
                    else:
                        text = data.decode("utf-16-le")
                elif enc == 2:
                    # v2.4 UTF-16BE without BOM (encoding byte 2)
                    text = data.decode("utf-16-be")
                elif enc == 3:
                    text = data.decode("utf-8")
                else:
                    raise ValueError(
                        f"ID3v2 text encoding {enc} unsupported")
            except UnicodeDecodeError as exc:
                raise ValueError(f"ID3v2 text frame undecodable: {exc}"
                                 ) from exc
            out[key] = text.rstrip("\0")
        pos = data_end
    out["n_frames"] = n
    return out


def build_id3v2(title: str, artist: str, album: str, year: str) -> bytes:
    """ID3v2.3 fixture writer (latin-1 text frames, plain big-endian
    sizes, 16 bytes of padding) — laid out from the spec independently
    of the reader's offsets."""
    def frame(fid: str, text: str) -> bytes:
        data = b"\0" + text.encode("latin-1")
        return (fid.encode() + len(data).to_bytes(4, "big") + b"\0\0"
                + data)

    body = (frame("TIT2", title) + frame("TPE1", artist)
            + frame("TALB", album) + frame("TYER", year) + b"\0" * 16)
    sz = len(body)
    ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                (sz >> 7) & 0x7F, sz & 0x7F])
    return b"ID3" + bytes([3, 0, 0]) + ss + body


def id3_stats(media, id_col: str = "doc_id",
              content_col: str = "content"):
    """Arrow-batched :func:`id3_frames` over binary payloads.
    Output: (id_col, has_id3, version, n_frames, title, artist,
    album, year)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("has_id3", T.IntegerType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("artist", T.StringType(), True),
        T.StructField("album", T.StringType(), True),
        T.StructField("year", T.StringType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            o = pdf[content_col].map(lambda b: id3_frames(bytes(b)))
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "has_id3": o.map(lambda d: d["has_id3"]).astype("int32"),
                "version": o.map(lambda d: d["version"]),
                "n_frames": o.map(lambda d: d["n_frames"]).astype("int32"),
                "title": o.map(lambda d: d["title"]),
                "artist": o.map(lambda d: d["artist"]),
                "album": o.map(lambda d: d["album"]),
                "year": o.map(lambda d: d["year"]),
            })

    return media.select(id_col, content_col).mapInPandas(run, schema)


def build_id3v22(title: str, artist: str, album: str,
                 year: str) -> bytes:
    """ID3v2.2 fixture writer (3-char ids, 3-byte plain big-endian
    sizes, latin-1 text, 12 bytes of padding) — the old-tagger layout,
    laid out from the spec independently of the reader."""
    def frame(fid: str, text: str) -> bytes:
        data = b"\0" + text.encode("latin-1")
        return fid.encode() + len(data).to_bytes(3, "big") + data

    body = (frame("TT2", title) + frame("TP1", artist)
            + frame("TAL", album) + frame("TYE", year) + b"\0" * 12)
    sz = len(body)
    ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                (sz >> 7) & 0x7F, sz & 0x7F])
    return b"ID3" + bytes([2, 0, 0]) + ss + body
