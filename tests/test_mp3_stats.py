"""MP3 header-walk stats (functions/mp3.py + multimodal.py:
audio_container_stats / mp3_synth_stats): frame-length arithmetic,
ID3v2 skipping, VBR detection, typed errors on malformed streams, and
the Arrow-batched container dispatch over WAV/FLAC/MP3 payloads."""

from __future__ import annotations

import numpy as np
import pytest

from simpy__kafka__flink__kafka_spark.functions.mp3 import (
    encode_mp3_frames, id3v2_size, mp3_stream_stats)


def test_cbr_stats_exact():
    # 4 frames @ 128 kbps, 44100 Hz: frame_len = 144000*128//44100 = 417
    buf = encode_mp3_frames([9, 9, 9, 9])
    assert len(buf) == 4 * (144000 * 128 // 44100)
    s = mp3_stream_stats(buf)
    assert (s.n_frames, s.sample_rate) == (4, 44100)
    assert (s.min_kbps, s.max_kbps, s.vbr) == (128, 128, False)
    assert s.duration_ms == 4 * 1152 * 1000 // 44100


def test_vbr_and_id3_skip():
    buf = encode_mp3_frames([9, 10, 9], id3_bytes=33)
    assert id3v2_size(buf) == 43
    s = mp3_stream_stats(buf)
    assert (s.n_frames, s.min_kbps, s.max_kbps, s.vbr) == (3, 128, 160,
                                                           True)


def test_sample_rates():
    # sr_idx 1 = 48000 Hz: frame_len = 144000*128//48000 = 384
    s = mp3_stream_stats(encode_mp3_frames([9, 9], sr_idx=1))
    assert s.sample_rate == 48000
    assert s.duration_ms == 2 * 1152 * 1000 // 48000


def test_truncated_tail_stops_clean():
    """A trailing partial frame (< 4 header bytes) ends the walk at the
    last complete header."""
    buf = encode_mp3_frames([9, 9]) + b"\xff"
    assert mp3_stream_stats(buf).n_frames == 2


def test_errors_are_typed():
    with pytest.raises(ValueError, match="no MPEG audio frame"):
        mp3_stream_stats(b"garbage bytes here")
    # free-format bitrate index 0
    bad = bytearray(encode_mp3_frames([9]))
    bad[2] = 0x00
    with pytest.raises(ValueError, match="free-format or invalid"):
        mp3_stream_stats(bytes(bad))
    # Layer I header (layer bits 11)
    l1 = bytearray(encode_mp3_frames([9]))
    l1[1] = 0xFF
    with pytest.raises(ValueError, match="non-Layer-III"):
        mp3_stream_stats(bytes(l1))


def test_container_stats_typed_errors_on_malformed_buffers():
    """Empty, lone-sync, ID3-only, and truncated-FLAC buffers must all
    raise the documented ValueError, never an IndexError out of the
    Arrow task."""
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        _container_stats)

    id3_only = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + bytes(10)
    trunc_flac = b"fLaC" + bytes(12)     # header + partial STREAMINFO
    zero_rate_flac = b"fLaC" + bytes(38)  # STREAMINFO with rate 0
    bad_wav = b"RIFF\x24\x00\x00\x00WAVEjunkjunkjunk"
    for buf in (b"", b"\xff", id3_only, b"garbage!", trunc_flac,
                zero_rate_flac, bad_wav):
        with pytest.raises(ValueError):
            _container_stats(buf)


def test_id3v24_footer_flag_skipped():
    """An ID3v2.4 tag with the footer flag occupies size+20 bytes; the
    sync scan must start after the footer."""
    frames = encode_mp3_frames([9, 9])
    tag = b"ID3\x04\x00\x10" + bytes((0, 0, 0, 8)) + bytes(8)  # flags 0x10
    footer = b"3DI\x04\x00\x10" + bytes((0, 0, 0, 8))
    buf = tag + footer + frames
    assert id3v2_size(buf) == 28
    assert mp3_stream_stats(buf).n_frames == 2


def test_id3v23_stray_footer_flag_ignored():
    """The footer exists only in ID3v2.4 — a stray 0x10 flag bit on a
    v2.3 tag must NOT widen the skip (it would swallow audio bytes)."""
    frames = encode_mp3_frames([9])
    tag = b"ID3\x03\x00\x10" + bytes((0, 0, 0, 8)) + bytes(8)
    buf = tag + frames
    assert id3v2_size(buf) == 18
    assert mp3_stream_stats(buf).n_frames == 1


def test_audio_container_stats_dispatch(spark):
    """One frame of each container through the Arrow path: WAV, FLAC,
    and MP3 all report header-exact duration without PCM decode."""
    from simpy__kafka__flink__kafka_spark.functions.flac import encode_flac
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        audio_container_stats, encode_wav)

    samples = np.arange(160, dtype=np.int16).reshape(-1, 1)
    rows = [
        (1, bytearray(encode_wav(samples, 16000))),
        (2, bytearray(encode_flac(samples.ravel(), sample_rate=8000))),
        (3, bytearray(encode_mp3_frames([9, 10, 9, 9], id3_bytes=12))),
        # a cut-off download: full frame + a second frame's header with
        # only a sliver of its declared 417-byte payload
        (4, bytearray(encode_mp3_frames([9])
                      + encode_mp3_frames([9])[:10])),
    ]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r for r in audio_container_stats(media).collect()}
    assert got[1].format == "wav"
    assert (got[1].n_frames, got[1].sample_rate) == (160, 16000)
    assert got[1].duration_ms == 160 * 1000 // 16000
    assert got[1].truncated == 0
    assert got[2].format == "flac"
    assert (got[2].n_frames, got[2].sample_rate) == (160, 8000)
    assert got[2].truncated == 0
    assert got[3].format == "mp3"
    assert (got[3].n_frames, got[3].vbr) == (4, 1)
    assert (got[3].min_kbps, got[3].max_kbps) == (128, 160)
    assert got[3].truncated == 0
    # the flag the corpus quality filter reads (VERDICT r11 task 5):
    # visible AT THE PLAN LAYER, cut-off frame excluded from the stats
    assert got[4].format == "mp3"
    assert (got[4].n_frames, got[4].truncated) == (1, 1)
    assert got[4].duration_ms == 1152 * 1000 // 44100


def test_mp3_synth_stats_matches_id_arithmetic(spark):
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        mp3_synth_stats)

    docs = spark.createDataFrame([(i,) for i in range(12)],
                                 "doc_id long")
    got = {r.doc_id: r for r in mp3_synth_stats(docs).collect()}
    for i in range(12):
        n = 3 + i % 5
        r = got[i]
        assert r.n_frames == n
        assert r.sample_rate == 44100
        assert r.duration_ms == n * 1152 * 1000 // 44100
        if i % 3 == 0:
            assert (r.min_kbps, r.max_kbps, r.vbr) == (128, 160, 1)
        else:
            assert (r.min_kbps, r.max_kbps, r.vbr) == (128, 128, 0)
        assert r.truncated == (1 if i % 4 == 1 else 0)


def test_id3_frames_roundtrip_and_truncation_typed():
    import pytest

    from simpy__kafka__flink__kafka_spark.functions.mp3 import (
        build_id3v2, id3_frames)

    tag = build_id3v2("T", "A", "Al", "1999")
    got = id3_frames(tag)
    assert (got["title"], got["artist"], got["album"], got["year"]) == \
        ("T", "A", "Al", "1999")
    assert got["n_frames"] == 4 and got["version"] == "2.3"
    # tag declaring more bytes than the buffer holds -> typed
    with pytest.raises(ValueError, match="declares more"):
        id3_frames(tag[:20])
    # a frame whose size runs past the tag -> typed
    bad = bytearray(tag)
    bad[14:18] = (10_000).to_bytes(4, "big")
    with pytest.raises(ValueError, match="runs past"):
        id3_frames(bytes(bad))


def test_id3_v24_syncsafe_and_utf8():
    from simpy__kafka__flink__kafka_spark.functions.mp3 import id3_frames

    text = b"\x03caf\xc3\xa9 title"          # utf-8 encoding byte 3
    frame = b"TIT2" + bytes([0, 0, 0, len(text)]) + b"\0\0" + text
    body = frame
    sz = len(body)
    hdr = b"ID3" + bytes([4, 0, 0]) + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F,
         sz & 0x7F])
    got = id3_frames(hdr + body)
    assert got["version"] == "2.4" and got["title"] == "café title"


def _v23_tag(body: bytes, flags: int = 0) -> bytes:
    sz = len(body)
    return b"ID3" + bytes([3, 0, flags]) + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F,
         sz & 0x7F]) + body


def _v24_tag(body: bytes, flags: int = 0) -> bytes:
    sz = len(body)
    return b"ID3" + bytes([4, 0, flags]) + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F,
         sz & 0x7F]) + body


def test_id3_utf16be_and_bomless_utf16():
    """Task-4 seam close: encoding byte 2 (UTF-16BE, v2.4) and
    BOM-less encoding byte 1 (real taggers omit the BOM; LE assumed)
    both decode instead of raising."""
    from simpy__kafka__flink__kafka_spark.functions.mp3 import id3_frames

    be = "café".encode("utf-16-be")
    frame_be = b"TIT2" + bytes([0, 0, 0, len(be) + 1]) + b"\0\0" \
        + bytes([2]) + be
    got = id3_frames(_v24_tag(frame_be))
    assert got["title"] == "café"

    le = "naïve".encode("utf-16-le")              # no BOM
    frame_le = b"TPE1" + (len(le) + 1).to_bytes(4, "big") + b"\0\0" \
        + bytes([1]) + le
    got = id3_frames(_v23_tag(frame_le))
    assert got["artist"] == "naïve"

    bom = "söng".encode("utf-16")                 # stdlib adds LE BOM
    frame_bom = b"TALB" + (len(bom) + 1).to_bytes(4, "big") + b"\0\0" \
        + bytes([1]) + bom
    assert id3_frames(_v23_tag(frame_bom))["album"] == "söng"
    # big-endian BOM too
    bom_be = b"\xfe\xff" + "zürich".encode("utf-16-be")
    frame2 = b"TALB" + (len(bom_be) + 1).to_bytes(4, "big") + b"\0\0" \
        + bytes([1]) + bom_be
    assert id3_frames(_v23_tag(frame2))["album"] == "zürich"


def test_id3_extended_header_skipped_both_layouts():
    from simpy__kafka__flink__kafka_spark.functions.mp3 import id3_frames

    frame = b"TIT2" + (2).to_bytes(4, "big") + b"\0\0" + b"\0X"
    # v2.3: ext size EXCLUDES its own 4 bytes (6 bytes of payload)
    ext23 = (6).to_bytes(4, "big") + bytes(6)
    got = id3_frames(_v23_tag(ext23 + frame, flags=0x40))
    assert got["title"] == "X" and got["n_frames"] == 1

    # v2.4: syncsafe size INCLUDES the whole extended header
    frame4 = b"TIT2" + bytes([0, 0, 0, 2]) + b"\0\0" + b"\0Y"
    ext24 = bytes([0, 0, 0, 8]) + bytes(4)        # 8 bytes total
    got = id3_frames(_v24_tag(ext24 + frame4, flags=0x40))
    assert got["title"] == "Y" and got["n_frames"] == 1

    import pytest
    # ext header running past the tag -> typed
    with pytest.raises(ValueError, match="extended header"):
        id3_frames(_v23_tag((100).to_bytes(4, "big") + bytes(4),
                            flags=0x40))


def test_id3_unsync_flag_typed():
    import pytest

    from simpy__kafka__flink__kafka_spark.functions.mp3 import id3_frames

    with pytest.raises(ValueError, match="unsynchronisation"):
        id3_frames(_v23_tag(bytes(10), flags=0x80))


def test_id3_stats_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["id3_stats"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir, "id3_stats")


def test_id3_v22_three_char_frames():
    """Round-13: ID3v2.2 (6-byte frame headers, 3-char ids, 3-byte
    sizes) parses; compression flag (bit 6 means compression in 2.2,
    not extended header) stays typed."""
    from simpy__kafka__flink__kafka_spark.functions.mp3 import id3_frames

    def frame22(fid: str, text: str) -> bytes:
        data = b"\0" + text.encode("latin-1")
        return fid.encode() + len(data).to_bytes(3, "big") + data

    body = (frame22("TT2", "Old Song") + frame22("TP1", "Old Band")
            + frame22("TAL", "Old Album") + frame22("TYE", "1997")
            + b"\0" * 6)
    sz = len(body)
    tag = b"ID3" + bytes([2, 0, 0]) + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F,
         sz & 0x7F]) + body
    got = id3_frames(tag)
    assert (got["version"], got["n_frames"]) == ("2.2", 4)
    assert (got["title"], got["artist"], got["album"], got["year"]) == \
        ("Old Song", "Old Band", "Old Album", "1997")
    # UCS-2 BOM text (encoding 1 in 2.2)
    ucs = "söng".encode("utf-16")
    f = b"TT2" + (len(ucs) + 1).to_bytes(3, "big") + bytes([1]) + ucs
    sz2 = len(f)
    tag2 = b"ID3" + bytes([2, 0, 0]) + bytes(
        [(sz2 >> 21) & 0x7F, (sz2 >> 14) & 0x7F, (sz2 >> 7) & 0x7F,
         sz2 & 0x7F]) + f
    assert id3_frames(tag2)["title"] == "söng"

    import pytest
    bad = b"ID3" + bytes([2, 0, 0x40]) + bytes(4)
    with pytest.raises(ValueError, match="compression"):
        id3_frames(bad)


def test_audio_container_dispatch_handles_ogg(spark):
    """Round 13: OggS payloads dispatch through the page walk —
    duration from the last granule (opus granules are always 48 kHz
    regardless of the id header's input rate)."""
    from simpy__kafka__flink__kafka_spark.functions.multimodal import (
        audio_container_stats)
    from simpy__kafka__flink__kafka_spark.functions.ogg import build_ogg

    rows = [
        (1, bytearray(build_ogg("vorbis", 2, 44100,
                                [b"a" * 50, b"b" * 60]))),
        (2, bytearray(build_ogg("opus", 1, 16000, [b"z" * 40]))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r for r in audio_container_stats(media).collect()}
    assert got[1].format == "ogg"
    assert got[1].sample_rate == 44100
    assert got[1].duration_ms == 1920 * 1000 // 44100
    assert got[2].format == "ogg"
    # opus: granule clock is 48 kHz even though input rate says 16 kHz
    assert got[2].sample_rate == 16000
    assert got[2].duration_ms == 960 * 1000 // 48000
