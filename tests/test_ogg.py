"""OGG page walk (functions/ogg.py): CRC cross-validated against an
independent bitwise implementation, fixture roundtrips, multi-segment
lacing, malformed typing, and the registry row's DuckDB parity."""

from __future__ import annotations

import pytest

from simpy__kafka__flink__kafka_spark.functions.ogg import (
    build_ogg, ogg_crc, ogg_stats)


def _crc_bitwise(data: bytes) -> int:
    """Independent long-division CRC over the same spec polynomial —
    no table, different loop structure, so a table-generation bug
    cannot mirror."""
    r = 0
    for b in data:
        r ^= b << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000
                 else r << 1) & 0xFFFFFFFF
    return r


def test_crc_matches_independent_implementation():
    for data in (b"", b"\x00", b"OggS", b"abc123" * 40, bytes(range(256))):
        assert ogg_crc(data) == _crc_bitwise(data)


def test_vorbis_and_opus_roundtrip():
    v = ogg_stats(build_ogg("vorbis", 2, 44100, [b"a" * 60, b"b" * 70]))
    assert (v.codec, v.channels, v.sample_rate) == ("vorbis", 2, 44100)
    assert v.n_pages == 3 and v.n_streams == 1
    assert v.last_granule == 1920
    assert v.body_bytes == 23 + 60 + 70

    o = ogg_stats(build_ogg("opus", 1, 48000, [b"z" * 10]))
    assert (o.codec, o.channels, o.sample_rate) == ("opus", 1, 48000)
    assert o.body_bytes == 19 + 10


def test_multi_segment_lacing():
    # a 600-byte body laces as 255+255+90 across three segments; a
    # 255-multiple body needs the trailing 0 lacing value
    for size in (600, 510):
        s = ogg_stats(build_ogg("opus", 1, 48000, [b"q" * size]))
        assert s.body_bytes == 19 + size and s.n_pages == 2


def test_malformed_typed():
    raw = bytearray(build_ogg("opus", 1, 48000, [b"x" * 30]))
    raw[40] ^= 0xFF                      # flip a byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC mismatch"):
        ogg_stats(bytes(raw))
    with pytest.raises(ValueError, match="capture"):
        ogg_stats(b"not ogg data")
    good = build_ogg("opus", 1, 48000, [b"x" * 30])
    with pytest.raises(ValueError, match="outside buffer|truncated"):
        ogg_stats(good[:-10])
    # version != 0 is typed (and breaks the CRC too — either error ok)
    bad_ver = bytearray(good)
    bad_ver[4] = 1
    with pytest.raises(ValueError):
        ogg_stats(bytes(bad_ver))


def test_ogg_stats_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["ogg_audio_stats"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "ogg_audio_stats")
