"""ZIP central-directory walk (functions/zipfmt.py): cross-validation
against stdlib zipfile, malformed-input typing, and the registry row's
DuckDB parity."""

from __future__ import annotations

import io
import zipfile

import pytest

from simpy__kafka__flink__kafka_spark.functions.zipfmt import (
    zip_central_stats)


def _zip(entries, comment=b""):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data, method in entries:
            z.writestr(zipfile.ZipInfo(name), data, method)
        if comment:
            z.comment = comment
    return buf.getvalue()


def test_walk_matches_zipfile_writer():
    raw = _zip([("a.txt", b"hello world" * 40, zipfile.ZIP_DEFLATED),
                ("dir/b.bin", b"\x00" * 100, zipfile.ZIP_STORED),
                ("c", b"", zipfile.ZIP_STORED)])
    s = zip_central_stats(raw)
    assert s.n_entries == 3 and s.n_deflate == 1 and s.n_stored == 2
    assert s.usize_total == 11 * 40 + 100 + 0
    assert s.names == ("a.txt", "dir/b.bin", "c")
    # independent check: stdlib reads back what we counted
    with zipfile.ZipFile(io.BytesIO(raw)) as z:
        assert [i.filename for i in z.infolist()] == list(s.names)
        assert sum(i.file_size for i in z.infolist()) == s.usize_total


def test_eocd_found_past_trailing_comment():
    raw = _zip([("x", b"data", zipfile.ZIP_STORED)],
               comment=b"trailing archive comment " * 100)
    assert zip_central_stats(raw).n_entries == 1


def test_malformed_zip_raises_typed():
    with pytest.raises(ValueError, match="end-of-central"):
        zip_central_stats(b"not a zip at all")
    raw = bytearray(_zip([("x", b"data", zipfile.ZIP_STORED)]))
    # corrupt the central-directory signature
    cd = bytes(raw).find(b"PK\x01\x02")
    raw[cd] = 0x00
    with pytest.raises(ValueError):
        zip_central_stats(bytes(raw))


def test_entry_count_bomb_rejected():
    raw = bytearray(_zip([("x", b"data", zipfile.ZIP_STORED)]))
    eocd = bytes(raw).rfind(b"PK\x05\x06")
    # declare 60000 entries in a directory sized for one
    raw[eocd + 10: eocd + 12] = (60000).to_bytes(2, "little")
    raw[eocd + 8: eocd + 10] = (60000).to_bytes(2, "little")
    with pytest.raises(ValueError, match="bomb"):
        zip_central_stats(bytes(raw))


def test_zip_stats_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["zip_stats"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir, "zip_stats")


def test_eocd_signature_inside_comment_skipped():
    raw = _zip([("x", b"data", zipfile.ZIP_STORED)],
               comment=b"sneaky PK\x05\x06 bytes inside a comment pad")
    s = zip_central_stats(raw)
    assert s.n_entries == 1 and s.names == ("x",)


def test_names_fingerprint_separator_collision_resistant(spark):
    import io

    from simpy__kafka__flink__kafka_spark.functions.zipfmt import (
        zip_container_stats)

    def zbytes(names):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            for n in names:
                z.writestr(zipfile.ZipInfo(n), b"d", zipfile.ZIP_STORED)
        return bytearray(buf.getvalue())

    media = spark.createDataFrame(
        [(1, zbytes(["a|b", "c"])), (2, zbytes(["a", "b|c"]))],
        "doc_id long, content binary")
    rows = {r["doc_id"]: r["names_md5"]
            for r in zip_container_stats(media).collect()}
    assert rows[1] != rows[2]


def test_zip64_real_walk_matches_stdlib_writer():
    """Round-14: ZIP64 is implemented, no longer a typed seam.  The
    fixture is written by stdlib zipfile with its ZIP64 thresholds
    patched low, so REAL ZIP64 structures (per-entry 0x0001 extras,
    ZIP64 EOCD record + locator) appear on a small archive — the
    independent-writer cross-validation posture."""
    import io
    import zipfile
    from unittest import mock

    from simpy__kafka__flink__kafka_spark.functions.zipfmt import (
        zip_central_stats)

    payloads = [("big.bin", b"x" * 500), ("small.txt", b"hi"),
                ("dir/other.bin", b"y" * 321)]
    buf = io.BytesIO()
    with mock.patch.object(zipfile, "ZIP64_LIMIT", 100), \
            mock.patch.object(zipfile, "ZIP_FILECOUNT_LIMIT", 2):
        with zipfile.ZipFile(buf, "w",
                             compression=zipfile.ZIP_STORED) as zf:
            for name, data in payloads:
                zf.writestr(name, data)
    raw = buf.getvalue()
    # the patched writer must actually have emitted ZIP64 records
    assert raw.find(b"PK\x06\x06") >= 0 and raw.find(b"PK\x06\x07") >= 0

    s = zip_central_stats(raw)
    assert s.n_entries == 3
    assert s.names == tuple(n for n, _ in payloads)
    assert s.usize_total == sum(len(d) for _, d in payloads)
    assert s.n_stored == 3
    # stdlib agrees with our walk on per-entry sizes
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        assert s.csize_total == sum(i.compress_size for i in zf.infolist())


def test_zip64_sentinel_resolved_through_extra():
    """A hand-built central entry whose usize/csize are saturated and
    resolved through the 0x0001 extra — the >4 GiB member layout —
    walks to the declared 64-bit values (no 4 GiB fixture needed:
    only the directory is parsed, never the payload)."""
    import struct

    from simpy__kafka__flink__kafka_spark.functions.zipfmt import (
        zip_central_stats)

    big_u, big_c = 5 << 30, (4 << 30) + 7
    name = b"huge.bin"
    extra = struct.pack("<HHQQ", 0x0001, 16, big_u, big_c)
    cd = (b"PK\x01\x02"
          # vmade vneed flags method mtime mdate crc csize usize
          + struct.pack("<HHHHHHIII", 45, 45, 0, 0, 0, 0, 0,
                        0xFFFFFFFF, 0xFFFFFFFF)
          # nlen xlen clen disk iattr eattr local_off
          + struct.pack("<HHHHHII", len(name), len(extra), 0, 0, 0,
                        0, 0)
          + name + extra)
    eocd = (b"PK\x05\x06" + struct.pack("<HHHHIIH", 0, 0, 1, 1,
                                        len(cd), 0, 0))
    s = zip_central_stats(cd + eocd)
    assert (s.usize_total, s.csize_total) == (big_u, big_c)
    assert s.n_entries == 1 and s.names == ("huge.bin",)
