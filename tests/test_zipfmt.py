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
