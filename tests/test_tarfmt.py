"""ustar walk + WebDataset manifest (functions/tarfmt.py):
cross-validation against stdlib tarfile, malformed typing, grouping
semantics, and the registry row's DuckDB parity."""

from __future__ import annotations

import io
import tarfile

import pytest

from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
    _sample_key, tar_entries)


def _tar(entries):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as t:
        for name, data in entries:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            t.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def test_walk_matches_tarfile_writer():
    raw = _tar([("000/1.img", b"x" * 700), ("000/1.json", b'{"a":1}'),
                ("deep/dir/2.bin", b"")])
    ents = tar_entries(raw)
    assert [(e.name, e.size) for e in ents] == [
        ("000/1.img", 700), ("000/1.json", 7), ("deep/dir/2.bin", 0)]
    with tarfile.open(fileobj=io.BytesIO(raw)) as t:
        assert [i.name for i in t.getmembers()] == [e.name for e in ents]


def test_sample_key_rule():
    assert _sample_key("000/123.jpg") == "000/123"
    assert _sample_key("000/123.cls.txt") == "000/123.cls"
    assert _sample_key("a.b/noext") == "a.b/noext"   # dot only in dir
    assert _sample_key("plain") == "plain"


def test_malformed_tar_typed():
    raw = bytearray(_tar([("x", b"data")]))
    raw[10] ^= 0xFF            # corrupt header -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        tar_entries(bytes(raw))
    with pytest.raises(ValueError, match="truncated"):
        tar_entries(_tar([("x", b"data")])[:600])
    # size field pointing past the buffer
    raw2 = bytearray(_tar([("x", b"data")]))
    raw2[124:136] = b"77777777777\x00"   # huge octal size
    # checksum now wrong too -> still a typed error either way
    with pytest.raises(ValueError):
        tar_entries(bytes(raw2))


def test_manifest_grouping_and_completeness(spark):
    from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
        webdataset_manifest)

    raw = _tar([("s/0.img", b"a" * 5), ("s/0.json", b"{}"),
                ("s/1.img", b"b" * 3), ("s/1.json", b"{}"),
                ("s/lone.txt", b"z")])
    media = spark.createDataFrame([(7, bytearray(raw))],
                                  "doc_id long, content binary")
    r = webdataset_manifest(media).collect()[0]
    assert r["n_entries"] == 5 and r["n_samples"] == 3
    assert r["complete_samples"] == 2      # modal member count is 2
    assert r["size_total"] == 5 + 2 + 3 + 2 + 1


def test_webdataset_manifest_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["webdataset_manifest"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "webdataset_manifest")


def test_ustar_writer_stdlib_and_walk_triangle():
    """Round-13 writer: stdlib tarfile AND the vendored walk both read
    build_ustar output (three independent layouts of one spec);
    deterministic bytes; block-padding edges at 0/511/512/513."""
    import io
    import tarfile as tf

    from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
        build_ustar, tar_entries)

    entries = [("a/x.txt", b""), ("a/y.bin", b"q" * 511),
               ("b/z.bin", b"r" * 512), ("b/w.bin", b"s" * 513)]
    raw = build_ustar(entries)
    assert raw == build_ustar(entries)           # deterministic
    with tf.open(fileobj=io.BytesIO(raw)) as t:
        assert [(m.name, m.size) for m in t.getmembers()] == \
            [(n, len(d)) for n, d in entries]
        assert t.extractfile("b/w.bin").read() == b"s" * 513
    assert [(e.name, e.size) for e in tar_entries(raw)] == \
        [(n, len(d)) for n, d in entries]

    import pytest
    with pytest.raises(ValueError, match="100 bytes"):
        build_ustar([("n" * 101, b"")])


def test_pack_webdataset_shards_roundtrip(spark):
    from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
        pack_webdataset_shards, webdataset_manifest)

    docs = spark.createDataFrame(
        [(i, f"text for document {i}") for i in range(0, 40, 3)],
        "doc_id long, text string")
    packed = pack_webdataset_shards(docs, samples_per_shard=16)
    rows = {r["shard_id"]: r for r in
            webdataset_manifest(packed, id_col="shard_id").collect()}
    # ids 0..39 step 3 -> shards 0 (0..15: 6 docs), 1 (18..30: 5), 2 (33..39: 3)
    assert {k: v["n_samples"] for k, v in rows.items()} == \
        {0: 6, 1: 5, 2: 3}
    assert all(v["complete_samples"] == v["n_samples"]
               for v in rows.values())


def test_webdataset_pack_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["webdataset_pack"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "webdataset_pack")


def test_pack_shard_assignment_floors_and_writer_guards(spark):
    """Review fixes: shard assignment is exact integer division (big
    ids never pass through a double), negative ids are a TYPED
    refusal (round-14 ADVICE: the %012d-vs-lpad and div-vs-floor
    renderings are undefined for negatives), and the writer refuses
    sizes past the 11-digit octal field instead of corrupting the
    header."""
    from simpy__kafka__flink__kafka_spark.functions.tarfmt import (
        build_ustar, pack_webdataset_shards)

    docs = spark.createDataFrame(
        [(0, "zero"), (15, "a"), (16, "b")],
        "doc_id long, text string")
    got = {r["shard_id"]: r["n_samples"]
           for r in pack_webdataset_shards(
               docs, samples_per_shard=16).collect()}
    assert got == {0: 2, 1: 1}

    import pytest

    class Huge(bytes):
        def __len__(self):
            return 8 ** 11           # 8 GiB without allocating it

    with pytest.raises(ValueError, match="octal"):
        build_ustar([("big.bin", Huge())])
