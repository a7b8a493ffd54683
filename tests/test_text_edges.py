"""Edge cases for the text pipeline: empty docs, sub-shingle docs, unicode."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.dedup import minhash_signatures
from simpy__kafka__flink__kafka_spark.functions.text import shingles, token_count


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_and_empty_docs_emit_no_shingles(spark):
    d = _docs(spark, [(1, ""), (2, "   "), (3, "one"), (4, "one two"),
                      (5, "one two three")])
    got = {r.doc_id: r.shingle for r in shingles(d).collect()}
    assert set(got) == {5}
    assert got[5] == "one two three"


def test_token_count_edges(spark):
    d = _docs(spark, [(1, ""), (2, "   "), (3, " a  b\tc "), (4, "solo")])
    got = {r.doc_id: r.n for r in
           d.select("doc_id", token_count("text").alias("n")).collect()}
    assert got == {1: 0, 2: 0, 3: 3, 4: 1}


def test_minhash_skips_sub_shingle_docs(spark):
    d = _docs(spark, [(1, "too short"), (2, "a full three word doc here")])
    sigs = {r.doc_id for r in minhash_signatures(d).collect()}
    assert sigs == {2}  # doc 1 has no shingles -> no signature row


def test_unicode_text_fingerprints(spark):
    from simpy__kafka__flink__kafka_spark.functions.dedup import fingerprint

    d = _docs(spark, [(1, "héllo wörld ünïcode"), (2, "héllo wörld ünïcode")])
    fps = [r.fingerprint for r in fingerprint(d).collect()]
    assert fps[0] == fps[1] and len(fps[0]) == 32
