"""Streaming corpus ingest: quality gate + bounded-state fingerprint dedup,
and parity with the batch expressions it reuses."""

from __future__ import annotations

import datetime as _dt
import os
import time
import uuid

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.functions.text import (
    normalized, quality_score)
from simpy__kafka__flink__kafka_spark.streaming.corpus import (
    corpus_ingest, file_docs_source)

GOOD = ("the quick brown fox jumps over the lazy dog and keeps running for "
        "a while longer in the field") * 2
JUNK = "!!! ??? ..."


def _ts(s: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(s, tz=_dt.timezone.utc).replace(tzinfo=None)


def _run(spark, tmp_path, batches):
    ind = str(tmp_path / "docs_in")
    os.makedirs(ind, exist_ok=True)
    for rows in batches:
        spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts timestamp"
        ).coalesce(1).write.mode("append").parquet(ind)
        time.sleep(0.05)
    stream = file_docs_source(spark, ind, watermark="10 minutes")
    q = (
        corpus_ingest(stream, min_quality=0.3)
        .writeStream.format("memory")
        .queryName(f"ci_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {q.name}").collect()
    finally:
        q.stop()


def test_dedup_and_quality_gate(spark, tmp_path):
    rows = _run(spark, tmp_path, [
        [(1, GOOD, _ts(10)), (2, JUNK, _ts(11))],
        # 3 duplicates GOOD within the horizon; 4 is new content
        [(3, GOOD, _ts(20)), (4, GOOD + " extra tail words", _ts(21))],
    ])
    ids = sorted(r.doc_id for r in rows)
    assert 2 not in ids              # junk filtered by the quality gate
    assert len([i for i in ids if i in (1, 3)]) == 1  # one fingerprint kept
    assert 4 in ids                  # distinct content passes


def test_emitted_columns_match_batch_expressions(spark, tmp_path):
    rows = _run(spark, tmp_path, [[(1, GOOD, _ts(10))]])
    assert len(rows) == 1
    got = rows[0]
    want = (
        spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
        .select(
            quality_score("text").alias("q"),
            F.md5(normalized("text")).alias("fp"),
        )
        .first()
    )
    assert got.quality == want.q
    assert got.fingerprint == want.fp
    assert got.n_tokens > 0
