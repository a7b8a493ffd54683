"""Streaming windowed aggregations emit closed windows as the watermark
advances (append mode)."""

from __future__ import annotations

import os
import time
import uuid

import pytest

from simpy__kafka__flink__kafka_spark.schemas import golden_messages
from simpy__kafka__flink__kafka_spark.streaming.pipeline import file_spans_source
from simpy__kafka__flink__kafka_spark.streaming.windows import (
    session_ip_activity, sliding_ip_throughput, tumbling_span_stats)

# two spans in minute 0, one in minute 2; flush far ahead closes everything
BATCH1 = [
    ("a", "10.0.0.1", "10.0.0.2", 5_000, 100.0, 5_100),
    ("b", "10.0.0.1", "10.0.0.2", 20_000, 200.0, 20_200),
    ("c", "10.0.0.3", "10.0.0.2", 130_000, 50.0, 130_050),
]
FLUSH = [("flush", "10.9.9.9", "10.9.9.8", 10_000_000, 10.0, 10_000_010)]


def _run(spark, tmp_path, build):
    ind = str(tmp_path / "in")
    os.makedirs(ind, exist_ok=True)
    for rows in (BATCH1, FLUSH):
        golden_messages(spark, rows).coalesce(1).write.mode("append").parquet(ind)
        time.sleep(0.05)
    spans = file_spans_source(spark, ind, watermark="10 seconds")
    q = (
        build(spans)
        .writeStream.format("memory")
        .queryName(f"w_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {q.name}").collect()
    finally:
        q.stop()


def test_tumbling_counts(spark, tmp_path):
    rows = _run(spark, tmp_path, tumbling_span_stats)
    by_start = {r.win_start.isoformat(): r.n_spans for r in rows}
    assert by_start.get("1970-01-01T00:00:00") == 2  # spans a, b
    assert by_start.get("1970-01-01T00:02:00") == 1  # span c


def test_sliding_throughput(spark, tmp_path):
    rows = _run(spark, tmp_path, sliding_ip_throughput)
    # span a (t=5s) belongs to windows starting at -30s and 0s
    hits = [r for r in rows if r.dst_ip == "10.0.0.2"]
    assert sum(r.n_calls for r in hits) >= 4


def test_session_windows(spark, tmp_path):
    rows = _run(spark, tmp_path, session_ip_activity)
    sess = {(r.src_ip, r.n_spans) for r in rows}
    # a+b within 30s gap -> one 2-span session for 10.0.0.1; c alone
    assert ("10.0.0.1", 2) in sess
    assert ("10.0.0.3", 1) in sess


def test_streaming_dedup_drops_redelivered_spans(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a span re-delivered in a later
    micro-batch (within the watermark horizon) is emitted exactly once."""
    from simpy__kafka__flink__kafka_spark.streaming.windows import dedup_spans

    ind = str(tmp_path / "in")
    os.makedirs(ind, exist_ok=True)
    b1 = [
        ("a", "10.0.0.1", "10.0.0.2", 5_000, 100.0, 5_100),
        ("b", "10.0.0.1", "10.0.0.2", 6_000, 200.0, 6_200),
    ]
    b2 = [  # 'a' redelivered verbatim + one new span
        ("a", "10.0.0.1", "10.0.0.2", 5_000, 100.0, 5_100),
        ("c", "10.0.0.3", "10.0.0.2", 7_000, 50.0, 7_050),
    ]
    for rows in (b1, b2, FLUSH):
        golden_messages(spark, rows).coalesce(1).write.mode("append").parquet(ind)
        time.sleep(0.05)
    spans = file_spans_source(spark, ind, watermark="30 seconds")
    q = (
        dedup_spans(spans)
        .writeStream.format("memory")
        .queryName(f"dd_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT id FROM {q.name}").collect()
    finally:
        q.stop()
    ids = sorted(r.id for r in rows)
    assert ids == ["a", "b", "c", "flush"]
