"""The transformWithStateInPandas aggregation must reproduce the v1
(applyInPandasWithState) watermark-emit semantics."""

from __future__ import annotations

import os
import time
import uuid

import pytest

from simpy__kafka__flink__kafka_spark.schemas import golden_messages
from simpy__kafka__flink__kafka_spark.session import enable_rocksdb_state
from simpy__kafka__flink__kafka_spark.streaming.pipeline import (
    aggregate_bridge_v2, file_spans_source, link_traces_two_phase)
from simpy__kafka__flink__kafka_spark.streaming.stateful_v2 import HAS_TWS

G1 = [
    ("id1", "10.0.0.1", "10.0.0.2", 1000, 500.0, 1500),
    ("id2", "10.0.0.2", "10.0.0.3", 1100, 200.0, 1300),
    ("id3", "10.0.0.3", "10.0.0.4", 1120, 100.0, 1220),
]
FLUSH = [("flush", "10.9.9.9", "10.9.9.8", 100_000, 10.0, 100_010)]


@pytest.mark.skipif(not HAS_TWS,
                    reason="needs Spark >= 4.0 with a working protobuf install")
def test_tws_agg_matches_v1_semantics(spark, tmp_path):
    # transformWithStateInPandas uses multiple state column families, which
    # the default HDFSBackedStateStoreProvider rejects — RocksDB required
    enable_rocksdb_state(spark)
    ind, bridge, ck1 = (str(tmp_path / k) for k in ("in", "bridge", "ck1"))
    os.makedirs(ind)
    for rows in (G1, FLUSH):
        golden_messages(spark, rows).coalesce(1).write.mode("append").parquet(ind)
        time.sleep(0.05)
    spans = file_spans_source(spark, ind, watermark="0 seconds")
    p1 = link_traces_two_phase(spans, bridge, ck1, watermark="0 seconds")
    p1.processAllAvailable()
    p1.stop()

    out = aggregate_bridge_v2(spark, bridge, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName(f"tws_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {q.name}").collect()
    finally:
        q.stop()
    got = {r.id: (list(r.parents), list(r.children)) for r in rows}
    assert got == {
        "id1": ([], ["id2"]),
        "id2": (["id1"], ["id3"]),
        "id3": (["id2"], []),
    }


@pytest.mark.skipif(not HAS_TWS,
                    reason="needs Spark >= 4.0 with a working protobuf install")
def test_tws_idle_flush_emits_on_wall_clock(spark, tmp_path):
    """The native processing-time TWS twin: a sparse key flushes after
    idle_ms on the WALL clock even though no watermark ever passes its end
    time — the divergence the v1 event-time emulation documents is closed
    by this operator."""
    from simpy__kafka__flink__kafka_spark.streaming.stateful import (
        span_message_events)
    from simpy__kafka__flink__kafka_spark.streaming.stateful_v2 import (
        aggregate_updates_idle_v2)

    enable_rocksdb_state(spark)
    ind = str(tmp_path / "in")
    os.makedirs(ind)
    rows = [("solo2", "10.0.0.1", "10.0.0.2", 1000, 500.0, 1500)]
    golden_messages(spark, rows).coalesce(1).write.mode("append").parquet(ind)

    spans = file_spans_source(spark, ind, watermark=None)
    out = aggregate_updates_idle_v2(span_message_events(spans), idle_ms=1500)
    q = (
        out.writeStream.format("memory")
        .queryName(f"tws_idle_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    try:
        emitted = {}
        deadline = time.time() + 60
        while time.time() < deadline:
            emitted = {r.id: r for r in
                       spark.sql(f"SELECT * FROM {q.name}").collect()}
            if "solo2" in emitted:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert "solo2" in emitted
    assert emitted["solo2"].parents == [] and emitted["solo2"].children == []
