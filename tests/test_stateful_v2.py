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


@pytest.mark.skipif(not HAS_TWS,
                    reason="needs Spark >= 4.0 with a working protobuf install")
def test_tws_state_survives_checkpoint_restart(spark, tmp_path):
    """W6 on the native operator: value states AND registered event-time
    timers written before a stop must survive a restart from the same
    RocksDB checkpoint — the emitted record carries the pre-restart
    parents, and the pre-restart timer fires once the watermark moves."""
    import json as _json

    from simpy__kafka__flink__kafka_spark.streaming.stateful import (
        UPDATE_SCHEMA)
    from simpy__kafka__flink__kafka_spark.streaming.stateful_v2 import (
        aggregate_updates_stream_v2)

    enable_rocksdb_state(spark)
    upd_dir, ck, out_dir = (str(tmp_path / k) for k in ("upd", "ck", "out"))
    os.makedirs(upd_dir)

    def write_batch(rows):
        spark.createDataFrame(rows, UPDATE_SCHEMA).coalesce(1).write.mode(
            "append").parquet(upd_dir)

    def read_out():
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:  # sink dir not created yet
            return []

    def run_until(cond_fn, timeout_s=60):
        updates = (
            spark.readStream.schema(UPDATE_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(upd_dir)
        )
        out = aggregate_updates_stream_v2(updates, watermark="0 seconds")
        # file sink, not memory: only file-backed sinks support restarting
        # from a checkpoint
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck).outputMode("append").start()
        )
        try:
            q.processAllAvailable()
            deadline = time.time() + timeout_s
            while time.time() < deadline and not cond_fn():
                time.sleep(0.5)
        finally:
            q.stop()

    from datetime import datetime, timezone

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)

    payload = _json.dumps({"id": "a", "src_ip": "10.0.0.1",
                           "dst_ip": "10.0.0.2", "start_at_ms": 1000,
                           "latency_msec": 500.0, "end_at_ms": 1500})
    # batch 1: message + one parent edge; watermark (0 s) stays at 1.1 s
    # < end 1.5 s, so nothing emits — state + timer are checkpointed
    write_batch([("a", "message", None, payload, ts(1.0)),
                 ("a", "add_parent", "p1", None, ts(1.1))])
    run_until(lambda: True, timeout_s=0)
    assert not any(r.id == "a" for r in read_out())

    # restart from the same checkpoint; batch 2 only advances the watermark
    flush = _json.dumps({"id": "zz", "src_ip": "9", "dst_ip": "9",
                         "start_at_ms": 100_000_000,
                         "latency_msec": 1.0, "end_at_ms": 100_000_001})
    write_batch([("zz", "message", None, flush, ts(100_000.0))])

    def emitted():
        return any(r.id == "a" for r in read_out())

    run_until(emitted)
    rows = {r.id: r for r in read_out()}
    assert "a" in rows, "pre-restart state/timer lost across checkpoint"
    assert list(rows["a"].parents) == ["p1"]
    assert list(rows["a"].children) == []
