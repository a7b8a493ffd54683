"""Dual-timer emit parity (reference simpy_kafka_reader.py:186-193, 247-264,
303-310): the reference runs the event-time end_at_ms timer AND a
processing-time idle flush concurrently per key.  aggregate_updates_stream_dual
folds both onto the event-time clock — this test asserts BOTH emit paths fire
in ONE operator run:

* 'fast'  — watermark passes its end_at_ms -> the W2 event-time emit;
* 'sparse' — end_at_ms is ~3 hours in the stream's future, so only the idle
  path (watermark advanced idle_horizon past its last activity) can explain
  its emission, updates merged and all.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import time
import uuid

from simpy__kafka__flink__kafka_spark.streaming.stateful import (
    UPDATE_SCHEMA, aggregate_updates_stream_dual)


def _ts(ms: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc).replace(
        tzinfo=None
    )


def _msg(key: str, start_ms: int, end_ms: int) -> tuple:
    payload = json.dumps({
        "id": key, "src_ip": "10.0.0.1", "dst_ip": "10.0.0.2",
        "start_at_ms": start_ms, "latency_msec": float(end_ms - start_ms),
        "end_at_ms": end_ms,
    })
    return (key, "message", None, payload, _ts(start_ms))


def _upd(key: str, kind: str, other: str, ts_ms: int) -> tuple:
    return (key, kind, other, None, _ts(ts_ms))


def test_both_emit_paths_fire_in_one_operator(spark, tmp_path):
    ind = str(tmp_path / "in")
    os.makedirs(ind)
    batches = [
        # batch 1: a span ending soon + a span ending hours later
        [_msg("fast", 1000, 1500), _msg("sparse", 2000, 10_000_000)],
        # batch 2: an edge update for 'sparse' (resets its idle clock), and a
        # watermark-advancing span at t=20s
        [_upd("sparse", "add_parent", "p1", 3000),
         _msg("adv", 20_000, 999_999_000)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, UPDATE_SCHEMA).coalesce(1).write.mode(
            "append").parquet(ind)
        time.sleep(0.05)

    updates = (
        spark.readStream.schema(UPDATE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(ind)
    )
    out = aggregate_updates_stream_dual(
        updates, watermark="0 seconds", idle_horizon_ms=5_000
    )
    q = (
        out.writeStream.format("memory")
        .queryName(f"dual_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {q.name}").collect()
    finally:
        q.stop()

    got = {r.id: r for r in rows}
    # event-time path: watermark (20_000) passed fast's end (1_500)
    assert "fast" in got and got["fast"].end_at_ms == 1_500
    # idle path: sparse's end (10_000_000) is far beyond the final watermark
    # (20_000) — only the idle deadline (last activity wm + 5_000 < 20_000)
    # can have emitted it; its pre-flush update must be merged in
    assert "sparse" in got and got["sparse"].end_at_ms == 10_000_000
    assert list(got["sparse"].parents) == ["p1"]
