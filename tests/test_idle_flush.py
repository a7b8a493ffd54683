"""W3: processing-time idle flush — sparse keys emit after inactivity even
though the watermark never passes their end time (reference
``simpy_kafka_reader.py:248-254``)."""

from __future__ import annotations

import os
import time
import uuid

from simpy__kafka__flink__kafka_spark.schemas import golden_messages

from simpy__kafka__flink__kafka_spark.streaming.pipeline import file_spans_source
from simpy__kafka__flink__kafka_spark.streaming.stateful import (
    aggregate_updates_stream_idle, span_message_events)


def test_idle_flush_emits_without_watermark(spark, tmp_path):
    ind = str(tmp_path / "in")
    os.makedirs(ind)
    # a single span; watermark never advances past its end (no later records)
    rows = [("solo", "10.0.0.1", "10.0.0.2", 1000, 500.0, 1500)]
    golden_messages(spark, rows).coalesce(1).write.mode("append").parquet(ind)

    # no source watermark: the stateful aggregation defines its own
    spans = file_spans_source(spark, ind, watermark=None)
    updates = span_message_events(spans)
    out = aggregate_updates_stream_idle(updates, watermark="0 seconds",
                                        idle_ms=1500)
    q = (
        out.writeStream.format("memory")
        .queryName(f"idle_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    # NOTE: with ProcessingTimeTimeout Spark keeps scheduling micro-batches
    # so the timer can fire — processAllAvailable() never settles; poll the
    # sink instead.
    try:
        emitted = {}
        deadline = time.time() + 60
        while time.time() < deadline:
            rows_out = spark.sql(f"SELECT * FROM {q.name}").collect()
            emitted = {r.id: r for r in rows_out}
            if "solo" in emitted:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert "solo" in emitted  # emitted via idle flush, watermark never moved
    assert emitted["solo"].parents == [] and emitted["solo"].children == []


def test_kafka_wrappers_construct(spark):
    """Broker-less environment: sources/sinks must build valid plans and the
    probe must report unavailability cleanly."""
    from simpy__kafka__flink__kafka_spark.sources.kafka import broker_available
    from simpy__kafka__flink__kafka_spark.streaming.pipeline import (
        kafka_spans_source)

    assert broker_available("localhost:9092", timeout_s=0.2) is False
    try:
        df = kafka_spans_source(spark, "localhost:9092", "test-topic")
        assert df.isStreaming
        assert {f.name for f in df.schema.fields} >= {
            "id", "src_ip", "dst_ip", "start_at_ms", "end_at_ms",
            "start_ts", "end_ts",
        }
    except Exception as exc:  # kafka connector jar may be absent in local env
        assert "kafka" in str(exc).lower()
