"""R1/R2 round-trip: serialize then lenient-parse must reproduce the spans
(and the recall direction parse(serialize(x)) == x for clean input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.schemas import messages_from_events
from simpy__kafka__flink__kafka_spark.streaming.pipeline import parse_spans


def test_serialize_parse_roundtrip(spark, sf_dir):
    msgs = messages_from_events(spark, sf_dir)
    serialized = msgs.select(
        F.to_json(F.struct(*msgs.columns)).alias("value")
    )
    back = parse_spans(serialized)
    orig = {r.id: r for r in msgs.collect()}
    rt = {r.id: r for r in back.collect()}
    assert set(orig) == set(rt)
    for k, o in orig.items():
        r = rt[k]
        assert (r.src_ip, r.dst_ip, r.start_at_ms, r.latency_msec, r.end_at_ms) == (
            o.src_ip, o.dst_ip, o.start_at_ms, o.latency_msec, o.end_at_ms
        ), k
