from __future__ import annotations

import os
import time

from simpy__kafka__flink__kafka_spark.schemas import golden_messages
from simpy__kafka__flink__kafka_spark.sources.generator import (
    closed_world_links, generate_trace_spans)
from simpy__kafka__flink__kafka_spark.streaming.pipeline import (
    file_spans_source, link_traces_foreach_batch)


def test_foreach_batch_matches_closed_world(spark, tmp_path):
    spans = generate_trace_spans(n_traces=25, seed=11, ip_pool_size=3)
    d = {k: str(tmp_path / k) for k in ("in", "accum", "out", "ck")}
    os.makedirs(d["in"])
    for rows in (spans[0::2], spans[1::2]):  # two micro-batches
        golden_messages(spark, rows).coalesce(1).write.mode("append").parquet(d["in"])
        time.sleep(0.05)
    src = file_spans_source(spark, d["in"], watermark=None)
    q = link_traces_foreach_batch(src, d["accum"], d["out"], d["ck"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(d["out"]).collect()
    got = {r.id: (list(r.parents), list(r.children)) for r in out}
    assert got == closed_world_links(spans)
