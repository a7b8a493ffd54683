"""Streaming-vs-batch equivalence on the real testdata view (SURVEY.md §5's
required equivalence test): the two-phase streaming pipeline over in-order
arrival must reproduce the batch flagship exactly."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F  # noqa: F401

from simpy__kafka__flink__kafka_spark.operators.linking import link_traces
from simpy__kafka__flink__kafka_spark.schemas import messages_from_events
from simpy__kafka__flink__kafka_spark.streaming.pipeline import (
    aggregate_bridge, file_spans_source, link_traces_two_phase)

COLS = ("id string, src_ip string, dst_ip string, start_at_ms long, "
        "latency_msec double, end_at_ms long")


def test_streaming_equals_batch_on_testdata(spark, sf_dir, tmp_path):
    msgs = messages_from_events(spark, sf_dir)
    batch = {r["id"]: (list(r["parents"]), list(r["children"]))
             for r in link_traces(msgs).collect()}

    ind = str(tmp_path / "in")
    os.makedirs(ind)
    ordered = msgs.orderBy("start_at_ms", "id").collect()
    n = len(ordered)
    chunk = (n + 4) // 5
    for i in range(0, n, chunk):
        spark.createDataFrame(
            [tuple(r) for r in ordered[i:i + chunk]], COLS
        ).coalesce(1).write.mode("append").parquet(ind)
        time.sleep(0.05)
    flush_at = ordered[-1].start_at_ms + 10 ** 9
    spark.createDataFrame(
        [("__flush__", "x", "y", flush_at, 1.0, flush_at + 1)], COLS
    ).coalesce(1).write.mode("append").parquet(ind)

    src = file_spans_source(spark, ind, watermark="30 seconds")
    p1 = link_traces_two_phase(src, str(tmp_path / "bridge"),
                               str(tmp_path / "ck1"))
    p1.processAllAvailable()
    p1.stop()
    q = (
        aggregate_bridge(spark, str(tmp_path / "bridge"))
        .writeStream.format("memory").queryName("sbe").outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sbe").collect()
    finally:
        q.stop()
    got = {r.id: (list(r.parents), list(r.children))
           for r in rows if r.id != "__flush__"}
    assert got == batch
