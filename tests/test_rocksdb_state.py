"""The full pipeline runs on the RocksDB state store with changelog
(incremental) checkpointing — the reference's state-control requirement."""

from __future__ import annotations

import glob
import os
import time
import uuid

from simpy__kafka__flink__kafka_spark.schemas import golden_messages
from simpy__kafka__flink__kafka_spark.session import enable_rocksdb_state
from simpy__kafka__flink__kafka_spark.streaming.pipeline import (
    aggregate_bridge, file_spans_source, link_traces_two_phase)

G1 = [
    ("id1", "10.0.0.1", "10.0.0.2", 1000, 500.0, 1500),
    ("id2", "10.0.0.2", "10.0.0.3", 1100, 200.0, 1300),
    ("id3", "10.0.0.3", "10.0.0.4", 1120, 100.0, 1220),
]
FLUSH = [("flush", "10.9.9.9", "10.9.9.8", 100_000, 10.0, 100_010)]


def test_pipeline_on_rocksdb_state_store(spark, tmp_path):
    enable_rocksdb_state(spark)
    try:
        ind, bridge, ck1 = (str(tmp_path / k) for k in ("in", "bridge", "ck1"))
        os.makedirs(ind)
        for rows in (G1, FLUSH):
            golden_messages(spark, rows).coalesce(1).write.mode(
                "append").parquet(ind)
            time.sleep(0.05)
        src = file_spans_source(spark, ind, watermark="0 seconds")
        p1 = link_traces_two_phase(src, bridge, ck1, watermark="0 seconds")
        p1.processAllAvailable()
        p1.stop()
        q = (
            aggregate_bridge(spark, bridge, watermark="0 seconds")
            .writeStream.format("memory")
            .queryName(f"rk_{uuid.uuid4().hex[:8]}")
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
        # changelog checkpointing actually produced incremental artifacts
        logs = glob.glob(f"{ck1}/state/**/*.changelog", recursive=True)
        assert logs, "expected RocksDB changelog files in the checkpoint"
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )
