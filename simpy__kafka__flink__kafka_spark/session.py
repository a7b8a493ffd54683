"""SparkSession factory.

Local mode for tests/bench; the same configs are the ones that matter on a
real cluster (AQE for runtime re-planning and skew-join splitting, UTC
session timezone so epoch-millis expressions are stable, Arrow for any
pandas exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ._protobuf_compat import ensure_protobuf


def enable_rocksdb_state(spark: SparkSession) -> None:
    """Production state-store posture for streaming (the reference requires
    strict state memory control + incremental checkpointing,
    ``requirements-v2.md:82-88``): RocksDB keeps join/agg state off-heap
    on local disk and changelog checkpointing uploads per-batch deltas
    instead of full snapshots.  Runtime-settable; applies to queries
    started afterwards."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )


def get_spark(app_name: str = "simpy_kafka_flink_kafka_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    # transformWithStateInPandas needs google.protobuf in driver AND workers;
    # resolve it (possibly via a vendored runtime + PYTHONPATH export) BEFORE
    # the JVM launches so forked python workers inherit the environment.
    ensure_protobuf()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # status-store metadata only (no execution effect): the bench reads
        # per-query executor task time as cumulative deltas from the
        # AppStatusStore; the default 1000-stage retention would evict
        # stages mid-delta over a 93-query x 3-rep session and corrupt it
        .config("spark.ui.retainedStages", "20000")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
