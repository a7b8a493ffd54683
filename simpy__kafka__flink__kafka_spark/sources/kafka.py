"""Kafka I/O wrappers (reference S1/S2/S4: ``FlinkKafkaConsumer``
``simpy_kafka_reader.py:345-356``, ``FlinkKafkaProducer`` ``:394-402``,
kafka-python producer ``simpy_message_generator.py:57-74``).

No broker ships in this environment, so everything here only *constructs*
plans/writers; tests assert construction and option plumbing, and the
streaming variants live in ``streaming/pipeline.py``.

Mapping notes:
* The generator's explicit round-robin partitioner
  (``simpy_message_generator.py:36-45``) is Kafka's default behavior for
  null-keyed producers — no custom code on the Spark side; key by ``id``
  instead to get per-message ordering within a partition.
* ``acks=all`` / retry semantics are broker-side options passed through
  ``kafka.``-prefixed producer configs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MSG_SCHEMA


def read_spans_batch(spark: SparkSession, bootstrap: str, topic: str,
                     starting_offsets: str = "earliest",
                     ending_offsets: str = "latest") -> DataFrame:
    """Batch Kafka read -> parsed spans (for backfill/replay jobs)."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), MSG_SCHEMA).alias("m")
    )
    return parsed.select("m.*")


def write_spans_batch(df: DataFrame, bootstrap: str, topic: str,
                      acks: str = "all") -> None:
    """S4: batch produce spans as JSON (generator-side shape).  Null key ->
    Kafka round-robin partitioning, matching the reference's partitioner."""
    (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("kafka.acks", acks)
        .save()
    )


def broker_available(bootstrap: str, timeout_s: float = 2.0) -> bool:
    """Cheap TCP probe so callers can gate Kafka paths in broker-less
    environments."""
    import socket

    try:
        host, port = bootstrap.split(",")[0].rsplit(":", 1)
        with socket.create_connection((host, int(port)), timeout=timeout_s):
            return True
    except OSError:
        return False
