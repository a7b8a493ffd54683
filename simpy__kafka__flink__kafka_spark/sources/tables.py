"""Parquet table loaders for the driver testdata.

``events.parquet`` stores its ``ts`` column as parquet TIMESTAMP(NANOS).
How Spark surfaces that column depends on the engine version:

* Spark 3.x rejects nanos in the vectorized reader unless
  ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case the
  column loads as LONG (epoch nanoseconds).
* Spark 4.x (current sandbox: 4.1.2) ignores that legacy conf and loads
  the column natively as TIMESTAMP_NTZ (truncated to microseconds).

``read_events`` therefore branches on the *loaded* dtype and normalizes
to ``ts_ms`` (epoch millis, truncating division — identical to DuckDB's
``epoch_ms(ts)`` on the same file). ns→µs→ms truncation equals direct
ns→ms truncation for non-negative epochs, so both branches agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Harmless on Spark 4.x (ignored); required on 3.x so the scan succeeds.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = ev.schema["ts"].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        # NTZ→TZ cast must be lossless vs DuckDB's epoch_ms, which treats
        # the stored instant as UTC — pin the session zone before casting.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # integer division throughout — `/` goes through double and can
        # lose low bits at large magnitudes
        ts_ms = F.expr("unix_micros(cast(ts as timestamp)) div 1000")
    else:
        # LONG epoch-nanos (Spark 3.x nanosAsLong path)
        ts_ms = F.expr("ts div 1000000")
    return ev.select(
        "event_id",
        ts_ms.alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
