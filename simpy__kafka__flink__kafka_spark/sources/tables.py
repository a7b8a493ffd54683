"""Parquet table loaders for the driver testdata.

``events.parquet`` stores its ``ts`` column as parquet TIMESTAMP(NANOS),
which Spark's vectorized reader rejects; we read it via the runtime conf
``spark.sql.legacy.parquet.nanosAsLong`` (set per-read so it works inside
any driver-created session) and expose ``ts_ms`` (epoch millis, truncating
division — identical to DuckDB's ``epoch_ms(ts)`` on the same file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        # integer division — `/` would go through double and lose low bits
        # at nanosecond magnitudes (~1.7e18 > 2^53)
        F.expr("ts div 1000000").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
