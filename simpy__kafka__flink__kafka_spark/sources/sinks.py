"""Batch output sinks with 100 TB partitioning discipline.

Writing a petabyte-class linked-trace corpus means: partition by a
time-derived column so downstream reads prune (partition pruning is the
read-side twin of the band join), keep file counts sane per partition, and
never collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DAY_MS = 86_400_000


def write_linked_partitioned(linked: DataFrame, path: str,
                             files_per_day: int = 8) -> None:
    """Write linked traces partitioned by event day.

    ``repartition(day, id)`` before ``partitionBy(day)`` bounds the files
    per partition (otherwise every task writes to every day it touches —
    the classic small-files explosion).
    """
    with_day = linked.withColumn(
        "day", ((F.col("start_at_ms") / _DAY_MS).cast("long") * _DAY_MS)
    )
    (
        with_day.repartition(files_per_day, "day", "id")
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(path)
    )


def read_linked_day(spark: SparkSession, path: str, day_ms: int) -> DataFrame:
    """Read one day's partition — the filter prunes at the directory level
    (visible as PartitionFilters in explain)."""
    return spark.read.parquet(path).where(F.col("day") == day_ms)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, sort: bool = True) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.

    Bucketing is the co-located-join tool: two tables bucketed the same way
    on the join key sort-merge-join WITHOUT a shuffle exchange on either
    side (and without the per-query sort when ``sort=True``) — the shuffle
    is paid once at write time instead of on every downstream join.  At
    100 TB this turns the repeated id-keyed joins (linked ⋈ edges, span ⋈
    enrichment) into scan+merge.  ``tests/test_bucketed_join.py`` asserts
    the exchange-free plan.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)
