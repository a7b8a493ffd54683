"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship trace-linking query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every declared operator from
SURVEY.md §2 plus the training-data extension operators, backed by
``simpy__kafka__flink__kafka_spark.plans``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from simpy__kafka__flink__kafka_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry()["link_traces"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Each builder is wrapped to drop the PREVIOUS query's pinned caches
    before building: several plan builders cache shared subtrees (shingle
    scans, LSH candidate frames) that a lazy registry consumer has no
    hook to unpersist after collecting, so a long sequential drive (the
    driver's 50-query gate) would otherwise accumulate pinned partitions
    across queries.  Builders pin via ``cachepin.pin``, and the wrapper
    unpersists exactly those tracked frames (``unpin_all``) — consumer-
    owned caches and still-pending earlier results are untouched (the
    former ``clearCache()`` dropped everything in the session).  Clearing
    at the NEXT build keeps accumulation bounded to one query's working
    set.  bench.py manages its own cache lifecycle and calls
    ``registry()`` directly, bypassing this."""

    from simpy__kafka__flink__kafka_spark.cachepin import unpin_all

    def wrap(build: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            unpin_all()
            return build(spark, sf_dir)

        return run

    return {name: wrap(q.build) for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
