"""SQL API surface: register the testdata tables, the span view, and the
linked-trace output as temp views so the whole engine is usable from
``spark.sql`` — Catalyst compiles either API to the same plans.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.linking import link_traces
from ..schemas import messages_from_events
from ..sources.tables import read_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """After this, e.g.:

    >>> spark.sql("SELECT id, children FROM linked_traces WHERE size(children) > 1")
    >>> spark.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1")
    """
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
    msgs = messages_from_events(spark, sf_dir)
    msgs.createOrReplaceTempView("messages")
    link_traces(msgs).createOrReplaceTempView("linked_traces")
