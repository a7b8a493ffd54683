from __future__ import annotations

from simpy__kafka__flink__kafka_spark.plans.sql_api import register_views


def test_sql_surface(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM messages").collect()[0].n
    assert n == 1000
    linked = spark.sql(
        "SELECT count(*) AS n FROM linked_traces WHERE size(parents) > 0"
    ).collect()[0].n
    edges = spark.sql(
        """SELECT count(*) AS n FROM messages p JOIN messages c
           ON p.dst_ip = c.src_ip AND p.start_at_ms <= c.start_at_ms
           AND p.end_at_ms >= c.end_at_ms AND p.id <> c.id"""
    ).collect()[0].n
    assert (linked > 0) == (edges > 0)
    # relational tables queryable too
    assert spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n > 0
