"""Bucketed tables must co-locate joins: same-bucketed tables joined on the
bucket key produce a plan with NO shuffle exchange on either side — the
write-once-shuffle-never pattern the 100 TB design leans on."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.schemas import messages_from_events
from simpy__kafka__flink__kafka_spark.sources.sinks import write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"spans_bkt_{suffix}", f"lat_bkt_{suffix}"
    msgs = messages_from_events(spark, sf_dir)
    write_bucketed(msgs.select("id", "src_ip", "start_at_ms"), ta, "id", 8)
    write_bucketed(
        msgs.select("id", "latency_msec"), tb, "id", 8
    )
    # at test scale Spark would broadcast (hiding the bucketing entirely);
    # disable it so the plan shows what happens when both sides are big —
    # the exact regime bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ta).join(spark.table(tb), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result is the real join
        assert joined.count() == msgs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_bucketed_aggregation_skips_shuffle(spark, sf_dir):
    """groupBy on the bucket key also reuses the bucketing (no Exchange
    before the final aggregate)."""
    suffix = uuid.uuid4().hex[:8]
    t = f"spans_agg_bkt_{suffix}"
    msgs = messages_from_events(spark, sf_dir)
    write_bucketed(msgs.select("id", "latency_msec"), t, "id", 8)
    try:
        agg = spark.table(t).groupBy("id").agg(F.sum("latency_msec"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
