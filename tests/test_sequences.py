"""Scale-safe sequence operators (operators/sequences.py) must agree exactly
with their unpartitioned-window twins, at multiple partition counts (boundary
placement must not leak into the output)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from simpy__kafka__flink__kafka_spark.operators.sequences import (
    ranged_prefix_max, ranged_prefix_sum, ranged_row_number)
from simpy__kafka__flink__kafka_spark.schemas import messages_from_events
from simpy__kafka__flink__kafka_spark.sources.tables import read_events


@pytest.mark.parametrize("n_parts", [3, 32])
def test_ranged_row_number_matches_global_window(spark, sf_dir, n_parts):
    ev = read_events(spark, sf_dir).select("event_id")
    got = ranged_row_number(ev, ["event_id"], out_col="seq", n_parts=n_parts)
    want = ev.select(
        "event_id", F.row_number().over(W.orderBy("event_id")).alias("seq")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.parametrize("n_parts", [3, 32])
def test_ranged_prefix_max_matches_global_window(spark, sf_dir, n_parts):
    msgs = messages_from_events(spark, sf_dir).select("id", "start_at_ms")
    got = ranged_prefix_max(
        msgs, ["start_at_ms", "id"], "start_at_ms", out_col="m", n_parts=n_parts
    ).select("id", "m")
    w = W.orderBy("start_at_ms", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = msgs.select("id", F.max("start_at_ms").over(w).alias("m"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.parametrize("n_parts,exclusive", [(3, False), (32, False),
                                               (5, True), (32, True)])
def test_ranged_prefix_sum_matches_global_window(spark, sf_dir, n_parts,
                                                 exclusive):
    msgs = messages_from_events(spark, sf_dir).select(
        "id", F.col("latency_msec").cast("long").alias("v")
    )
    got = ranged_prefix_sum(
        msgs, ["id"], "v", out_col="s", n_parts=n_parts, exclusive=exclusive
    ).select("id", "s")
    end = -1 if exclusive else W.currentRow
    w = W.orderBy("id").rowsBetween(W.unboundedPreceding, end)
    want = msgs.select(
        "id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("s")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ranged_prefix_max_exclusive(spark, sf_dir):
    msgs = messages_from_events(spark, sf_dir).select("id", "start_at_ms")
    got = ranged_prefix_max(
        msgs, ["id"], "start_at_ms", out_col="m", exclusive=True, n_parts=5
    ).select("id", "m")
    w = W.orderBy("id").rowsBetween(W.unboundedPreceding, -1)
    want = msgs.select("id", F.max("start_at_ms").over(w).alias("m"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
