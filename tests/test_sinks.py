from __future__ import annotations

from simpy__kafka__flink__kafka_spark.operators.linking import link_traces
from simpy__kafka__flink__kafka_spark.schemas import golden_messages
from simpy__kafka__flink__kafka_spark.sources.sinks import (read_linked_day,
                                                            write_linked_partitioned)

_DAY = 86_400_000


def _multi_day_spans():
    rows = []
    for day in range(3):
        t0 = day * _DAY + 1000
        rows += [
            (f"d{day}_p", "10.0.0.1", "10.0.0.2", t0, 500.0, t0 + 500),
            (f"d{day}_c", "10.0.0.2", "10.0.0.3", t0 + 100, 200.0, t0 + 300),
        ]
    return rows


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    linked = link_traces(golden_messages(spark, _multi_day_spans()))
    out = str(tmp_path / "linked")
    write_linked_partitioned(linked, out)

    full = spark.read.parquet(out)
    assert full.count() == 6
    assert full.select("day").distinct().count() == 3

    day1 = read_linked_day(spark, out, _DAY)
    got = {r.id for r in day1.collect()}
    assert got == {"d1_p", "d1_c"}
    # partition pruning reaches the physical scan
    plan = day1._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
