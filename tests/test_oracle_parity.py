"""Run every declared query against its DuckDB oracle at sf0.001 — a local,
fast mimic of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from simpy__kafka__flink__kafka_spark.plans import registry
from tests.oracle_utils import assert_match

REG = registry()
WITH_ORACLE = sorted(name for name, q in REG.items() if q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = REG[name]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir, name)


def test_all_queries_return_rows(spark, sf_dir):
    for name, q in REG.items():
        n = q.build(spark, sf_dir).limit(1).count()
        assert n >= 0, name


def test_checked_queries_are_nonempty(spark, sf_dir):
    """Every gate row must return AT LEAST one row at the smallest SF:
    a hash-green EMPTY result (e.g. a fixture-domain drift degrading an
    inner join to zero rows on BOTH engines) is a gate row that has
    silently stopped checking anything."""
    from simpy__kafka__flink__kafka_spark.plans import CHECKED_FIRST

    for name in CHECKED_FIRST:
        n = REG[name].build(spark, sf_dir).limit(1).count()
        assert n >= 1, f"checked-50 row {name} returned 0 rows"
