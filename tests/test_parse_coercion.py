"""Garbage-string numeric coercion parity with the reference's ``_to_int``
(``flink-jobs/simpy_kafka_reader.py:42-53``): ``int(float(x))`` with a
0-default — ``"3.7"`` -> 3, ``"-3.7"`` -> -3, ``"abc"``/absent -> 0 — and
the Spark expression must agree with the DuckDB oracle expression on the
same dirty rows."""

from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.plans.trace import coerce_int_lenient

DIRTY = [
    ("e1", json.dumps({"k": "3.7"})),
    ("e2", json.dumps({"k": "-3.7"})),
    ("e3", json.dumps({"k": "7"})),
    ("e4", json.dumps({"k": 12})),
    ("e5", json.dumps({"k": "abc"})),
    ("e6", json.dumps({})),
    ("e7", None),
    ("e8", json.dumps({"k": "1e2"})),
    ("e9", json.dumps({"k": "0.999"})),
    # non-finite: reference int(float(x)) raises (Overflow/ValueError) -> 0;
    # unguarded Spark Infinity->long saturates to Long.MaxValue, unguarded
    # DuckDB CAST errors the whole query
    ("e10", json.dumps({"k": "inf"})),
    ("e11", json.dumps({"k": "-inf"})),
    ("e12", json.dumps({"k": "nan"})),
]

# reference semantics, computed by the reference's own expression
def _to_int_ref(props: str | None):
    try:
        return int(float(json.loads(props)["k"]))
    except Exception:
        return 0


EXPECTED = {eid: _to_int_ref(props) for eid, props in DIRTY}


@pytest.fixture(scope="module")
def dirty_path(tmp_path_factory):
    import pandas as pd

    path = tmp_path_factory.mktemp("dirty") / "dirty.parquet"
    pd.DataFrame(DIRTY, columns=["event_id", "props"]).to_parquet(path)
    return str(path)


def test_spark_coercion_matches_reference(spark, dirty_path):
    df = spark.read.parquet(dirty_path).select(
        "event_id", coerce_int_lenient(F.get_json_object("props", "$.k")).alias("k")
    )
    got = {r["event_id"]: r["k"] for r in df.collect()}
    assert got == EXPECTED


def test_duckdb_oracle_expression_matches_reference(dirty_path):
    rows = duckdb.sql(
        f"""
        WITH d AS (
          SELECT event_id,
                 COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE),
                          0.0) AS kd
          FROM read_parquet('{dirty_path}')
        )
        SELECT event_id,
               CAST(trunc(CASE WHEN isfinite(kd) THEN kd ELSE 0.0 END)
                    AS BIGINT) AS k
        FROM d
        """
    ).fetchall()
    assert {eid: k for eid, k in rows} == EXPECTED
