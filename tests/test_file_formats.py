"""File-format source/sink breadth: the span schema round-trips through
CSV and JSON (schema-enforced reads, no inference)."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.schemas import MSG_SCHEMA, golden_messages

ROWS = [
    ("a", "10.0.0.1", "10.0.0.2", 1000, 500.0, 1500),
    ("b", "10.0.0.2", "10.0.0.3", 1100, 200.0, 1300),
]


def _assert_same(df, spark):
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(ROWS)
    assert got == want


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "csv")
    golden_messages(spark, ROWS).write.option("header", "true").csv(p)
    back = spark.read.schema(MSG_SCHEMA).option("header", "true").csv(p)
    _assert_same(back, spark)


def test_json_roundtrip_files(spark, tmp_path):
    p = str(tmp_path / "json")
    golden_messages(spark, ROWS).write.json(p)
    back = spark.read.schema(MSG_SCHEMA).json(p)
    _assert_same(back, spark)


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "orc")
    golden_messages(spark, ROWS).write.orc(p)
    back = spark.read.orc(p)
    _assert_same(back, spark)
