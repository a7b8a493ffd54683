"""Engine-drift guard for ``read_events`` (VERDICT r03 task #2).

The driver testdata stores ``events.ts`` as parquet TIMESTAMP(NANOS); how
that column surfaces depends on the Spark version (Spark 3.x + nanosAsLong
→ LONG epoch-nanos; Spark 4.x → TIMESTAMP_NTZ truncated to micros).  This
test writes the same two instants as LONG, TIMESTAMP(MICROS) and
TIMESTAMP(NANOS) fixtures and asserts ``read_events`` normalizes all three
to identical ``ts_ms``.  It fails against the pre-round-4 reader, which
hardcoded the LONG branch (round 3 lost 19 gate rows to exactly that).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from simpy__kafka__flink__kafka_spark.sources.tables import read_events

# Two instants with sub-millisecond detail so truncation order matters.
NANOS = [1_704_067_200_123_456_789, 1_704_067_201_987_654_321]
EXPECT_MS = [n // 1_000_000 for n in NANOS]

BASE = {
    "event_id": pa.array([1, 2], pa.int64()),
    "user_id": pa.array([10, 20], pa.int64()),
    "event_type": pa.array(["click", "view"]),
    "value": pa.array([1.0, 2.0], pa.float64()),
    "props": pa.array(["{}", "{}"]),
}


def _write_events(tmp_path, name: str, ts: pa.Array) -> str:
    d = tmp_path / name
    d.mkdir()
    cols = dict(BASE)
    cols["ts"] = ts
    # version=2.6 keeps TIMESTAMP(NANOS) as nanos instead of coercing to us
    pq.write_table(pa.table(cols), str(d / "events.parquet"), version="2.6")
    return str(d)


@pytest.mark.parametrize(
    "name,ts",
    [
        ("long_nanos", pa.array(NANOS, pa.int64())),
        ("ts_micros", pa.array([n // 1_000 for n in NANOS], pa.timestamp("us"))),
        ("ts_nanos", pa.array(NANOS, pa.timestamp("ns"))),
    ],
)
def test_read_events_ts_ms_invariant(spark, tmp_path, name, ts):
    sf_dir = _write_events(tmp_path, name, ts)
    got = [
        r.ts_ms
        for r in read_events(spark, sf_dir).orderBy("event_id").collect()
    ]
    assert got == EXPECT_MS


def test_driver_testdata_matches_duckdb_epoch_ms(spark, sf_dir):
    """End-to-end: the real testdata file agrees with DuckDB's epoch_ms."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    oracle = [
        r[0]
        for r in con.execute(
            f"select epoch_ms(ts) from '{sf_dir}/events.parquet' "
            "order by event_id limit 100"
        ).fetchall()
    ]
    got = [
        r.ts_ms
        for r in read_events(spark, sf_dir)
        .orderBy("event_id")
        .limit(100)
        .collect()
    ]
    assert got == oracle
