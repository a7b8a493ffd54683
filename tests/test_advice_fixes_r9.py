"""Regression tests for the round-8 ADVICE findings fixed in round 9:

1. streaming/corpus.py incremental_ingest_batch appended the PROFILE
   before the DOCS; a crash between the two writes meant replay saw the
   half-committed profile, classified its own docs exact_known, and
   silently dropped them forever.  Docs now land first: the torn window
   produces a duplicate-docs anomaly (recoverable, at-least-once) that
   the replay's profile append heals for all future batches.
2. operators/timeseries.py gap_fill ordered windows by (t, kind) only;
   two events for one key at the same timestamp made pv/nv engine- and
   partition-order-dependent.  Windows (and the DuckDB oracle) now
   tiebreak on v.
3. cachepin pin()/unpin_all() raced (no lock) and grew _PINNED without
   bound when library functions pin outside the queries() wrapper.  Now
   lock-guarded and capped at MAX_PINNED with oldest-evicted-unpersist.
4. plans/dataprep.py _synth_messy_urls derived the variant via float
   division (double-lossy above 2^53); now integer `div` matching the
   oracle's // exactly.
"""

from __future__ import annotations

import threading

import duckdb
import pytest
from pyspark.sql import functions as F

# --- 1. torn-window write order -------------------------------------------


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_ingest_docs_written_before_profile(spark, tmp_path):
    """Simulate the torn window under the NEW order (docs landed, profile
    append crashed): replay must re-admit — duplicate docs, zero loss —
    and the healed profile must reject the docs in later batches."""
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        incremental_ingest_batch)

    prior_dir = str(tmp_path / "prior")
    acc = str(tmp_path / "accepted")
    snapshot_profile(_mk_docs(spark, [
        (1, "known document one about spark shuffles and joins"),
    ])).write.parquet(prior_dir)

    batch = _mk_docs(spark, [
        (1, "known document one about spark shuffles and joins"),  # prior
        (10, "a genuinely fresh document about watermarks"),
        (11, "another fresh document about catalyst pushdown"),
    ])
    incremental_ingest_batch(batch, prior_dir, acc)
    docs0 = {r.doc_id for r in spark.read.parquet(f"{acc}/docs").collect()}
    assert docs0 == {10, 11}

    # torn window: docs committed, profile append crashed before landing
    import shutil
    shutil.rmtree(f"{acc}/profile")

    # checkpoint replay of the SAME batch
    incremental_ingest_batch(batch, prior_dir, acc)
    replayed = spark.read.parquet(f"{acc}/docs")
    # duplicate-docs anomaly, NOT loss: both docs present (twice)
    counts = {r.doc_id: r.n for r in
              replayed.groupBy("doc_id").agg(F.count("*").alias("n"))
              .collect()}
    assert counts == {10: 2, 11: 2}
    # the replay healed the profile: a later batch re-offering the same
    # content admits nothing new
    incremental_ingest_batch(batch, prior_dir, acc)
    assert spark.read.parquet(f"{acc}/docs").count() == 4
    prof = spark.read.parquet(f"{acc}/profile")
    assert {r.prior_id for r in prof.select("prior_id").collect()} == {10, 11}


# --- 2. gap_fill same-timestamp determinism --------------------------------

_TIE_SQL = """
WITH e AS (SELECT user_id, t, CAST(floor(value * 1000000) AS BIGINT) AS v
           FROM ties),
b AS (SELECT user_id, min(t) AS t0, max(t) AS t1 FROM e GROUP BY 1),
g AS (
  SELECT user_id,
         unnest(generate_series(((t0 + 999) // 1000) * 1000,
                                (t1 // 1000) * 1000, 1000)) AS t
  FROM b
  WHERE ((t0 + 999) // 1000) * 1000 <= (t1 // 1000) * 1000
),
pts AS (
  SELECT user_id, t, 0 AS kind, v FROM e
  UNION ALL SELECT user_id, t, 1, NULL FROM g
),
wnd AS (
  SELECT user_id, t, kind,
         last_value(v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN kind = 0 THEN t END IGNORE NULLS)
           OVER wp AS pt,
         first_value(v IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN kind = 0 THEN t END IGNORE NULLS)
           OVER wn AS nt
  FROM pts
  WINDOW wp AS (PARTITION BY user_id ORDER BY t, kind, v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY t, kind, v
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, t AS grid_ts, CAST(pv AS BIGINT) AS locf_scaled,
       CAST(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
                 THEN pv + ((nv - pv) * (t - pt)) // (nt - pt)
                 ELSE COALESCE(pv, nv) END AS BIGINT) AS interp_scaled
FROM wnd WHERE kind = 1
"""


def test_gap_fill_same_timestamp_ties_match_duckdb(spark):
    """Two events for one key at the SAME timestamp with different
    values: pv/nv must be identical across engines (v tiebreak)."""
    from simpy__kafka__flink__kafka_spark.operators.timeseries import (
        gap_fill)

    rows = [
        (7, 500, 3.0), (7, 500, 1.0),        # the tie — order shuffled
        (7, 2400, 9.0), (7, 2400, 5.0),      # second tie, reversed
        (7, 4100, 2.0),
        (8, 100, 4.0), (8, 100, 4.0),        # identical-value tie
        (8, 3100, 8.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_ms long, value double")
    got = sorted(
        tuple(r) for r in gap_fill(
            ev, grid_ms=1000, ts_col="ts_ms").collect())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ties(user_id BIGINT, t BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO ties VALUES (?, ?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(_TIE_SQL).fetchall())
    assert got == want
    # and the tie semantics are what the tiebreak promises: at t=1000
    # LOCF carries the LARGER of the two t=500 values (last in v order)
    locf_1000 = dict(((u, t), l) for u, t, l, _ in got)[(7, 1000)]
    assert locf_1000 == 3_000_000


# --- 3. cachepin cap + thread-safety ---------------------------------------


def test_cachepin_cap_evicts_oldest(spark):
    from simpy__kafka__flink__kafka_spark import cachepin

    cachepin.unpin_all()
    frames = [spark.range(i + 1, numPartitions=1)
              for i in range(cachepin.MAX_PINNED + 3)]
    for f in frames:
        cachepin.pin(f)
    assert len(cachepin._PINNED) == cachepin.MAX_PINNED
    # the three oldest were evicted AND unpersisted
    for f in frames[:3]:
        assert not f.storageLevel.useMemory
    assert frames[-1].storageLevel.useMemory
    cachepin.unpin_all()
    assert not frames[-1].storageLevel.useMemory
    assert cachepin._PINNED == []


def test_cachepin_concurrent_pin_unpin(spark):
    from simpy__kafka__flink__kafka_spark import cachepin

    cachepin.unpin_all()
    errors: list[Exception] = []

    def pinner():
        try:
            for i in range(40):
                cachepin.pin(spark.range(i + 1, numPartitions=1))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def unpinner():
        try:
            for _ in range(40):
                cachepin.unpin_all()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=pinner) for _ in range(3)] + [
        threading.Thread(target=unpinner) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    cachepin.unpin_all()
    assert cachepin._PINNED == []


# --- 4. integer-division URL variant ---------------------------------------


def test_synth_messy_urls_integer_division_above_2_53(spark):
    """doc_id above 2^53: float division would round the page number and
    pick a different variant than the oracle's integer //."""
    from simpy__kafka__flink__kafka_spark.plans.dataprep import (
        _synth_messy_urls)

    big = (1 << 53) + 3  # not representable after /100 in a double
    docs = spark.createDataFrame([(big,), (big + 1,)], "doc_id long")
    got = {r.doc_id: r.url for r in _synth_messy_urls(docs).collect()}
    # python // is the oracle's semantics
    for did, url in got.items():
        v = (did // 100) % 5
        # variant 0 is the only one starting uppercase-scheme
        starts_upper = url.startswith("HTTP://")
        assert starts_upper == (v == 0), (did, v, url)
