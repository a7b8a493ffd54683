"""Round-11 extension operators: rolling z-score anomaly detection
(operators/timeseries.py:rolling_zscore_anomalies) and per-host
reputation scoring (functions/crawl.py:host_reputation)."""

from __future__ import annotations

import pytest


def test_rolling_zscore_flags_burst_and_respects_history(spark):
    from simpy__kafka__flink__kafka_spark.operators.timeseries import (
        rolling_zscore_anomalies)

    # key 1: 10 calm buckets (1 event each), then a 50-event burst;
    # key 2: constant rate — never anomalous
    g = 1000
    rows = []
    for b in range(10):
        rows.append((1, b * g))
        rows.append((2, b * g))
    rows += [(1, 10 * g)] * 50
    rows.append((2, 10 * g))
    ev = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {(r.user_id, r.bucket_ts): (r.n_events, r.n_hist, r.is_anomaly)
           for r in rolling_zscore_anomalies(
               ev, grid_ms=g, window=24, min_history=8,
               z_threshold=3).collect()}
    # buckets before min_history prior observations emit nothing
    assert (1, 0) not in out and (1, 7 * g) not in out
    # calm bucket with enough history: zero variance, zero deviation
    assert out[(1, 9 * g)] == (1, 9, 0)
    # the burst: history mean 1, x=50 -> flagged
    assert out[(1, 10 * g)] == (50, 10, 1)
    assert out[(2, 10 * g)][2] == 0


def test_rolling_zscore_integer_z2(spark):
    """z2_scaled is the division-free integer form of z^2 * 1e4:
    history [1]*8, x=5 -> mean 1, pop var 0 -> den clamps to 1 and
    z2 = (x*n - s)^2 * 1e4; with var > 0 the exact ratio divides."""
    from simpy__kafka__flink__kafka_spark.operators.timeseries import (
        rolling_zscore_anomalies)

    g = 10
    rows = [(1, b * g) for b in range(8)] + [(1, 8 * g)] * 5
    ev = spark.createDataFrame(rows, "user_id long, ts_ms long")
    out = {r.bucket_ts: (r.z2_scaled, r.is_anomaly)
           for r in rolling_zscore_anomalies(
               ev, grid_ms=g, window=24, min_history=8).collect()}
    # x=5, n=8, s=8, q=8: num=32, den=0 -> z2 = 32^2*1e4 // 1
    assert out[8 * g] == (32 * 32 * 10000, 1)


def test_streaming_anomaly_batch_parity(spark, tmp_path):
    """Event batches through the streaming detector (finalized-window
    fold + persisted history) must score exactly like the all-at-once
    batch operator — including buckets whose history spans batches."""
    import datetime as _dt
    import os

    from simpy__kafka__flink__kafka_spark.operators.timeseries import (
        rolling_zscore_anomalies)
    from simpy__kafka__flink__kafka_spark.streaming.windows import (
        start_anomaly_detection)

    def ts(h: int) -> _dt.datetime:
        return _dt.datetime.fromtimestamp(
            3600 * h + 1, tz=_dt.timezone.utc).replace(tzinfo=None)

    # key 1: calm then burst; key 2: constant.  The flush row at hour
    # 99 advances the watermark past every scored bucket.
    rows = []
    for h in range(10):
        rows.append((1, ts(h)))
        rows.append((2, ts(h)))
    rows += [(1, ts(10))] * 40
    rows.append((2, ts(10)))
    flush = [(999, ts(99))]

    ind = str(tmp_path / "ev_in")
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ck")
    os.makedirs(ind, exist_ok=True)

    def run(batch_rows):
        spark.createDataFrame(batch_rows, "user_id long, ts timestamp") \
            .coalesce(1).write.mode("append").parquet(ind)
        stream = (spark.readStream.schema("user_id long, ts timestamp")
                  .parquet(ind).withWatermark("ts", "0 seconds"))
        q = start_anomaly_detection(stream, out, ckpt, grid="1 hour",
                                    window=24, min_history=8)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(rows[:12])              # first hours finalize nothing yet
    run(rows[12:] + flush)      # the rest + flush past the burst

    got = {(r.user_id, r.bucket_ts): (r.n_events, r.n_hist, r.is_anomaly)
           for r in spark.read.parquet(out).collect()
           if r.n_hist is not None and r.user_id != 999}
    ev = spark.createDataFrame(
        [(u, int(t.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000))
         for u, t in rows], "user_id long, ts_ms long")
    want = {(r.user_id, r.bucket_ts): (r.n_events, r.n_hist, r.is_anomaly)
            for r in rolling_zscore_anomalies(
                ev, grid_ms=3_600_000, window=24,
                min_history=8).collect()}
    assert got == want
    assert any(f[2] == 1 for f in got.values())   # the burst is flagged


def test_host_reputation_arithmetic(spark):
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        host_reputation)
    from simpy__kafka__flink__kafka_spark.functions.text import (
        quality_score)
    from pyspark.sql import functions as F

    good = ("a long and useful sentence with many plain words that "
            "clears the quality bar easily, and then some.")
    rows = [("h1", good), ("h1", good), ("h1", good + " unique tail"),
            ("h2", good)]
    docs = spark.createDataFrame(rows, "host string, text string")
    got = {r.host: r for r in host_reputation(docs).collect()}
    q_ppm = int(spark.createDataFrame([(good,)], "text string")
                .select(F.floor(quality_score("text") * 1_000_000
                                + F.lit(0.5)).cast("long"))
                .collect()[0][0])
    h1 = got["h1"]
    assert (h1.n_docs, h1.n_unique) == (3, 2)
    assert h1.dup_rate_ppm == 1 * 1_000_000 // 3
    # reputation discounts mean quality by the duplicate rate
    assert h1.reputation_ppm == (h1.mean_quality_ppm
                                 * (1_000_000 - h1.dup_rate_ppm)
                                 // 1_000_000)
    h2 = got["h2"]
    assert (h2.n_docs, h2.dup_rate_ppm) == (1, 0)
    assert h2.mean_quality_ppm == q_ppm
    assert h2.reputation_ppm == q_ppm


def test_score_bucket_counts_window_bound_validated(spark):
    """ADVICE r11: the saturation cap derives from (window, z) instead
    of assuming window <= 24 — a window the int64 algebra cannot carry
    raises instead of silently wrapping, and a large-but-legal window
    scores with a tighter cap."""
    from simpy__kafka__flink__kafka_spark.operators.timeseries import (
        score_bucket_counts)

    counts = spark.createDataFrame(
        [("k", t * 1000, 5) for t in range(40)],
        "user_id string, bucket_ts long, x long")
    with pytest.raises(ValueError, match="window must be >= 1"):
        score_bucket_counts(counts, window=0)
    with pytest.raises(ValueError, match="headroom"):
        score_bucket_counts(counts, window=40_000_000)
    # window > 24 now legal: derived cap ~ 3.03e7 // 1000 >> any count
    # here, so a flat series still scores anomaly-free
    out = score_bucket_counts(counts, window=1000, min_history=8)
    assert out.count() == 32
    assert out.where("is_anomaly = 1").count() == 0


def test_z_cap_parity_for_non_default_window(spark):
    """Round-12 review fix: the SQL rendering's saturation cap must
    come from the SAME derivation as the Spark engine's — with
    window=100 the derived cap (~303k) is below 2^20, and counts in
    between would saturate differently under an independently-defaulted
    SQL cap, flipping z2/is_anomaly between the engines."""
    import duckdb
    import pandas as pd

    from simpy__kafka__flink__kafka_spark.operators.timeseries import (
        derive_count_cap, score_bucket_counts)
    from simpy__kafka__flink__kafka_spark.plans.relational import (
        z_anomaly_select)

    window = 100
    cap = derive_count_cap(window, 3)
    assert cap < 1 << 20
    big = cap + 50_000                 # saturates at `cap`, not 2^20
    rows = [("k", t * 1000, 1 if t < 30 else big) for t in range(40)]
    sdf = spark.createDataFrame(rows,
                                "user_id string, bucket_ts long, x long")
    got = (score_bucket_counts(sdf, window=window, min_history=8)
           .toPandas().sort_values("bucket_ts").reset_index(drop=True))
    con = duckdb.connect()
    con.register("c", pd.DataFrame(rows,
                                   columns=["user_id", "bucket_ts", "x"]))
    ora = (con.execute(z_anomaly_select("c", "user_id", window=window))
           .df().sort_values("bucket_ts").reset_index(drop=True))
    for col in ("n_events", "n_hist", "z2_scaled", "is_anomaly"):
        assert list(got[col].astype("int64")) == \
            list(ora[col].astype("int64")), col
