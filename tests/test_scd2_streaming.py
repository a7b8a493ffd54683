"""Streaming SCD2 maintenance (streaming/corpus.py:scd2_apply /
start_scd2_maintenance): the incremental merge must reproduce the batch
operator (functions/crawl.py:scd2_history) exactly when snapshots are
folded in one at a time, survive checkpoint replays (idempotence
guard), and run end-to-end as a foreachBatch stream."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.functions.crawl import scd2_history
from simpy__kafka__flink__kafka_spark.streaming.corpus import (
    scd2_apply, scd2_update_batch, start_scd2_maintenance)

# 6 keys x 4 snapshots covering: change-at-every-boundary, change once
# mid-window, never-changes, appears late (no row in early snaps),
# disappears (no row in late snaps), and a crawl gap (missing snap 1)
_OBS = []
for snap in range(4):
    for k in range(6):
        if k == 3 and snap == 0:
            continue  # appears at snap 1
        if k == 4 and snap == 3:
            continue  # not observed in the last snap
        if k == 5 and snap == 1:
            continue  # gap: run must span it
        if k == 0:
            text = f"doc0 rev{snap}"          # changes every snapshot
        elif k == 1:
            text = "doc1 rev" + ("0" if snap < 2 else "1")
        else:
            text = f"doc{k} stable"
        _OBS.append((f"https://ex.com/{k}", snap, text))


def _obs_df(spark, snaps):
    rows = [r for r in _OBS if r[1] in snaps]
    return spark.createDataFrame(
        rows, "url string, snap_id long, text string")


def _canon(df):
    return sorted(
        tuple(r) for r in
        df.select("url", "fingerprint", "version", "valid_from",
                  "valid_to", "last_seen", "n_snaps", "is_current")
        .collect())


def test_scd2_apply_fold_matches_batch(spark):
    """Folding the 4 snapshots through scd2_apply one at a time must
    equal the all-at-once batch operator row for row."""
    want = _canon(scd2_history(_obs_df(spark, {0, 1, 2, 3})))
    hist = None
    for snap in range(4):
        hist = scd2_apply(hist, _obs_df(spark, {snap}))
    assert _canon(hist) == want


def test_scd2_apply_multi_snapshot_batch(spark):
    """A single micro-batch carrying TWO snapshots (a catch-up burst)
    merges both in snap order."""
    want = _canon(scd2_history(_obs_df(spark, {0, 1, 2, 3})))
    hist = scd2_apply(None, _obs_df(spark, {0}))
    hist = scd2_apply(hist, _obs_df(spark, {1, 2}))
    hist = scd2_apply(hist, _obs_df(spark, {3}))
    assert _canon(hist) == want


def test_scd2_apply_replay_idempotent(spark):
    """Re-applying the last batch (checkpoint replay after a crash)
    must leave the history byte-identical — the snap <= last_seen
    guard."""
    hist = scd2_apply(None, _obs_df(spark, {0, 1, 2}))
    once = scd2_apply(hist, _obs_df(spark, {3}))
    twice = scd2_apply(once, _obs_df(spark, {3}))
    assert _canon(twice) == _canon(once)
    # and a full-history replay is equally a no-op
    full_replay = scd2_apply(twice, _obs_df(spark, {0, 1, 2, 3}))
    assert _canon(full_replay) == _canon(once)


def test_scd2_update_batch_persists_and_swaps(spark, tmp_path):
    hist_dir = str(tmp_path / "history")
    scd2_update_batch(_obs_df(spark, {0, 1}), hist_dir)
    scd2_update_batch(_obs_df(spark, {2, 3}), hist_dir)
    got = _canon(spark.read.parquet(hist_dir))
    assert got == _canon(scd2_history(_obs_df(spark, {0, 1, 2, 3})))
    # replayed persisted batch: unchanged
    scd2_update_batch(_obs_df(spark, {2, 3}), hist_dir)
    assert _canon(spark.read.parquet(hist_dir)) == got


def test_scd2_stream_end_to_end(spark, tmp_path):
    """File-source stream -> start_scd2_maintenance: two snapshot
    waves land as files; the persisted history must match the batch
    operator over everything observed."""
    src = tmp_path / "src"
    src.mkdir()
    hist_dir = str(tmp_path / "history")
    ckpt = str(tmp_path / "ckpt")

    _obs_df(spark, {0, 1}).coalesce(1).write.parquet(str(src / "w0"))
    stream = (spark.readStream
              .schema("url string, snap_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src) + "/*"))
    q = start_scd2_maintenance(stream, hist_dir, ckpt)
    try:
        q.processAllAvailable()
        _obs_df(spark, {2, 3}).coalesce(1).write.parquet(str(src / "w1"))
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                if _canon(spark.read.parquet(hist_dir)) == _canon(
                        scd2_history(_obs_df(spark, {0, 1, 2, 3}))):
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    got = _canon(spark.read.parquet(hist_dir))
    assert got == _canon(scd2_history(_obs_df(spark, {0, 1, 2, 3})))


def test_scd2_stream_restart_resumes(spark, tmp_path):
    """Kill the stream after wave 0, restart on the same checkpoint,
    deliver wave 1: the resumed query must complete the history (and
    any replayed batch is absorbed by the idempotence guard)."""
    src = tmp_path / "src"
    src.mkdir()
    hist_dir = str(tmp_path / "history")
    ckpt = str(tmp_path / "ckpt")

    def _start():
        stream = (spark.readStream
                  .schema("url string, snap_id long, text string")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(src) + "/*"))
        return start_scd2_maintenance(stream, hist_dir, ckpt)

    _obs_df(spark, {0}).coalesce(1).write.parquet(str(src / "w0"))
    q = _start()
    q.processAllAvailable()
    q.stop()

    _obs_df(spark, {1, 2, 3}).coalesce(1).write.parquet(str(src / "w1"))
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _canon(spark.read.parquet(hist_dir))
    assert got == _canon(scd2_history(_obs_df(spark, {0, 1, 2, 3})))
