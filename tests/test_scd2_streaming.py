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


def test_scd2_torn_swap_recovers_from_side_dir(spark, tmp_path):
    """Crash window between rmtree(history) and rename(.next): the next
    batch must restore the complete side dir instead of silently
    restarting history from one batch."""
    import shutil

    hist_dir = str(tmp_path / "history")
    scd2_update_batch(_obs_df(spark, {0, 1}), hist_dir)
    scd2_update_batch(_obs_df(spark, {2}), hist_dir)
    # simulate the torn swap: the new history made it to .next, the
    # rename never happened
    shutil.move(hist_dir, hist_dir + ".next")
    scd2_update_batch(_obs_df(spark, {3}), hist_dir)
    got = _canon(spark.read.parquet(hist_dir))
    assert got == _canon(scd2_history(_obs_df(spark, {0, 1, 2, 3})))


def test_scd2_partial_first_batch_side_dir_not_recovered(spark,
                                                         tmp_path):
    """Crash DURING the very first batch's side-dir write leaves a
    partial .next (staging _temporary still present, no _SUCCESS) and
    no history at all: the replay must ignore the partial dir (no
    rename) and rebuild from scratch."""
    import os

    hist_dir = str(tmp_path / "history")
    tmp = hist_dir + ".next"
    os.makedirs(os.path.join(tmp, "_temporary"))
    with open(os.path.join(tmp, "part-00000.parquet"), "wb") as f:
        f.write(b"partial garbage")
    scd2_update_batch(_obs_df(spark, {0, 1}), hist_dir)
    got = _canon(spark.read.parquet(hist_dir))
    assert got == _canon(scd2_history(_obs_df(spark, {0, 1})))


def test_scd2_torn_swap_recovers_without_success_marker(spark,
                                                        tmp_path):
    """Deployments disabling marksuccessfuljobs have no _SUCCESS file;
    a committed side dir (part files present, _temporary gone) must
    still be recovered after a torn swap."""
    import os
    import shutil

    hist_dir = str(tmp_path / "history")
    scd2_update_batch(_obs_df(spark, {0, 1, 2}), hist_dir)
    shutil.move(hist_dir, hist_dir + ".next")
    success = os.path.join(hist_dir + ".next", "_SUCCESS")
    if os.path.exists(success):
        os.remove(success)
    scd2_update_batch(_obs_df(spark, {3}), hist_dir)
    got = _canon(spark.read.parquet(hist_dir))
    assert got == _canon(scd2_history(_obs_df(spark, {0, 1, 2, 3})))


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


def test_admission_feeds_scd2_history(spark, tmp_path):
    """The full crawl loop: start_crawl_admission (keep=url+snap_id)
    writes accepted docs; start_scd2_maintenance consumes the accepted
    sink and maintains the effective-dated history.  A re-crawl with
    UNCHANGED content is dropped by the content check (an observation
    gap the SCD2 run simply spans); changed content lands as a new
    version; a robots-noindex page never reaches the history."""
    from datetime import datetime, timezone

    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_crawl_admission)

    def ts(minutes):
        return datetime(2026, 3, 1, 12, minutes, tzinfo=timezone.utc)

    ok = "<html><head></head><body><p>ok</p></body></html>"
    noidx = ('<html><head><meta name="robots" content="noindex">'
             "</head></html>")
    hdr = "HTTP/1.1 200 OK\r\n"
    a0 = "original article about river navigation and barge routes"
    # the revision must be genuinely FRESH content: a lightly-edited
    # page is (correctly) near-dup-known to the content check and never
    # reaches the history — revisions version the SCD2 record only when
    # the re-crawl passes admission
    a1 = "total rewrite covering desert irrigation pumps and canal " \
         "maintenance rotas for the dry season"
    b0 = "stable piece on orchard pollination and spring frosts"
    d1 = "new report on mountain weather stations and wind data"

    # wave 0 (snap 0), TWO watermark-advancer batches, then wave 1
    # (snap 1): frontier-dedup state is evicted against the watermark
    # from the PREVIOUS batch's end, so expiring snap-0 URL state needs
    # one batch to raise the watermark past the horizon and one more so
    # the re-crawl batch STARTS with it — the real-pipeline posture
    # where re-crawls arrive well after the duplicate-arrival horizon
    waves = [
        [(1, ts(0), "https://s.example/a", ok, hdr, a0, 0),
         (2, ts(1), "https://s.example/b", ok, hdr, b0, 0),
         (3, ts(2), "https://s.example/c", noidx, hdr, d1, 0)],
        [(8, ts(40), "https://s.example/wm-advancer-1", noidx, hdr,
          "ignored", 0)],
        [(9, ts(41), "https://s.example/wm-advancer-2", noidx, hdr,
          "ignored", 0)],
        [(11, ts(45), "https://s.example/a", ok, hdr, a1, 1),
         (12, ts(46), "https://s.example/b", ok, hdr, b0, 1),
         (13, ts(47), "https://s.example/d", ok, hdr, d1, 1)],
    ]
    schema = ("doc_id long, ingest_ts timestamp, url string, "
              "html string, headers string, text string, snap_id long")

    prior_dir = str(tmp_path / "prior")
    snapshot_profile(spark.createDataFrame(
        [(100, "unrelated prior content about glaciers")],
        "doc_id long, text string")).write.parquet(prior_dir)

    ind = tmp_path / "in"
    ind.mkdir()
    acc = str(tmp_path / "acc")
    for i, wave in enumerate(waves):
        spark.createDataFrame(wave, schema).coalesce(1).write.parquet(
            str(ind / f"w{i}"))
    adm_stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(str(ind) + "/*")
                  .withWatermark("ingest_ts", "10 minutes"))
    q1 = start_crawl_admission(adm_stream, prior_dir, acc,
                               str(tmp_path / "ckpt_adm"),
                               keep=("url", "snap_id"))
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            q1.processAllAvailable()
            try:
                got = {r.doc_id for r in
                       spark.read.parquet(f"{acc}/docs").collect()}
                if got == {1, 2, 11, 13}:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q1.stop()
    accepted = spark.read.parquet(f"{acc}/docs")
    assert ({(r.doc_id, r.url, r.snap_id) for r in accepted.collect()}
            == {(1, "https://s.example/a", 0),
                (2, "https://s.example/b", 0),
                (11, "https://s.example/a", 1),
                (13, "https://s.example/d", 1)})

    hist_dir = str(tmp_path / "history")
    scd2_stream = (spark.readStream
                   .schema("doc_id long, text string, url string, "
                           "snap_id long")
                   .parquet(f"{acc}/docs"))
    q2 = start_scd2_maintenance(scd2_stream, hist_dir,
                                str(tmp_path / "ckpt_scd2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    obs = spark.createDataFrame(
        [("https://s.example/a", 0, a0), ("https://s.example/b", 0, b0),
         ("https://s.example/a", 1, a1), ("https://s.example/d", 1, d1)],
        "url string, snap_id long, text string")
    assert _canon(spark.read.parquet(hist_dir)) == _canon(
        scd2_history(obs))
    # /a carries two versions; /b's snap-1 re-crawl was content-known
    # (observation gap), /d appears at snap 1, /c never entered
    by_url = {}
    for r in spark.read.parquet(hist_dir).collect():
        by_url.setdefault(r.url, []).append(r)
    assert len(by_url["https://s.example/a"]) == 2
    assert len(by_url["https://s.example/b"]) == 1
    assert "https://s.example/c" not in by_url


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
