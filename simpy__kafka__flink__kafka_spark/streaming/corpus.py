"""Streaming front door for the training-data pipeline: the first stages of
the batch corpus-prep capstone (quality scoring, token counting,
content-fingerprint dedup) applied to a document STREAM — the ingest shape a
continuously-arriving 100 TB corpus actually has.

Everything stateless (scoring, counting, filtering) is the exact same column
expressions as the batch path (``functions/text.py``), so batch/stream parity
is by construction; the only stateful operator is the fingerprint dedup,
bounded by ``dropDuplicatesWithinWatermark`` — seen-fingerprint state lives
only for the duplicate-arrival horizon, not the stream's history, which is
what makes the operator viable on an unbounded corpus (the same bounded-state
posture as ``streaming/windows.py:dedup_spans``).

CORPUS-WIDE near-dup (MinHash-LSH) stays a periodic BATCH job over the
deduped sink — candidate generation needs a corpus-wide self-join that no
single watermark horizon can bound; the measured exact-first staging
(PLANS.md: 12x cheaper verify at 20x duplication) is exactly this split.
:func:`streaming_near_dup_candidates` covers the complementary NEAR-HORIZON
case (burst reposts / spam floods arriving within the watermark window):
row-local MinHash signatures (``functions/dedup.py:minhash_fold`` — zero
shuffle, which is what makes LSH composable with a stream-stream join at
all) band into buckets and self-join time-bounded, so state stays
watermark-limited.  The lambda split is standard: streaming catches the
burst, the periodic batch sweep catches the long tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized, quality_score, token_count


def read_parquet_if_exists(spark, path: str) -> DataFrame | None:
    """ONE rendering of the read-the-sink-if-it-exists idiom (round-12
    review fix: the 6-line try/except block existed at seven call sites
    across corpus.py and windows.py, and its tolerated-condition logic
    needed widening — which would have meant seven edits).  Returns
    None when the sink does not exist yet OR exists but holds no
    committed parquet files (the empty-directory race between two
    streaming queries sharing a sink: the writer has created the dir
    but its first append is mid-flight, which reads as
    UNABLE_TO_INFER_SCHEMA, not PATH_NOT_FOUND).  Any OTHER failure
    (corrupt footer, permissions, transient FS error) re-raises — the
    checkpoint retries the batch rather than silently proceeding
    without the sink's history."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        cls = e.getCondition() if hasattr(e, "getCondition") else None
        if (cls in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
                or "Path does not exist" in str(e)
                or "Unable to infer schema" in str(e)):
            return None
        raise


def file_docs_source(spark, path: str, watermark: str = "10 minutes",
                     schema: str = "doc_id long, text string, "
                                   "ingest_ts timestamp") -> DataFrame:
    """Document file-stream (the test/backfill source; swap for the Kafka
    source in production — same downstream plan either way)."""
    return (
        spark.readStream.schema(schema).parquet(path)
        .withWatermark("ingest_ts", watermark)
    )


def corpus_ingest(docs: DataFrame, min_quality: float = 0.3) -> DataFrame:
    """Score -> filter -> fingerprint-dedup a document stream.

    Emits one row per first-seen content fingerprint that clears the quality
    bar: (doc_id, ingest_ts, n_tokens, quality, fingerprint).  Re-deliveries
    and verbatim duplicates arriving within the watermark horizon are
    dropped; a duplicate arriving later than the horizon is the documented
    at-least-once residue (the batch exact-dedup pass downstream catches
    it).  The input must already carry a watermark on ``ingest_ts``.
    """
    scored = docs.select(
        "doc_id",
        "ingest_ts",
        token_count("text").cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
        F.md5(normalized("text")).alias("fingerprint"),
    )
    return (
        scored.where(F.col("quality") >= min_quality)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def streaming_near_dup_candidates(docs: DataFrame,
                                  horizon_ms: int = 600_000) -> DataFrame:
    """Watermark-bounded streaming MinHash-LSH candidate pairs: documents
    arriving within ``horizon_ms`` of each other that share an LSH band
    bucket — the burst-repost / spam-flood detector that runs ON the
    ingest stream instead of waiting for the periodic batch sweep.

    Plan: row-local MinHash signature fold (zero shuffle — the groupBy
    signature form cannot precede a stream-stream join, the row-local
    fold can), band explode, then a time-interval self-join on
    (band, bucket) with both sides watermarked, so join state holds only
    the horizon.  Emits (doc_a, doc_b, band, ts_a, ts_b) with
    doc_a < doc_b; a pair sharing several bands emits once per band
    (streaming dedup of pairs would chain a second stateful operator —
    left to the consumer, same posture as the reference's at-least-once
    output).  Input must carry a watermark on ``ingest_ts``.
    """
    from ..functions.dedup import NUM_HASHES, band_structs, minhash_fold
    from ..functions.text import shingle_array

    sig = docs.where(F.size(shingle_array("text")) > 0).select(
        "doc_id", "ingest_ts", minhash_fold("text").alias("_s")
    ).select(
        "doc_id", "ingest_ts",
        *[F.col(f"_s.h{j}").alias(f"h{j}") for j in range(NUM_HASHES)],
    )
    bk = sig.select(
        "doc_id", "ingest_ts", F.explode(band_structs()).alias("bb")
    ).select("doc_id", "ingest_ts", "bb.band", "bb.bucket")
    a = bk.alias("a")
    b = bk.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("b.ingest_ts") >= F.col("a.ingest_ts")
           - F.expr(f"INTERVAL {horizon_ms} MILLISECONDS"))
        & (F.col("b.ingest_ts") <= F.col("a.ingest_ts")
           + F.expr(f"INTERVAL {horizon_ms} MILLISECONDS"))
    )
    return a.join(b, cond, "inner").select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.band").alias("band"),
        F.col("a.ingest_ts").alias("ts_a"),
        F.col("b.ingest_ts").alias("ts_b"),
    )


def start_pair_compaction(candidates: DataFrame, out_dir: str,
                          checkpoint_dir: str):
    """The downstream consumer :func:`streaming_near_dup_candidates`
    defers to — makes the lambda split runnable end-to-end:
    ``foreachBatch`` compaction of the per-band candidate rows into
    DISTINCT ``(doc_a, doc_b)`` pairs at ``out_dir``.

    Per micro-batch: dedup the batch's pairs (a pair sharing several
    bands collapses here), anti-join against the pairs already compacted
    (so a pair re-emitted across batches lands once), append the
    remainder.  Chaining a second stateful streaming dedup operator would
    grow pair state unboundedly; batch-side compaction keeps the stream's
    state watermark-limited and pays only a sink-sized read per batch —
    pair volume is horizon-bounded by construction.  At production scale
    the anti-join step is a keyed MERGE into a transactional table
    (Delta/Iceberg); plain parquet demonstrates the identical dataflow.
    Exactly-once caveat: a batch replayed after a crash BETWEEN the
    append and the checkpoint commit re-reads the sink first, so replays
    are idempotent — the standard foreachBatch upsert posture.

    Returns the started StreamingQuery.
    """
    def compact(batch_df: DataFrame, batch_id: int) -> None:
        compact_pair_batch(batch_df, out_dir)

    return (
        candidates.writeStream.foreachBatch(compact)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def compact_pair_batch(batch_df: DataFrame, out_dir: str) -> None:
    """One micro-batch of :func:`start_pair_compaction` — distinct the
    batch's pairs, anti-join against the compacted sink, append the
    remainder.  ONLY the missing-sink (first batch) case may skip the
    anti-join; any other sink-read failure (corrupt parquet footer,
    permissions, transient FS error) must fail the batch — the
    checkpoint will retry it — rather than silently appending duplicate
    pairs."""
    spark = batch_df.sparkSession
    fresh = batch_df.select("doc_a", "doc_b").distinct()
    existing = read_parquet_if_exists(spark, out_dir)
    if existing is not None:
        fresh = fresh.join(existing.select("doc_a", "doc_b"),
                           ["doc_a", "doc_b"], "left_anti")
    fresh.write.mode("append").parquet(out_dir)


# --- Streaming incremental ingest vs a prior snapshot ------------------------

def incremental_ingest_batch(batch_df: DataFrame, prior_profile_dir: str,
                             accepted_dir: str,
                             keep: tuple[str, ...] = (),
                             schedule_dir: str | None = None,
                             delays: DataFrame | None = None,
                             per_wave: int = 4,
                             default_delay_s: float = 1.0,
                             anomalies_dir: str | None = None) -> None:
    """One micro-batch of :func:`start_incremental_ingest`: classify the
    batch's docs against the PRIOR snapshot's persisted profile PLUS the
    profiles of docs accepted in earlier batches, admit only ``fresh``
    docs, and append both the docs and their profile rows to the
    accepted sink — so later batches (and the next crawl) see them as
    known.  Batch-internal exact copies collapse first (keep-first on
    the fingerprint).  At-least-once replay: a replayed batch re-reads
    the sink profile, so docs whose PROFILE landed before the crash
    classify ``exact_known`` and are not appended twice — the same
    upsert posture as pair compaction.  The two appends are not atomic,
    so write ORDER decides the torn-window failure mode: docs go FIRST.
    A crash between them leaves docs-without-profile; the replay then
    re-admits those docs (a duplicate-docs anomaly in the docs sink,
    healed for every FUTURE batch the moment the replay's profile append
    lands) rather than the reverse order's profile-without-docs, where
    the replay would classify the docs ``exact_known`` from their own
    half-committed profile and they would be PERMANENTLY absent from the
    docs sink.  A duplicate is the documented at-least-once residue the
    batch exact-dedup sweep (or a Delta/Iceberg MERGE in production)
    removes; silent loss is unrecoverable.

    When ``schedule_dir`` is given (the streaming politeness tail —
    round-11), the batch's admitted docs ALSO get politeness schedule
    rows (url, host, slot, wave, not_before_s) continuing each host's
    slot sequence across batches via :func:`schedule_accepted_batch`;
    ``keep`` must then include ``url``.  The schedule append goes FIRST
    (before docs/profile): its sink-side doc_id anti-join makes replays
    idempotent, whereas appending it LAST would open a crash window
    (docs+profile landed, schedule didn't) in which the replay
    classifies the docs ``exact_known`` and the schedule rows would be
    PERMANENTLY lost.

    When ``anomalies_dir`` additionally names the rate-detector's sink
    (streaming/windows.py:start_anomaly_detection — round 12), the
    batch's schedule rows apply the anomaly BACKOFF from the sink's
    CURRENT flags (functions/crawl.py:anomaly_backoff, the one
    rendering); before the detector's first append the flags columns
    are NULL (the sink schema is stable either way)."""
    from pyspark.sql import Window as W

    from ..functions.dedup import dedup_against, snapshot_profile
    from ..functions.text import normalized as _norm

    spark = batch_df.sparkSession
    prior = spark.read.parquet(prior_profile_dir)
    seen = read_parquet_if_exists(spark, f"{accepted_dir}/profile")
    if seen is not None:
        prior = prior.unionByName(seen)
    # keep-first within the batch so two copies arriving together don't
    # both classify fresh (the profile can't see batch-mates).  ``keep``
    # columns (e.g. url + snapshot id for the downstream SCD2 composer)
    # ride through to the docs sink; the profile stays doc_id-keyed.
    batch = (
        batch_df.select("doc_id", "text", *keep)
        .withColumn("_fp", F.md5(_norm("text")))
        .withColumn("_rn", F.row_number().over(
            W.partitionBy("_fp").orderBy("doc_id")))
        .where(F.col("_rn") == 1).drop("_fp", "_rn")
    )
    status = dedup_against(batch, prior)
    # eager localCheckpoint: the classification READS the sink profile
    # and the writes below APPEND to it — without materializing first,
    # the second write's re-evaluation would re-list the profile path
    # and see the first write's own output (fresh docs self-classifying
    # as known).  The frame is batch-sized, so the checkpoint is cheap.
    fresh = batch.join(
        status.where(F.col("status") == "fresh").select("doc_id"),
        "doc_id").localCheckpoint()
    # schedule BEFORE docs BEFORE profile — see the docstring's
    # torn-window analyses
    if schedule_dir is not None:
        if "url" not in keep:
            raise ValueError(
                "schedule_dir requires 'url' in keep: the politeness "
                "schedule is keyed on the accepted doc's URL host")
        anomalies = (read_parquet_if_exists(spark, anomalies_dir)
                     if anomalies_dir is not None else None)
        schedule_accepted_batch(
            fresh.select("doc_id", "url"), schedule_dir,
            per_wave=per_wave, delays=delays,
            default_delay_s=default_delay_s, anomalies=anomalies)
    fresh.write.mode("append").parquet(f"{accepted_dir}/docs")
    snapshot_profile(fresh).write.mode("append").parquet(
        f"{accepted_dir}/profile")


def start_incremental_ingest(docs_stream: DataFrame,
                             prior_profile_dir: str, accepted_dir: str,
                             checkpoint_dir: str):
    """Streaming tie-in for cross-snapshot incremental dedup
    (functions/dedup.py:dedup_against): a continuously-arriving re-crawl
    admits only content unknown to BOTH the prior snapshot and this
    run's own earlier batches.  foreachBatch keeps the growing
    known-profile on the sink side (bounded by accepted volume, not
    stream history), exactly like the pair-compaction consumer — no
    unbounded streaming state.  Returns the started StreamingQuery."""
    def step(batch_df: DataFrame, batch_id: int) -> None:
        incremental_ingest_batch(batch_df, prior_profile_dir, accepted_dir)

    return (
        docs_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


# --- Streaming SCD2 snapshot maintenance -------------------------------------

def scd2_apply(history: DataFrame | None, obs: DataFrame,
               key_col: str = "url", snap_col: str = "snap_id",
               text_col: str = "text") -> DataFrame:
    """One incremental SCD2 step: advance an effective-dated history
    (schema of functions/crawl.py:scd2_history) by a batch of new
    observations — the merge a CONTINUOUS crawl runs per micro-batch
    instead of recomputing the whole history from every snapshot ever
    taken.  Pure batch function (foreachBatch wraps it in
    :func:`start_scd2_maintenance`), so the batch-parity test can fold
    snapshots through it one at a time and compare against the
    all-at-once batch operator.

    Merge algebra (one key-keyed exchange over touched keys only):
    each touched key's CURRENT row becomes a seed row carrying its run
    state (fingerprint, version, valid_from, last_seen, n_snaps); the
    batch's observations union under it and the same lag/run-sum/lead
    window algebra as the batch operator re-derives the key's current
    + new versions.  Closed versions and untouched keys pass through
    byte-identical.  A batch observation with ``snap <= last_seen`` of
    the key's current row is DROPPED — it was either already applied
    (checkpoint replay: this is what makes the step idempotent) or it
    arrived out of order (late data; the batch operator over the full
    snapshot archive is the backfill path, same at-least-once posture
    as the rest of the front door).

    Observations: (key_col, snap_col, text_col); duplicate (key, snap)
    rows collapse to the min fingerprint (the snapshot_diff contract).
    Returns the full new history."""
    from pyspark.sql import Window as W

    from ..functions.text import normalized

    fp = (obs.select(F.col(key_col).alias("k"),
                     F.col(snap_col).cast("long").alias("snap"),
                     F.md5(normalized(text_col)).alias("fingerprint"))
          .groupBy("k", "snap")
          .agg(F.min("fingerprint").alias("fingerprint")))
    hist_cols = [key_col, "fingerprint", "version", "valid_from",
                 "valid_to", "last_seen", "n_snaps", "is_current"]
    if history is None:
        spark = obs.sparkSession
        history = spark.createDataFrame(
            [], f"{key_col} string, fingerprint string, version long, "
                "valid_from long, valid_to long, last_seen long, "
                "n_snaps long, is_current int")
    hist = history.select(*hist_cols)
    keys = fp.select("k").distinct()
    untouched = hist.join(keys, F.col(key_col) == F.col("k"),
                          "left_anti")
    touched = hist.join(keys, F.col(key_col) == F.col("k"),
                        "left_semi")
    cur = touched.where(F.col("is_current") == 1)
    closed = touched.where(F.col("is_current") == 0)
    # replay/late guard: drop observations at or before the current edge
    fresh = (fp.join(cur.select(F.col(key_col).alias("k"),
                                F.col("last_seen").alias("_edge")),
                     "k", "left")
             .where(F.col("_edge").isNull()
                    | (F.col("snap") > F.col("_edge")))
             .drop("_edge"))
    seed = cur.select(
        F.col(key_col).alias("k"),
        F.col("last_seen").alias("snap"),
        "fingerprint",
        F.col("valid_from").alias("vf"),
        F.col("n_snaps").alias("w"),
        F.col("version").alias("base"),
        F.lit(1).alias("is_seed"),
    )
    rows = seed.unionByName(fresh.select(
        "k", "snap", "fingerprint",
        F.col("snap").alias("vf"),
        F.lit(1).cast("long").alias("w"),
        F.lit(None).cast("long").alias("base"),
        F.lit(0).alias("is_seed"),
    ))
    wk = W.partitionBy("k").orderBy("snap")
    runs = (
        rows.withColumn(
            "chg",
            F.when(F.col("is_seed") == 1, F.lit(0))
            .when(F.lag("fingerprint").over(wk).isNull()
                  | (F.lag("fingerprint").over(wk)
                     != F.col("fingerprint")), F.lit(1))
            .otherwise(F.lit(0)))
        .withColumn("_base", F.coalesce(
            F.max("base").over(W.partitionBy("k")), F.lit(0)))
        .withColumn("version", F.col("_base") + F.sum("chg").over(
            wk.rowsBetween(W.unboundedPreceding, W.currentRow)))
    )
    per_run = runs.groupBy("k", "version").agg(
        F.min_by("fingerprint", "snap").alias("fingerprint"),
        F.min("vf").alias("valid_from"),
        F.max("snap").alias("last_seen"),
        F.sum("w").cast("long").alias("n_snaps"),
    )
    wv = W.partitionBy("k").orderBy("version")
    rebuilt = per_run.select(
        F.col("k").alias(key_col), "fingerprint",
        F.col("version").cast("long").alias("version"),
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "last_seen", "n_snaps",
        F.when(F.lead("valid_from").over(wv).isNull(), F.lit(1))
        .otherwise(F.lit(0)).alias("is_current"),
    )
    return untouched.unionByName(closed).unionByName(rebuilt)


def scd2_update_batch(batch_df: DataFrame, history_dir: str,
                      key_col: str = "url", snap_col: str = "snap_id",
                      text_col: str = "text") -> None:
    """One micro-batch of :func:`start_scd2_maintenance`: read the
    persisted history, merge the batch via :func:`scd2_apply`, persist
    the result.  The new history is materialized (localCheckpoint)
    BEFORE the swap because it READS the path it replaces; the swap is
    write-to-side-dir + replace, and the read path RECOVERS the swap's
    one crash window — history_dir missing with a complete ``.next``
    side dir (the rmtree happened, the rename didn't) renames the side
    dir back into place before reading.  The side dir is only ever
    deleted by its own overwrite AFTER the history read, so a partial
    side-dir write always coexists with an intact history_dir and is
    never recovered from.  Production swaps this file dance for a
    Delta/Iceberg MERGE, the same posture as pair compaction."""
    import os
    import shutil

    spark = batch_df.sparkSession
    import glob

    tmp = history_dir.rstrip("/") + ".next"

    def _committed(d: str) -> bool:
        # Spark's _SUCCESS marker, or — for sessions that disable
        # marksuccessfuljobs — committed part files with the
        # _temporary staging dir gone (a mid-write crash always leaves
        # _temporary behind)
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            return True
        # glob.escape: a history path containing glob metacharacters
        # ('[', ']', '*', '?') must not silently fail the part-file
        # probe — that would skip the recovery and lose the history
        return (not os.path.exists(os.path.join(d, "_temporary"))
                and bool(glob.glob(os.path.join(glob.escape(d),
                                                "part-*"))))

    if not os.path.exists(history_dir) and os.path.exists(tmp) \
            and _committed(tmp):
        # torn swap from a previous run: a COMMITTED side dir is the
        # complete newest history — restore it instead of silently
        # restarting history.  An uncommitted side dir is a
        # half-written FIRST batch (crash mid-write before any history
        # existed): leave it for the overwrite below, never read it.
        os.rename(tmp, history_dir)
    hist = read_parquet_if_exists(spark, history_dir)
    new_hist = scd2_apply(hist, batch_df, key_col=key_col,
                          snap_col=snap_col,
                          text_col=text_col).localCheckpoint()
    new_hist.write.mode("overwrite").parquet(tmp)
    if os.path.exists(history_dir):
        shutil.rmtree(history_dir)
    os.rename(tmp, history_dir)


def start_scd2_maintenance(obs_stream: DataFrame, history_dir: str,
                           checkpoint_dir: str,
                           key_col: str = "url",
                           snap_col: str = "snap_id",
                           text_col: str = "text"):
    """Streaming SCD2 maintenance — the storage layer a continuous
    crawl keeps so :func:`~..functions.crawl.snapshot_diff` questions
    ("what changed since snapshot N?") are answerable without storing
    every page copy: each micro-batch of (key, snap, text) observations
    advances the persisted effective-dated history via
    :func:`scd2_update_batch`.  Composes downstream of
    :func:`start_crawl_admission`'s accepted stream (feed it the
    accepted docs plus their crawl/snapshot id).  Restart-safe: a
    replayed batch's observations fall at-or-before each key's
    last_seen edge and are dropped by :func:`scd2_apply`'s idempotence
    guard.  Returns the started StreamingQuery."""
    def step(batch_df: DataFrame, batch_id: int) -> None:
        scd2_update_batch(batch_df, history_dir, key_col=key_col,
                          snap_col=snap_col, text_col=text_col)

    return (
        obs_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


# --- Streaming politeness schedule (round 11) ---------------------------------

def schedule_accepted_batch(batch_urls: DataFrame, schedule_dir: str,
                            per_wave: int = 4,
                            delays: DataFrame | None = None,
                            default_delay_s: float = 1.0,
                            id_col: str = "doc_id",
                            url_col: str = "url",
                            anomalies: DataFrame | None = None,
                            anomaly_max_age_buckets: int = 24,
                            host_col: str | None = None) -> None:
    """Politeness-schedule one micro-batch of admitted URLs, CONTINUING
    each host's slot sequence across batches: the batch ranks locally
    (functions/crawl.py:crawl_schedule — the sharded rank), then lifts
    every slot by the host's already-scheduled row count from the sink,
    so the (host, slot) sequence stays dense and the pacing arithmetic
    (per-slot for delayed hosts, per-wave otherwise) keeps counting
    from where the previous batch stopped.  Slot order is ADMISSION
    order across batches (a live crawler schedules work as it admits
    it), id-ascending within a batch — identical to the batch operator
    whenever arrival order follows ids, which is what the parity test
    feeds.  Replays are idempotent via a sink-side doc_id anti-join
    (the pair-compaction posture).  Output rows: (id_col, host, slot,
    wave, not_before_s, n_anomalies, not_before_backoff_s) — the last
    two NULL when no detector feed is given, so the sink schema stays
    stable across batches.

    When ``anomalies`` carries the rate-detector's scored buckets (the
    sink of streaming/windows.py:start_anomaly_detection — host-keyed,
    with ``is_anomaly``), the batch applies the SAME backoff rendering
    as the batch operator (functions/crawl.py:anomaly_backoff — one
    rendering, the not_before_s discipline): the crawl loop's schedule
    now READS the anomaly signal (VERDICT r11 task 9)."""
    from ..functions.crawl import crawl_schedule

    spark = batch_urls.sparkSession
    fresh = batch_urls.select(
        id_col, url_col,
        *((host_col,) if host_col is not None else ()))
    offs = None
    existing = read_parquet_if_exists(spark, schedule_dir)
    if existing is not None:
        # anti-join BEFORE ranking: a replayed batch that partially
        # overlaps the sink (half-committed append, overlapping caller
        # batches) must rank only its surviving rows — ranking first
        # would leave the dropped rows' ranks as permanent holes in the
        # dense (host, slot) sequence after the lift
        fresh = fresh.join(existing.select(id_col), id_col, "left_anti")
        offs = existing.groupBy("host").agg(
            F.count(F.lit(1)).alias("_off"))
    local = crawl_schedule(fresh, per_wave=per_wave, id_col=id_col,
                           url_col=url_col, host_col=host_col)
    if offs is not None:
        local = (local.join(F.broadcast(offs), "host", "left")
                 .withColumn("slot", F.col("slot")
                             + F.coalesce("_off", F.lit(0)))
                 .drop("_off"))
    lifted = local.withColumn("wave", F.expr(f"slot div {int(per_wave)}"))
    # ONE rendering of the pacing rule (functions/crawl.py:
    # not_before_expr — VERDICT r11 task 4): no-delays batches get a
    # null crawl_delay column so the default-wave arm applies
    from ..functions.crawl import not_before_expr

    if delays is not None:
        lifted = lifted.join(F.broadcast(delays), "host", "left")
    else:
        lifted = lifted.withColumn(
            "crawl_delay", F.lit(None).cast("double"))
    lifted = lifted.withColumn("not_before_s",
                               not_before_expr(default_delay_s))
    cols = [id_col, "host", "slot", "wave", "not_before_s",
            "n_anomalies", "not_before_backoff_s"]
    if anomalies is not None:
        from ..functions.crawl import anomaly_backoff

        # the detector sink is append-only HISTORY: flags age out after
        # anomaly_max_age_buckets of data time, or one day-one burst
        # would back the host off forever (round-12 review fix)
        lifted = anomaly_backoff(lifted.select(*cols[:5]), anomalies,
                                 max_age_buckets=anomaly_max_age_buckets)
    else:
        # the sink schema must be STABLE across batches: a live loop
        # schedules its first batches before the detector sink exists,
        # and a parquet directory mixing 5- and 7-column files makes
        # spark.read.parquet drop whichever columns the sampled footer
        # lacks (round-12 review fix) — no detector feed reads as NULL
        # flags, not as a narrower schema
        lifted = (lifted
                  .withColumn("n_anomalies",
                              F.lit(None).cast("long"))
                  .withColumn("not_before_backoff_s",
                              F.lit(None).cast("double")))
    lifted.select(*cols).write.mode("append").parquet(schedule_dir)


# --- Streaming sitemap -> frontier seeding (round 11) --------------------------

def seed_frontier_batch(batch_df: DataFrame, frontier_dir: str,
                        fetch_df: DataFrame | None = None,
                        robots_rules_df: DataFrame | None = None) -> None:
    """One micro-batch of :func:`start_sitemap_seeding`: parse the
    batch's FETCHED sitemap files (rows of (domain, xml)) into frontier
    candidates, resolve ONE ``<sitemapindex>`` recursion level against
    ``fetch_df`` ((sitemap_url, xml) — the test's fake fetcher, the
    documented seam for a real HTTP fetch), gate candidates through the
    advertising domain's robots rules when given, and append the
    never-seen-before URLs to the frontier sink.

    Recursion bound: exactly one index level resolves IN the batch;
    nested indexes inside a CHILD sitemap are dropped here — the stream
    itself is the outer loop (fetching that child index later makes it
    a new stream row, which resolves its own children then), so the
    bound is per-batch, not per-crawl.  Sink-side (domain, url)
    anti-join makes replays idempotent — the pair-compaction posture.
    Output rows: (domain, url, priority, lastmod, changefreq)."""
    from ..functions.crawl import parse_sitemap

    spark = batch_df.sparkSession
    ent = parse_sitemap(batch_df.select("domain", "xml"),
                        xml_col="xml", id_col="domain")
    urls = ent.where(F.col("kind") == "url")
    if fetch_df is not None:
        child_xml = (
            ent.where(F.col("kind") == "sitemap")
            .join(F.broadcast(fetch_df),
                  ent.loc == fetch_df.sitemap_url)
            .select("domain", "xml")
        )
        child = parse_sitemap(child_xml, xml_col="xml", id_col="domain")
        # one level only: a sitemapindex INSIDE a child is left to the
        # stream (see the docstring's recursion bound)
        urls = urls.unionByName(child.where(F.col("kind") == "url"))
    cand = urls.groupBy("domain", F.col("loc").alias("url")).agg(
        F.max("priority").alias("priority"),
        F.max("lastmod").alias("lastmod"),
        F.max("changefreq").alias("changefreq"),
    )
    if robots_rules_df is not None:
        # materialize first: the gate references `cand` twice (inside
        # robots_allowed and as the semi-join's left side) — unpinned,
        # the whole parse + child-fetch + dedup would execute twice per
        # batch; the frame is batch-sized, so the checkpoint is cheap
        cand = cand.localCheckpoint()
        from ..functions.robots import robots_allowed

        gid = F.concat_ws("|", "domain", "url")
        ok = robots_allowed(
            cand.select(gid.alias("gid"), "domain", "url"),
            robots_rules_df, url_col="url", id_col="gid",
        ).where(F.col("allowed") == 1).select("gid")
        cand = (cand.withColumn("gid", gid)
                .join(ok, "gid", "left_semi").drop("gid"))
    seen = read_parquet_if_exists(spark, frontier_dir)
    if seen is not None:
        cand = cand.join(seen.select("domain", "url"),
                         ["domain", "url"], "left_anti")
    cand.write.mode("append").parquet(frontier_dir)


def start_sitemap_seeding(sitemap_stream: DataFrame, frontier_dir: str,
                          checkpoint_dir: str,
                          fetch_df: DataFrame | None = None,
                          robots_rules_df: DataFrame | None = None):
    """Streaming frontier seeding from fetched sitemap files — the
    missing streaming stage of the crawl loop (robots Sitemap lines
    surface the files via functions/robots.py:robots_sitemaps; this
    turns their CONTENTS into frontier URLs as they arrive): each
    micro-batch of (domain, xml, ingest_ts) rows runs
    :func:`seed_frontier_batch`.  The seeded frontier sink is the
    natural input of the admission chain (read it, or union it into
    ``docs_stream`` once fetched).  Restart-safe: replayed batches
    anti-join against the sink.  Returns the started StreamingQuery."""
    def step(batch_df: DataFrame, batch_id: int) -> None:
        seed_frontier_batch(batch_df, frontier_dir, fetch_df=fetch_df,
                            robots_rules_df=robots_rules_df)

    return (
        sitemap_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def sitemap_gz_source(spark, path: str,
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming ingestion of gzipped sitemap files (round 13 — the
    protocol's recommended delivery shape, the warc_gz_source
    posture): files named ``{host}.sitemap*.xml.gz`` landing under
    ``path`` arrive through the binaryFile source; the host comes
    from the file name (the writer contract — a fetcher names the
    file after the site it pulled it from; non-conforming names are
    SKIPPED, the warc shard-id rule), the payload is peeled by the
    bounded multi-member gunzip, and the output is the
    (domain, xml, ingest_ts) stream :func:`start_sitemap_seeding`
    consumes."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from ..functions.html import gunzip_members

    raw = (spark.readStream.format("binaryFile")
           .schema("path string, modificationTime timestamp, "
                   "length long, content binary")
           .option("pathGlobFilter", "*.xml.gz").load(path))
    media = raw.select(
        F.regexp_extract(F.col("path"),
                         r"([^/]+)\.sitemap[^/]*\.xml\.gz$", 1)
        .alias("domain"),
        F.col("modificationTime").alias("ingest_ts"),
        "content").where(F.col("domain") != "")

    schema = T.StructType([
        T.StructField("domain", T.StringType(), True),
        T.StructField("ingest_ts", T.TimestampType(), True),
        T.StructField("xml", T.StringType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "domain": pdf["domain"],
                "ingest_ts": pdf["ingest_ts"],
                "xml": pdf["content"].map(
                    lambda b: gunzip_members(bytes(b))[0]
                    .decode("utf-8", errors="replace")),
            })

    return media.mapInPandas(run, schema).withWatermark(
        "ingest_ts", watermark)


def url_frontier_dedup(urls: DataFrame,
                       keep: tuple[str, ...] = ()) -> DataFrame:
    """Streaming URL-frontier dedup: canonicalize
    (functions/urls.py:canonicalize_url — zero-shuffle, so it composes
    with any downstream stateful operator) and keep the first arrival
    per canonical URL within the watermark horizon.  The crawl-frontier
    twin of :func:`corpus_ingest`'s content dedup: state is bounded by
    the duplicate-arrival horizon, and a late re-submission beyond it is
    the documented at-least-once residue the batch url_dedup sweep
    catches.  Input must carry a watermark on ``ingest_ts``; output one
    row per first-seen canonical URL: (doc_id, ingest_ts, url,
    canonical_url) plus any ``keep`` passthrough columns (the streaming
    admission chain threads html/headers/text through here)."""
    from ..functions.urls import canonicalize_url

    return (
        urls.select("doc_id", "ingest_ts", "url",
                    canonicalize_url("url").alias("canonical_url"),
                    *keep)
        .dropDuplicatesWithinWatermark(["canonical_url"])
    )


def start_crawl_admission(docs_stream: DataFrame, prior_profile_dir: str,
                          accepted_dir: str, checkpoint_dir: str,
                          robots_rules_df: DataFrame | None = None,
                          keep: tuple[str, ...] = (),
                          schedule_dir: str | None = None,
                          delays_df: DataFrame | None = None,
                          per_wave: int = 4,
                          default_delay_s: float = 1.0,
                          anomalies_dir: str | None = None):
    """STREAMING crawl admission — the batch capstone's precedence
    (functions/crawl.py:admission_statuses) as one continuous front
    door, each stage in the stream-appropriate form:

    1. 'url_duplicate'  -> :func:`url_frontier_dedup`
       (zero-shuffle canonicalization + dropDuplicatesWithinWatermark;
       state bounded by the duplicate-arrival horizon)
    2. 'robots_noindex' -> stateless filter on the SAME folded-directive
       expression the batch gate uses
       (functions/quality.py:robots_directives — zero shuffle)
    3. 'known_content'  -> :func:`incremental_ingest_batch` per
       micro-batch (prior-snapshot profile + the run's own accepted
       profile on the sink side; bounded streaming state)

    Sequential drops reproduce the batch precedence by construction: a
    URL loser never reaches the robots gate, a noindex page never
    reaches the content check — exactly the CASE priority of the batch
    capstone, which is what the batch-parity test asserts by pushing
    one fixture through both paths.  Semantics are the documented
    at-least-once posture of the underlying stages (frontier-horizon
    residue is caught by the batch URL sweep; the docs-first torn-write
    window yields duplicates, never loss).

    When ``robots_rules_df`` is given (functions/robots.py:robots_rules
    output keyed on ``domain`` = URL host), the robots.txt FILE gate
    runs as stage 2b inside each micro-batch: the rules frame is a
    STATIC broadcast side (domain-cardinality), and the longest-match /
    allow-wins gate — a per-batch aggregate — composes in the
    foreachBatch batch context, the standard way a streaming upsert
    borrows batch operators.

    ``docs_stream`` must carry (doc_id, ingest_ts, url, html, headers,
    text) and a watermark on ``ingest_ts``.  Returns the started
    StreamingQuery; accepted docs + their profile land under
    ``accepted_dir`` exactly as in :func:`start_incremental_ingest`.
    ``keep`` columns ride through to the accepted docs sink — pass
    ("url", "snap_id") to feed :func:`start_scd2_maintenance` off the
    sink, closing the crawl -> admission -> history loop.

    When ``schedule_dir`` is given (round-11: the politeness tail, the
    last batch-only stage of the crawl loop), every admitted doc ALSO
    gets a politeness schedule row (doc_id, host, slot, wave,
    not_before_s) under it — per-host slot sequences CONTINUE across
    micro-batches (:func:`schedule_accepted_batch`), ``delays_df``
    carries per-host Crawl-delay seconds (per-slot pacing; hosts
    without one pace per-wave at ``default_delay_s``), and ``keep``
    must include ``url``.  ``anomalies_dir`` (round 12) names the
    rate-detector's sink so each batch's schedule rows carry the
    CURRENT per-host anomaly backoff — the detector and the front door
    are separate streaming queries sharing the sink, the same
    composition posture as the SCD2 tail."""
    from ..functions.quality import _NOINDEX_TOK_RE, robots_directives

    # sorted: Python set iteration order varies across processes (hash
    # randomization), and a checkpoint-recovered restart of this query
    # must project the frontier in the SAME column order
    frontier = url_frontier_dedup(
        docs_stream, keep=tuple(sorted({"html", "headers", "text", *keep}
                                       - {"doc_id", "ingest_ts", "url"})))
    indexable = frontier.where(
        ~robots_directives("html", "headers").rlike(_NOINDEX_TOK_RE))

    def step(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df
        if robots_rules_df is not None:
            from ..functions.robots import robots_allowed

            withhost = batch.withColumn(
                "domain",
                F.lower(F.regexp_extract(
                    "url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)))
            ok = (robots_allowed(withhost, robots_rules_df)
                  .where(F.col("allowed") == 1).select("doc_id"))
            batch = batch.join(ok, "doc_id", "left_semi")
        incremental_ingest_batch(batch.select("doc_id", "text", *keep),
                                 prior_profile_dir, accepted_dir,
                                 keep=keep, schedule_dir=schedule_dir,
                                 delays=delays_df, per_wave=per_wave,
                                 default_delay_s=default_delay_s,
                                 anomalies_dir=anomalies_dir)

    return (
        indexable.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


# --- Streaming web-corpus preparation (round 13 — VERDICT r12 task 6) -------

def web_prep_batch(batch_df: DataFrame, out_dir: str,
                   domain_cap: int = 20,
                   repetition_gate: bool = False,
                   carry_text: bool = False) -> None:
    """One micro-batch of :func:`start_web_prep` — the incremental fold
    of the batch web capstone (plans/dataprep.py:_q_web_prep_full),
    running the SAME stage functions: HTML main-content extraction ->
    C4 sentence cleanup -> Gopher quality gate -> exact dedup on the
    cleaned text against BOTH batch-mates and the sink's fingerprint
    profile (the incremental_ingest_batch posture) -> per-domain cap
    CONTINUED across batches (each domain's accepted count so far
    offsets the batch's rank).  Input columns: (doc_id, html, domain).

    Sink layout under ``out_dir``: ``docs`` (doc_id, domain, n_words,
    fp — the accepted corpus) and ``profile`` (fp — EVERY post-dedup
    fingerprint, including cap-dropped docs': the batch capstone
    dedups before capping, so a cap casualty still consumes its fp
    slot).  Write order is docs FIRST then profile, the
    incremental_ingest torn-window analysis: a crash between the two
    appends re-admits the batch's docs on replay (a duplicate-docs
    anomaly the downstream exact-dedup sweep removes) instead of the
    reverse order's silent permanent loss.  Arrival in doc_id order
    reproduces the batch capstone bit-for-bit (keep-first and the cap
    both rank by doc_id); out-of-order arrival degrades only WHICH
    duplicate/overflow doc is kept, never the counts.

    ``repetition_gate`` (round 14 — VERDICT r13 task 6) additionally
    drops docs failing the 9-signal Gopher repetition battery
    (functions/quality.py:gopher_repetition) between C4 cleanup and
    the quality gate.  The battery is per-doc stateless, so the fold
    stays restart-safe and fold-vs-batch exact; the default keeps the
    batch-capstone parity (web_prep_full carries no repetition
    stage)."""
    from pyspark.sql import Window as W

    from ..functions.html import extract_main_content
    from ..functions.quality import c4_sentence_filter, gopher_quality

    spark = batch_df.sparkSession
    pages = batch_df.select("doc_id", "html", "domain")
    ex = extract_main_content(pages).select("doc_id", "main_text")
    c4 = (c4_sentence_filter(ex, text_col="main_text")
          .where(F.col("doc_kept") == 1)
          .select("doc_id", "clean_text"))
    if repetition_gate:
        from ..functions.quality import gopher_repetition

        rep_ok = (gopher_repetition(c4, text_col="clean_text")
                  .where(F.col("passes_repetition") == 1)
                  .select("doc_id"))
        c4 = c4.join(rep_ok, "doc_id")
    # carry_text (round 15 — the composed-pipeline chain): the docs
    # sink additionally carries the cleaned text so a downstream
    # stage (the cross-snapshot dedup-ingest) can consume the sink as
    # its own stream source; default off keeps batch-capstone parity
    text_cols = ("clean_text",) if carry_text else ()
    kept = (gopher_quality(c4, text_col="clean_text",
                           keep_cols=("clean_text",))
            .where(F.col("passes") == 1)
            .select("doc_id", "n_words",
                    F.md5("clean_text").alias("fp"), *text_cols))
    # batch-internal keep-first on the fingerprint (batch-mates are
    # invisible to the sink profile), then drop fingerprints the sink
    # has already accepted
    sole = (kept.withColumn("_rn", F.row_number().over(
                W.partitionBy("fp").orderBy("doc_id")))
            .where(F.col("_rn") == 1).drop("_rn"))
    seen = read_parquet_if_exists(spark, f"{out_dir}/profile")
    if seen is not None:
        sole = sole.join(seen, "fp", "left_anti")
    # eager materialization BEFORE any append below: the profile/tally
    # reads above must not re-list the sinks mid-plan and see this
    # batch's own writes (the incremental_ingest lesson).  sole is
    # checkpointed (not just accepted): its fingerprints go to the
    # profile even for cap-DROPPED docs — the batch capstone dedups
    # BEFORE capping, so a cap casualty still consumes its fp slot
    # and a later same-text doc in another domain must classify
    # duplicate, not fresh (review find: profiling only accepted fps
    # broke that parity).
    sole = sole.localCheckpoint()
    fresh = sole.join(pages.select("doc_id", "domain"), "doc_id")
    # per-domain cap continued across batches: prior accepted counts
    # offset this batch's per-domain rank
    docs_sink = read_parquet_if_exists(spark, f"{out_dir}/docs")
    if docs_sink is not None:
        tally = docs_sink.groupBy("domain").agg(
            F.count(F.lit(1)).alias("_prior"))
        fresh = fresh.join(F.broadcast(tally), "domain", "left")
    else:
        fresh = fresh.withColumn("_prior", F.lit(None).cast("long"))
    wdom = W.partitionBy("domain").orderBy("doc_id")
    accepted = (
        fresh.withColumn(
            "_dr", F.row_number().over(wdom) + F.coalesce("_prior",
                                                          F.lit(0)))
        .where(F.col("_dr") <= domain_cap)
        .select("doc_id", "domain", "n_words", "fp", *text_cols)
        .localCheckpoint()
    )
    accepted.write.mode("append").parquet(f"{out_dir}/docs")
    sole.select("fp").write.mode("append").parquet(
        f"{out_dir}/profile")


def start_web_prep(docs_stream: DataFrame, out_dir: str,
                   checkpoint_dir: str, domain_cap: int = 20,
                   repetition_gate: bool = False,
                   carry_text: bool = False):
    """Streaming twin of the web capstone: a standing query over a
    page stream (columns doc_id/html/domain — e.g. warc_gz_source
    records with a derived domain) folding each micro-batch through
    :func:`web_prep_batch`.  The cross-batch state (seen fingerprints,
    per-domain tallies) lives on the SINK side, bounded by accepted
    volume — no unbounded streaming state; checkpoint-restart safe
    (the foreachBatch replay contract + the torn-window ordering in
    web_prep_batch).  Returns the started StreamingQuery."""
    def step(batch_df: DataFrame, batch_id: int) -> None:
        web_prep_batch(batch_df, out_dir, domain_cap=domain_cap,
                       repetition_gate=repetition_gate,
                       carry_text=carry_text)

    return (
        docs_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def start_warc_web_prep(spark, warc_dir: str, out_dir: str,
                        checkpoint_dir: str, domain_cap: int = 20,
                        repetition_gate: bool = False):
    """The full container-to-corpus STANDING STREAM (round 13 — the
    composition VERDICT r12 task 6 named): ``.warc.gz`` shards landing
    under ``warc_dir`` -> :func:`warc_gz_source` (bounded multi-member
    gunzip + the shared WARC parse) -> response records become pages
    (doc_id = shard_id * 1e6 + rec_idx, so shard order IS doc order
    and the fold reproduces the batch pipeline; domain = the
    Target-URI host, lowercased) -> the :func:`web_prep_batch` fold
    (extraction, C4, Gopher, cross-batch dedup, per-domain caps).
    Returns the started StreamingQuery; results via
    :func:`web_prep_totals`."""
    recs = warc_gz_source(spark, warc_dir)
    pages = warc_response_pages(recs).select("doc_id", "html", "domain")
    return start_web_prep(pages, out_dir, checkpoint_dir,
                          domain_cap=domain_cap,
                          repetition_gate=repetition_gate)


def uri_host(uri_col) -> Column:
    """Stripped lowercased HOST of a URI (ONE rendering of the
    userinfo/port strip — shared by :func:`warc_response_pages` and
    the composed pipeline's detector feed): HOSTPORT_RE group 1 keeps
    userinfo and port, and 'example.com:443' vs 'example.com'
    splitting into separate keys would let a crawl evade per-domain
    caps and per-host pacing per URI variant (review finds r13/r15)."""
    from ..functions.urls import HOSTPORT_RE

    hostport = F.regexp_extract(uri_col, HOSTPORT_RE, 1)
    return F.lower(F.regexp_replace(
        F.regexp_replace(hostport, "^[^@/]*@", ""), r":\d+$", ""))


def warc_response_pages(recs: DataFrame,
                        extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """The ONE warc-records-to-pages rendering (shared by
    :func:`start_warc_web_prep` and :func:`start_frontier_admission` —
    round-15 review find: the projection had been copy-pasted, and a
    host/doc_id fix applied in one place would silently desynchronize
    the prep and admission stages): doc_id = shard_id * 1e6 + rec_idx
    (shard order IS doc order, so folds reproduce the batch pipeline)
    and domain = the Target-URI HOST alone (:func:`uri_host` — the
    one userinfo/port-strip rendering).
    Output: (doc_id, url, html, domain, *extra_cols)."""
    return recs.where(F.col("warc_type") == "response").select(
        (F.col("shard_id") * 1_000_000 + F.col("rec_idx"))
        .alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("payload").alias("html"),
        uri_host(F.col("target_uri")).alias("domain"),
        *extra_cols)


def web_prep_totals(spark, out_dir: str) -> DataFrame:
    """Per-domain corpus stats over the accepted sink — the batch
    capstone's output shape (domain, n_docs, total_words)."""
    docs = spark.read.parquet(f"{out_dir}/docs")
    return docs.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"))


def _warc_gz_binary_stream(spark, path: str, with_filename: bool = False):
    """The ONE binaryFile ingest block for ``.warc.gz`` shard streams
    (shared by warc_gz_source and start_cdx_indexing): shard id from
    the trailing integer of the file name (the writer contract),
    try_cast — not cast — so a glob-matching file violating the
    contract ('backfill.warc.gz') is SKIPPED instead of poison-pilling
    the query on every restart (review find)."""
    raw = (spark.readStream.format("binaryFile")
           .schema("path string, modificationTime timestamp, "
                   "length long, content binary")
           .option("pathGlobFilter", "*.warc.gz").load(path))
    cols = [
        F.regexp_extract(F.col("path"), r"(\d+)\.warc\.gz$", 1)
        .try_cast("long").alias("shard_id"),
        F.col("modificationTime").alias("ingest_ts"),
        "content",
    ]
    if with_filename:
        cols.insert(1, F.element_at(F.split(F.col("path"), "/"), -1)
                    .alias("filename"))
    return raw.select(*cols).where(F.col("shard_id").isNotNull())


def warc_gz_source(spark, path: str, watermark: str = "10 minutes",
                   max_bytes: int | None = None) -> DataFrame:
    """Streaming ingestion of ``.warc.gz`` shards — the container a
    real crawl DELIVERS (CommonCrawl layout: one gzip member per WARC
    record).  Each file landing under ``path`` arrives through Spark's
    ``binaryFile`` stream source as (path, modificationTime, length,
    content); the shard id is the trailing integer of the file name
    (the writer contract, e.g. ``crawl-00042.warc.gz`` -> 42), and
    functions/html.py:parse_warc_gz peels members + records with the
    SAME bounded gunzip and parser renderings as the batch row —
    streaming-safe because that path is one mapInPandas plus
    zero-shuffle expressions (no pin, no join).

    Output: one row per WARC record with the batch columns plus
    ``shard_id``/``ingest_ts`` (file modification time, watermarked —
    the event-time handle downstream corpus stages expect)."""
    from ..functions.html import parse_warc_gz

    media = _warc_gz_binary_stream(spark, path)
    recs = parse_warc_gz(media, id_col="shard_id",
                         max_bytes=max_bytes,
                         carry_cols=("ingest_ts",))
    return recs.withWatermark("ingest_ts", watermark)


def start_cdx_indexing(spark, warc_dir: str, index_dir: str,
                       checkpoint_dir: str,
                       watermark: str = "10 minutes",
                       max_bytes: int | None = None):
    """The STANDING web-archive indexing stream (round 14 — the
    streaming twin of the cdx_index row): ``.warc.gz`` shards landing
    under ``warc_dir`` -> verified gzip member spans + record headers
    (functions/html.py:warc_cdx_entries, every span re-gunzipped from
    its raw slice — the CDX range-request contract) -> SURT urlkeys —
    appended to a parquet index under ``index_dir``.  The whole plan
    is one mapInPandas plus zero-shuffle expressions (no pin, no
    join, no state), so a plain ``writeStream.format("parquet")``
    suffices — no foreachBatch, exactly-once via the checkpoint +
    file-sink log.  Shard id and filename follow the warc_gz_source
    writer contract (trailing integer; non-conforming names
    skipped).  Returns the started StreamingQuery."""
    from ..functions.html import warc_cdx_entries
    from ..functions.urls import surt_key

    media = _warc_gz_binary_stream(spark, warc_dir, with_filename=True)
    ent = warc_cdx_entries(media, id_col="shard_id",
                           max_bytes=max_bytes,
                           carry_cols=("filename", "ingest_ts"))
    idx = ent.withWatermark("ingest_ts", watermark).select(
        "shard_id", "rec_idx",
        F.when(F.col("target_uri") != "",
               surt_key("target_uri")).alias("urlkey"),
        "warc_type", "target_uri", "member_offset", "member_length",
        "payload_md5", "slice_ok", "filename", "ingest_ts")
    return (idx.writeStream.format("parquet")
            .option("path", index_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .start())


# --- The composed multi-stage pipeline (round 15 — VERDICT r14 task 7) -------

def start_frontier_admission(spark, warc_dir: str, frontier_dir: str,
                             admitted_dir: str, checkpoint_dir: str,
                             robots_rules_df: DataFrame | None = None,
                             watermark: str = "10 minutes",
                             max_bytes: int | None = None,
                             deferred_dir: str | None = None,
                             schedule_dir: str | None = None,
                             delays_df: DataFrame | None = None,
                             per_wave: int = 4,
                             default_delay_s: float = 1.0,
                             anomalies_dir: str | None = None):
    """Stage 2 of the composed pipeline: ``.warc.gz`` response records
    become candidate pages and pass, in order, (1) the streaming
    canonical-URL first-arrival dedup (:func:`url_frontier_dedup` —
    bounded watermark state), (2) the stateless robots-directive
    noindex filter (the same folded expression as the batch gate),
    (3) the per-batch FRONTIER-MEMBERSHIP gate — only URLs the
    seeding stage admitted to the frontier sink are accepted (a crawl
    that honors its frontier; the sink is read FRESH each batch, so
    URLs seeded later admit later arrivals), (4) the optional
    robots.txt FILE gate (broadcast rules, longest-match allow-wins).

    A frontier MISS is DEFERRED, not dropped: shard delivery can race
    frontier growth (the seeding stream may simply not have processed
    that sitemap yet), so missed pages append to ``deferred_dir``
    (default ``{admitted_dir}_deferred``) and every later batch
    retries them against the then-current frontier — sink-side state,
    bounded by the miss volume.  A page whose URL is NEVER seeded
    stays in the deferred sink, visible, as the compliance-violation
    residue; an idle stream re-drains the deferral on its next
    arriving batch.  Robots rejections (noindex or robots.txt) are
    permanent drops, matching the batch admission semantics — a
    deferred page that later seeds but robots-rejects gets a
    tombstone under ``{deferred_dir}_rejected`` so it exits the retry
    loop for good instead of re-gating every batch.

    Admitted pages append (doc_id, url, canonical_url, domain, html)
    under ``admitted_dir`` with a sink-side doc_id anti-join so
    replays are idempotent.  When ``schedule_dir`` is given, every
    admitted page ALSO gets a politeness-schedule row there
    (:func:`schedule_accepted_batch` — per-host slot sequences
    continue across batches; ``delays_df`` carries per-host
    Crawl-delay seconds; ``anomalies_dir`` names the rate-detector's
    sink so schedule rows carry the CURRENT backoff).  The schedule
    append goes FIRST: its own sink-side anti-join makes replays
    idempotent, whereas appending it after the admitted write would
    open a crash window in which the replay's admitted anti-join
    excludes the docs and their schedule rows are PERMANENTLY lost
    (the incremental_ingest torn-window analysis).  Returns the
    started StreamingQuery; :func:`start_corpus_pipeline` chains the
    prep stage off the sink."""
    from ..functions.quality import _NOINDEX_TOK_RE, robots_directives
    from ..functions.urls import canonicalize_url

    recs = warc_gz_source(spark, warc_dir, watermark=watermark,
                          max_bytes=max_bytes)
    pages = warc_response_pages(recs, extra_cols=("ingest_ts",))
    frontier = url_frontier_dedup(pages, keep=("domain", "html"))
    # WARC response records carry no separate header column here; the
    # meta-tag arm of the folded directive is the binding one
    indexable = frontier.where(
        ~robots_directives("html").rlike(_NOINDEX_TOK_RE))

    defer_dir = (deferred_dir if deferred_dir is not None
                 else f"{admitted_dir}_deferred")
    # robots-rejection tombstones: a deferred page whose URL is
    # LATER seeded but robots-rejected must exit the retry loop
    # permanently (the docstring's 'permanent drop' contract — without
    # the tombstone it would be re-read and re-gated on every batch
    # forever, and the deferred sink would misreport it as a frontier
    # miss; review find r15)
    reject_dir = f"{defer_dir}_rejected"
    cols = ["doc_id", "url", "canonical_url", "domain", "html"]

    def step(batch_df: DataFrame, batch_id: int) -> None:
        # eager materialization FIRST: the upstream stateful dedup
        # must commit EVERY partition's state even when the gate below
        # admits nothing — an early return over the lazy frame fails
        # STATE_STORE_COMMIT_VALIDATION (partitions never executed),
        # poison-pilling the query (round-15 find).  Batch-sized.
        batch = batch_df.select(*cols).localCheckpoint()
        prior = read_parquet_if_exists(spark, admitted_dir)
        deferred = read_parquet_if_exists(spark, defer_dir)
        # the tombstone sink exists only when a robots gate is
        # configured — without one nothing can ever be rejected, and
        # an unconditional append would grow the sink by one EMPTY
        # part file per micro-batch forever (review find r15)
        rejected = (read_parquet_if_exists(spark, reject_dir)
                    if robots_rules_df is not None else None)
        cand = batch
        if deferred is not None:
            retry = deferred
            if prior is not None:
                retry = retry.join(prior.select("doc_id"), "doc_id",
                                   "left_anti")
            if rejected is not None:
                retry = retry.join(rejected.select("doc_id"), "doc_id",
                                   "left_anti")
            cand = (cand.unionByName(retry)
                    .dropDuplicates(["doc_id"]).localCheckpoint())
        seeded = read_parquet_if_exists(spark, frontier_dir)
        if seeded is None:
            gated = cand.where(F.lit(False))
            missed = batch
        else:
            keys = seeded.select(
                canonicalize_url("url").alias("canonical_url")
            ).distinct().localCheckpoint()
            gated = cand.join(keys, "canonical_url", "left_semi")
            missed = batch.join(keys, "canonical_url", "left_anti")
        gated = gated.localCheckpoint()
        robots_dropped = gated.where(F.lit(False)).select("doc_id")
        if robots_rules_df is not None:
            from ..functions.robots import robots_allowed

            ok = (robots_allowed(gated, robots_rules_df)
                  .where(F.col("allowed") == 1).select("doc_id"))
            robots_dropped = gated.select("doc_id").join(
                ok, "doc_id", "left_anti")
            gated = gated.join(ok, "doc_id", "left_semi")
        out = gated.select(*cols)
        if prior is not None:
            out = out.join(prior.select("doc_id"), "doc_id",
                           "left_anti")
        out = out.localCheckpoint()
        # politeness schedule BEFORE the admitted append — see the
        # docstring's torn-window analysis.  The schedule keys on the
        # pages' stripped DOMAIN (host_col), never a re-derived
        # userinfo/port-carrying authority: the anomaly detector keys
        # its flags on the same stripped host, and an authority key
        # would both miss the backoff join and hand each URI variant
        # its own slot sequence (review find r15 — the pacing-evasion
        # class the r13 domain-cap fix closed)
        if schedule_dir is not None:
            anomalies = (read_parquet_if_exists(spark, anomalies_dir)
                         if anomalies_dir is not None else None)
            schedule_accepted_batch(
                out.select("doc_id", "url", "domain"),
                schedule_dir, per_wave=per_wave, delays=delays_df,
                default_delay_s=default_delay_s, anomalies=anomalies,
                host_col="domain")
        # coalesce(1): each batch's append commits ONE part file, so
        # the downstream prep stage's file stream (which self-triggers
        # concurrently) can never observe a partial multi-part commit
        # and split one batch's rows across its own batches — the
        # frames are batch-sized, so the single-task write is cheap;
        # a production deployment swaps a transactional table in here
        out.coalesce(1).write.mode("append").parquet(admitted_dir)
        # tombstone the robots rejections (idempotent on replay);
        # skipped entirely when no robots gate is configured
        if robots_rules_df is not None:
            if rejected is not None:
                robots_dropped = robots_dropped.join(
                    rejected.select("doc_id"), "doc_id", "left_anti")
            robots_dropped.localCheckpoint().coalesce(1).write.mode(
                "append").parquet(reject_dir)
        # defer the batch's frontier misses not already deferred (the
        # replay-idempotence anti-join); admitted-later rows are
        # excluded at READ time via the prior anti-join above
        if deferred is not None:
            missed = missed.join(deferred.select("doc_id"), "doc_id",
                                 "left_anti")
        missed.localCheckpoint().coalesce(1).write.mode(
            "append").parquet(defer_dir)

    return (
        indexable.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


_ADMITTED_SCHEMA = ("doc_id long, url string, canonical_url string, "
                    "domain string, html string")
_PREP_DOCS_SCHEMA = ("doc_id long, domain string, n_words long, "
                     "fp string, clean_text string")


def start_corpus_pipeline(spark, sitemap_dir: str, warc_dir: str,
                          out_root: str, prior_profile_dir: str,
                          robots_rules_df: DataFrame | None = None,
                          fetch_df: DataFrame | None = None,
                          domain_cap: int = 20,
                          watermark: str = "10 minutes",
                          delays_df: DataFrame | None = None,
                          politeness: bool = True) -> dict:
    """ONE multi-stage checkpointed deployment (round 15, VERDICT r14
    task 7): the standing streams that existed individually, chained
    sink -> source into the 100 TB shape the batch capstones prove
    piecewise::

        sitemap_dir (*.xml.gz)      warc_dir (*.warc.gz)
             |                        |               |
        [seed] sitemap parse      [admit] frontier-   [index] CDX
         -> frontier/              gated admission     entries ->
                                    -> admitted/       index/
                                        |
                                   [prep] extraction/C4/Gopher/
                                    dedup/cap fold -> prep/docs
                                        |
                                   [ingest] cross-snapshot dedup
                                    vs prior_profile_dir -> corpus/

    With ``politeness`` (default on), the crawl loop's TAIL joins the
    composition: a [detect] stage runs the per-host arrival-rate
    anomaly detector over the warc stream (flags under
    ``{out_root}/anomalies`` as event time advances past each
    bucket's watermark), and the admission stage writes a
    politeness-schedule row per admitted page under
    ``{out_root}/schedule`` — per-host slot sequences continuing
    across batches, ``delays_df`` Crawl-delays pacing per slot, and
    the CURRENT anomaly backoff applied (the batch
    crawl_backoff_schedule composition, live).

    Each stage is its OWN checkpointed StreamingQuery (per-stage
    ``{out_root}/_ck/<stage>``) — the standard Spark composition for
    multi-stage streaming: a mid-chain crash restarts that stage from
    its checkpoint while neighbors keep running, and downstream
    stages pick the sink files up exactly-once through the file
    source's seen-file log.  Cross-stage state (frontier membership,
    accepted profiles, domain tallies, schedule offsets) lives on
    SINK parquet, bounded by accepted volume — no unbounded streaming
    state anywhere.

    ``prior_profile_dir`` is the previous crawl's snapshot profile
    (functions/dedup.py:snapshot_profile layout); the final stage
    admits only content unknown to BOTH that snapshot and this run.
    Returns ``{stage: StreamingQuery}`` for seed/index/admit/prep/
    ingest (+ detect when politeness is on) — stop them in reverse
    order or via ``spark.streams.active``."""
    import os as _os

    frontier_dir = f"{out_root}/frontier"
    index_dir = f"{out_root}/index"
    admitted_dir = f"{out_root}/admitted"
    prep_dir = f"{out_root}/prep"
    corpus_dir = f"{out_root}/corpus"
    ck = f"{out_root}/_ck"
    # file stream sources need the directory to EXIST at start; the
    # producing stage may not have appended yet.  The index sink's
    # _spark_metadata dir is pre-created so the detect stage's source
    # commits to metadata-log mode from its first initialization
    # (exactly-once off the sink log) regardless of query start order.
    for d in (admitted_dir, f"{prep_dir}/docs",
              f"{index_dir}/_spark_metadata"):
        _os.makedirs(d, exist_ok=True)

    qs: dict = {}
    qs["seed"] = start_sitemap_seeding(
        sitemap_gz_source(spark, sitemap_dir, watermark=watermark),
        frontier_dir, f"{ck}/seed", fetch_df=fetch_df,
        robots_rules_df=robots_rules_df)
    qs["index"] = start_cdx_indexing(spark, warc_dir, index_dir,
                                     f"{ck}/index",
                                     watermark=watermark)
    anomalies_dir = f"{out_root}/anomalies" if politeness else None
    if politeness:
        from .windows import start_anomaly_detection

        # chained off the INDEX SINK (sink -> source, the prep/ingest
        # posture) instead of a THIRD gunzip+parse pass over the crawl
        # volume (review find r15): the index already carries
        # (warc_type, target_uri, ingest_ts) per record as cheap
        # columnar data, and the file-sink log hands it downstream
        # exactly-once.  Keyed 'host' — the same stripped Target-URI
        # host the schedule keys on (uri_host, one rendering), so the
        # backoff join can never miss per URI variant.
        arrivals = (
            spark.readStream
            .schema("warc_type string, target_uri string, "
                    "ingest_ts timestamp")
            .parquet(index_dir)
            .where(F.col("warc_type") == "response")
            .select(uri_host(F.col("target_uri")).alias("host"),
                    "ingest_ts")
            .withWatermark("ingest_ts", watermark))
        qs["detect"] = start_anomaly_detection(
            arrivals, anomalies_dir, f"{ck}/detect",
            id_col="host", ts_col="ingest_ts")
    qs["admit"] = start_frontier_admission(
        spark, warc_dir, frontier_dir, admitted_dir, f"{ck}/admit",
        robots_rules_df=robots_rules_df, watermark=watermark,
        deferred_dir=f"{out_root}/deferred",
        schedule_dir=(f"{out_root}/schedule" if politeness else None),
        delays_df=delays_df, anomalies_dir=anomalies_dir)
    admitted_stream = (spark.readStream.schema(_ADMITTED_SCHEMA)
                       .parquet(admitted_dir)
                       .select("doc_id", "html", "domain"))
    qs["prep"] = start_web_prep(admitted_stream, prep_dir,
                                f"{ck}/prep", domain_cap=domain_cap,
                                carry_text=True)
    prep_stream = (spark.readStream.schema(_PREP_DOCS_SCHEMA)
                   .parquet(f"{prep_dir}/docs")
                   .select("doc_id",
                           F.col("clean_text").alias("text")))
    qs["ingest"] = start_incremental_ingest(prep_stream,
                                            prior_profile_dir,
                                            corpus_dir, f"{ck}/ingest")
    return qs
