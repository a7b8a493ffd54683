"""Windowed streaming aggregations (SURVEY.md §2.5 W9 — suggested by the
reference's requirements but implemented there with process functions; here
they are first-class declarative operators).

All take the watermarked span stream from ``pipeline.with_event_time`` and
emit append-mode results as the watermark closes each window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_span_stats(spans: DataFrame, window: str = "1 minute") -> DataFrame:
    """Per-window span counts + latency stats (tumbling event-time window)."""
    return (
        spans.groupBy(F.window("start_ts", window))
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.min("latency_msec").alias("min_latency"),
            F.max("latency_msec").alias("max_latency"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_spans", "min_latency", "max_latency",
        )
    )


def sliding_ip_throughput(spans: DataFrame, window: str = "1 minute",
                          slide: str = "30 seconds") -> DataFrame:
    """Per-destination-IP span throughput over a sliding window."""
    return (
        spans.groupBy(F.window("start_ts", window, slide), "dst_ip")
        .agg(F.count(F.lit(1)).alias("n_calls"))
        .select(
            F.col("window.start").alias("win_start"),
            "dst_ip", "n_calls",
        )
    )


def dedup_spans(spans: DataFrame, bounded_state: bool = True) -> DataFrame:
    """Streaming deduplication by span id — the streaming twin of the batch
    exact-dedup operator, and the standard defense against at-least-once
    source redelivery.

    With ``bounded_state`` (the scale path), duplicates are dropped via
    ``dropDuplicatesWithinWatermark``: each seen-id is remembered only until
    the watermark passes its event time plus the stream's watermark delay,
    so dedup state tracks the duplicate-arrival horizon instead of the whole
    stream history — the input must already carry the ``with_event_time``
    watermark.  ``bounded_state=False`` is unbounded exact dedup (state
    grows with distinct ids — only for bounded replays).
    """
    if bounded_state:
        return spans.dropDuplicatesWithinWatermark(["id"])
    return spans.dropDuplicates(["id"])


def session_ip_activity(spans: DataFrame, gap: str = "30 seconds") -> DataFrame:
    """Per-source-IP activity sessions (gap-based session window — the
    streaming twin of the batch ``sessionize_events`` query)."""
    return (
        spans.groupBy(F.session_window("start_ts", gap), "src_ip")
        .agg(F.count(F.lit(1)).alias("n_spans"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "src_ip", "n_spans",
        )
    )


# --- Streaming rolling-z-score anomaly detection (round 11) --------------------

def score_anomaly_batch(batch_counts: DataFrame, out_dir: str,
                        window: int = 24, min_history: int = 8,
                        z_threshold: int = 3,
                        id_col: str = "user_id") -> None:
    """One micro-batch of FINALIZED bucket counts (id_col, bucket_ts,
    x): anti-join the sink on (key, bucket) for replay idempotence,
    union the sink's history for the touched keys, score the fresh
    buckets with the SAME algebra as the batch operator
    (operators/timeseries.py:score_bucket_counts — parity by
    construction), and append.  Buckets below ``min_history`` land with
    NULL score columns so they can serve as history for later buckets
    (dropping them would permanently understate every successor's
    n_hist).  Watermark-finalized windows emit in event-time order per
    key (the watermark is monotone), so cross-batch history is always
    older than the batch's fresh buckets — the same ordering argument
    as the SCD2 merge.  Sink reads per batch are key-scoped
    (left-semi); production swaps the parquet sink for a keyed MERGE,
    the pair-compaction posture."""
    from ..operators.timeseries import score_bucket_counts
    from .corpus import read_parquet_if_exists

    spark = batch_counts.sparkSession
    fresh = batch_counts.select(id_col, "bucket_ts", "x")
    hist = None
    sink = read_parquet_if_exists(spark, out_dir)
    if sink is not None:
        fresh = fresh.join(sink.select(id_col, "bucket_ts"),
                           [id_col, "bucket_ts"], "left_anti")
        hist = (sink.join(fresh.select(id_col).distinct(), id_col,
                          "left_semi")
                .select(id_col, "bucket_ts",
                        F.col("n_events").alias("x")))
    # materialize: the classification below reads the sink this batch
    # appends to (the incremental-ingest posture)
    fresh = fresh.localCheckpoint()
    both = fresh if hist is None else fresh.unionByName(hist)
    scored = score_bucket_counts(both, window=window,
                                 min_history=min_history,
                                 z_threshold=z_threshold, id_col=id_col)
    out = (
        fresh.join(scored.select(id_col, "bucket_ts", "n_hist",
                                 "z2_scaled", "is_anomaly"),
                   [id_col, "bucket_ts"], "left")
        .select(id_col, "bucket_ts", F.col("x").alias("n_events"),
                "n_hist", "z2_scaled", "is_anomaly")
    )
    out.write.mode("append").parquet(out_dir)


def start_anomaly_detection(events: DataFrame, out_dir: str,
                            checkpoint_dir: str, grid: str = "1 hour",
                            window: int = 24, min_history: int = 8,
                            z_threshold: int = 3,
                            id_col: str = "user_id",
                            ts_col: str = "ts"):
    """Streaming rolling-z-score burst detection — the live twin of the
    ``hourly_anomalies`` batch row: tumbling ``grid`` windows per key
    finalize under the input's watermark (append mode), and each
    micro-batch of finalized counts scores against the persisted
    history via :func:`score_anomaly_batch`.  ``events`` must carry a
    watermark on ``ts_col``.  Returns the started StreamingQuery."""
    counts = (
        events.groupBy(F.window(ts_col, grid).alias("w"),
                       F.col(id_col))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        # integer division — `/` goes through double (the read_events
        # discipline)
        .select(id_col,
                F.expr("unix_micros(w.start) div 1000").alias("bucket_ts"),
                "x")
    )

    def step(batch_df: DataFrame, batch_id: int) -> None:
        score_anomaly_batch(batch_df, out_dir, window=window,
                            min_history=min_history,
                            z_threshold=z_threshold, id_col=id_col)

    return (
        counts.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
