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
