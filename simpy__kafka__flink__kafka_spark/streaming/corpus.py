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

Downstream near-dup (MinHash-LSH) stays a periodic BATCH job over the
deduped sink — candidate generation needs a corpus-wide self-join that no
single watermark horizon can bound; the measured exact-first staging
(PLANS.md: 12x cheaper verify at 20x duplication) is exactly this split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized, quality_score, token_count


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
