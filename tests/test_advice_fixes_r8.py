"""Regression tests for the round-7 ADVICE findings fixed in round 8:

1. html.py `parse_warc_records` emitted NULL payload_ok (not 0) for
   records lacking a Content-Length header — now coalesced to int 0,
   matching the documented contract and the DuckDB oracle's CASE..ELSE 0.
2. streaming/corpus.py pair compaction treated ANY sink-read failure as
   "first batch" (bare except), silently skipping the anti-join — now
   only the missing-path case skips; corrupt sinks re-raise.
3. __spark_entry__.queries() called spark.catalog.clearCache(), dropping
   consumer-owned caches too — now unpersists only the registry's
   tracked pins (cachepin.pin / unpin_all).
4. bpe_import unconditionally validated well-formedness, so fold-only
   artifacts bpe_export happily produced could not round-trip — now
   validate=True is opt-out.
5. ngram_cms oracle SQL inner-joined probe buckets to touched cells;
   for a probe hashing into an untouched cell the engines diverged —
   oracle now LEFT JOINs with COALESCE(cnt, 0), mirroring cms_estimate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_warc_missing_content_length_payload_ok_zero(spark):
    from simpy__kafka__flink__kafka_spark.functions.html import (
        parse_warc_records)

    warc = ("WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            "WARC-Target-URI: http://a.example/\r\n"
            "\r\n"
            "payload without declared length")
    df = spark.createDataFrame([(1, warc)], "doc_id long, warc string")
    [row] = parse_warc_records(df).collect()
    assert row["content_length"] == -1
    assert row["payload_ok"] == 0          # int 0, not NULL


def test_pair_compaction_reraises_on_corrupt_sink(spark, tmp_path):
    from pyspark.errors import AnalysisException

    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        compact_pair_batch)

    pairs = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 4)], "doc_a long, doc_b long")

    # first batch: sink missing -> anti-join skipped, append happens
    sink = str(tmp_path / "pairs")
    compact_pair_batch(pairs, sink)
    assert spark.read.parquet(sink).count() == 2  # batch-distinct applied

    # replayed batch: anti-join drops everything already compacted
    compact_pair_batch(pairs, sink)
    assert spark.read.parquet(sink).count() == 2

    # corrupt sink (a non-parquet file at the path) must RAISE, not
    # silently append duplicates
    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        compact_pair_batch(pairs, str(corrupt))


def test_queries_wrapper_preserves_consumer_caches(spark, sf_dir):
    import __spark_entry__ as entry_mod

    # a cache the CONSUMER owns — the wrapper must not drop it
    mine = spark.range(100).withColumn("v", F.col("id") * 2).cache()
    mine.count()
    assert mine.storageLevel.useMemory

    qs = entry_mod.queries()
    # near_dup_verified pins shingle + candidate frames via cachepin
    qs["near_dup_verified"](spark, sf_dir).collect()
    # building the NEXT query unpins the previous query's tracked caches
    qs["exact_dedup"](spark, sf_dir).collect()

    assert mine.storageLevel.useMemory, \
        "registry wrapper dropped a consumer-owned cache"
    mine.unpersist()


def test_unpin_all_drops_only_tracked(spark):
    from simpy__kafka__flink__kafka_spark.cachepin import pin, unpin_all

    tracked = pin(spark.range(10))
    tracked.count()
    untracked = spark.range(20).cache()
    untracked.count()
    assert tracked.storageLevel.useMemory
    unpin_all()
    assert not tracked.storageLevel.useMemory
    assert untracked.storageLevel.useMemory
    untracked.unpersist()


def test_bpe_import_fold_only_roundtrip():
    from simpy__kafka__flink__kafka_spark.functions.bpe import (
        bpe_export, bpe_import)

    # fold-only merge list: references the multi-char symbol "ab" with no
    # earlier merge producing it -- fine for sequential fold application
    # (where "ab" simply never matches) but rejected by strict
    # well-formedness validation
    fold_only = [("ab", "c", 5)]
    art = bpe_export(fold_only)
    with pytest.raises(ValueError):
        bpe_import(art)
    assert bpe_import(art, validate=False) == fold_only


def test_ngram_cms_oracle_untouched_cell_estimates_zero():
    """The generic-operator divergence the r7 ADVICE flagged: a probe
    item whose buckets all land in untouched cells.  DuckDB-only check
    that the fixed oracle JOIN shape (LEFT JOIN + COALESCE 0) returns 0
    for such a probe instead of dropping/overestimating it."""
    import duckdb

    con = duckdb.connect()
    # stream = one item "x"; probe = "x" plus an absent item "zz" whose
    # cells are untouched (md5-derived buckets differ with prob ~1)
    sql = """
WITH sh AS (SELECT 'x' AS shingle UNION ALL SELECT 'x'),
probes AS (SELECT 'x' AS shingle UNION ALL SELECT 'zz'),
b AS (
  SELECT shingle, d.depth,
         (strpos('0123456789abcdef',
                 substr(md5('cms' || d.depth || ':' || shingle), 1, 1)) - 1)
         % 16 AS bucket
  FROM sh, (SELECT 0 AS depth UNION ALL SELECT 1) d
),
cells AS (SELECT depth, bucket, CAST(count(*) AS BIGINT) AS cnt
          FROM b GROUP BY 1, 2),
pb AS (
  SELECT shingle, d.depth,
         (strpos('0123456789abcdef',
                 substr(md5('cms' || d.depth || ':' || shingle), 1, 1)) - 1)
         % 16 AS bucket
  FROM probes, (SELECT 0 AS depth UNION ALL SELECT 1) d
)
SELECT pb.shingle, min(COALESCE(c.cnt, 0)) AS est
FROM pb LEFT JOIN cells c ON c.depth = pb.depth AND c.bucket = pb.bucket
GROUP BY 1 ORDER BY 1
"""
    rows = con.execute(sql).fetchall()
    got = dict(rows)
    assert got["x"] == 2
    # 'zz' must appear with estimate 0 (the INNER JOIN form dropped it
    # or, worse, matched a colliding cell)
    assert "zz" in got
