"""Streaming corpus ingest: quality gate + bounded-state fingerprint dedup,
and parity with the batch expressions it reuses."""

from __future__ import annotations

import datetime as _dt
import os
import time
import uuid

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.functions.text import (
    normalized, quality_score)
from simpy__kafka__flink__kafka_spark.streaming.corpus import (
    corpus_ingest, file_docs_source)

GOOD = ("the quick brown fox jumps over the lazy dog and keeps running for "
        "a while longer in the field") * 2
JUNK = "!!! ??? ..."


def _ts(s: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(s, tz=_dt.timezone.utc).replace(tzinfo=None)


def _run(spark, tmp_path, batches):
    ind = str(tmp_path / "docs_in")
    os.makedirs(ind, exist_ok=True)
    for rows in batches:
        spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts timestamp"
        ).coalesce(1).write.mode("append").parquet(ind)
        time.sleep(0.05)
    stream = file_docs_source(spark, ind, watermark="10 minutes")
    q = (
        corpus_ingest(stream, min_quality=0.3)
        .writeStream.format("memory")
        .queryName(f"ci_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {q.name}").collect()
    finally:
        q.stop()


def test_dedup_and_quality_gate(spark, tmp_path):
    rows = _run(spark, tmp_path, [
        [(1, GOOD, _ts(10)), (2, JUNK, _ts(11))],
        # 3 duplicates GOOD within the horizon; 4 is new content
        [(3, GOOD, _ts(20)), (4, GOOD + " extra tail words", _ts(21))],
    ])
    ids = sorted(r.doc_id for r in rows)
    assert 2 not in ids              # junk filtered by the quality gate
    assert len([i for i in ids if i in (1, 3)]) == 1  # one fingerprint kept
    assert 4 in ids                  # distinct content passes


def test_emitted_columns_match_batch_expressions(spark, tmp_path):
    rows = _run(spark, tmp_path, [[(1, GOOD, _ts(10))]])
    assert len(rows) == 1
    got = rows[0]
    want = (
        spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
        .select(
            quality_score("text").alias("q"),
            F.md5(normalized("text")).alias("fp"),
        )
        .first()
    )
    assert got.quality == want.q
    assert got.fingerprint == want.fp
    assert got.n_tokens > 0


def _run_near_dup(spark, tmp_path, batches, horizon_ms):
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        streaming_near_dup_candidates)

    ind = str(tmp_path / "nd_in")
    os.makedirs(ind, exist_ok=True)
    for rows in batches:
        spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts timestamp"
        ).coalesce(1).write.mode("append").parquet(ind)
        time.sleep(0.05)
    stream = file_docs_source(spark, ind, watermark="10 minutes")
    q = (
        streaming_near_dup_candidates(stream, horizon_ms=horizon_ms)
        .writeStream.format("memory")
        .queryName(f"nd_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {q.name}").collect()
    finally:
        q.stop()


def test_streaming_near_dup_finds_burst_pairs(spark, tmp_path):
    # two near-identical docs 30 s apart (inside the horizon) must pair;
    # an identical repost 1 h later (outside) must NOT pair with either
    base = GOOD
    variant = GOOD.replace("lazy", "sleepy")
    rows1 = [(1, base, _ts(1000)), (2, variant, _ts(1030)),
             (3, "completely different words about other topics entirely "
                 "nothing shared with the fox sentences at all here",
              _ts(1040))]
    rows2 = [(4, base, _ts(4700))]  # 1h+ later
    got = _run_near_dup(spark, tmp_path, [rows1, rows2], horizon_ms=60_000)
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (1, 2) in pairs
    assert all(4 not in p for p in pairs), pairs
    assert all(3 not in p for p in pairs), pairs


def test_quality_rules_compose_with_stream(spark, tmp_path):
    # the C4/Gopher rules are stateless column expressions, so they bolt
    # onto the ingest stream unchanged — batch/stream parity by
    # construction, asserted here end to end
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        gopher_quality)

    rows = [(1, ("the data of the batch and that stream have merged "
                 "with the table ") * 5, _ts(10)),
            (2, "short", _ts(11))]
    ind = str(tmp_path / "gq_in")
    os.makedirs(ind, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, ingest_ts timestamp"
    ).coalesce(1).write.mode("append").parquet(ind)
    stream = file_docs_source(spark, ind, watermark="10 minutes")
    q = (
        gopher_quality(stream.select("doc_id", "text"))
        .writeStream.format("memory")
        .queryName(f"gq_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.doc_id: r for r in
               spark.sql(f"SELECT * FROM {q.name}").collect()}
    finally:
        q.stop()
    batch = {r.doc_id: r for r in gopher_quality(
        spark.createDataFrame([(d, t) for d, t, _ in rows],
                              "doc_id long, text string")).collect()}
    assert got.keys() == batch.keys()
    for d in got:
        assert got[d].asDict() == batch[d].asDict()
    assert got[1].passes == 1 and got[2].passes == 0


def test_pair_compaction_distinct_batch_parity(spark, tmp_path):
    # end-to-end lambda split: candidate stream -> foreachBatch compaction
    # -> DISTINCT pairs on disk, equal to the batch LSH candidate set even
    # though the stream emits one row per shared band
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        minhash_lsh_pairs)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_pair_compaction, streaming_near_dup_candidates)

    rows = [
        (1, GOOD, _ts(1000)),
        (2, GOOD.replace("fox", "cat"), _ts(1005)),
        (3, "unrelated text with plenty of distinct words in this one "
            "sentence running on for quite some time now", _ts(1010)),
        (4, GOOD.replace("dog", "wolf"), _ts(1015)),
    ]
    ind = str(tmp_path / "pc_in")
    out = str(tmp_path / "pc_pairs")
    ckpt = str(tmp_path / "pc_ckpt")
    os.makedirs(ind, exist_ok=True)
    # two deliveries so the cross-batch anti-join path executes too
    for chunk in (rows[:2], rows[2:]):
        spark.createDataFrame(
            chunk, "doc_id long, text string, ingest_ts timestamp"
        ).coalesce(1).write.mode("append").parquet(ind)
        time.sleep(0.05)
    stream = file_docs_source(spark, ind, watermark="10 minutes")
    q = start_pair_compaction(
        streaming_near_dup_candidates(stream, horizon_ms=600_000), out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink = spark.read.parquet(out).collect()
    got = {(r.doc_a, r.doc_b) for r in sink}
    assert len(sink) == len(got), "compaction left duplicate pairs"
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id long, text string")
    batch_pairs = {(r.doc_a, r.doc_b)
                   for r in minhash_lsh_pairs(docs).collect()}
    assert got == batch_pairs
    assert batch_pairs  # non-vacuous


def test_streaming_near_dup_matches_batch_within_horizon(spark, tmp_path):
    # when every doc arrives inside one horizon, the streaming candidate
    # set must equal the batch minhash_lsh_pairs candidate set
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        minhash_lsh_pairs)

    rows = [
        (1, GOOD, _ts(1000)),
        (2, GOOD.replace("fox", "cat"), _ts(1005)),
        (3, "unrelated text with plenty of distinct words in this one "
            "sentence running on for quite some time now", _ts(1010)),
        (4, GOOD.replace("dog", "wolf"), _ts(1015)),
    ]
    got = _run_near_dup(spark, tmp_path, [rows], horizon_ms=600_000)
    stream_pairs = {(r.doc_a, r.doc_b) for r in got}
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id long, text string")
    batch_pairs = {(r.doc_a, r.doc_b)
                   for r in minhash_lsh_pairs(docs).collect()}
    assert stream_pairs == batch_pairs
    assert batch_pairs  # non-vacuous: the variants really do pair


def test_incremental_ingest_batches_and_replay(spark, tmp_path):
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        incremental_ingest_batch)

    prose_a = ("the quick brown fox jumps over the lazy dog near the "
               "river bank while herons watch the slow water")
    prose_b = ("completely different winter words about the mountain "
               "snow and the long cold silence of the high passes")
    prose_c = ("a third genuinely novel document about harvest moons "
               "and the quiet orchard rows waiting for first frost")

    prior_dir = str(tmp_path / "prior")
    acc = str(tmp_path / "accepted")
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)

    prior_docs = spark.createDataFrame(
        [(1, prose_a)], "doc_id long, text string")
    snapshot_profile(prior_docs).write.parquet(prior_dir)

    # batch 1: a prior exact copy, a near copy, a fresh doc, and TWO
    # batch-internal copies of the same new content
    b1 = spark.createDataFrame(
        [(10, prose_a),                         # known exact
         (11, prose_a + " with a small tail"),  # known near
         (12, prose_b),                         # fresh
         (13, prose_c), (14, prose_c)],         # batch-internal copies
        "doc_id long, text string")
    incremental_ingest_batch(b1, prior_dir, acc)
    got1 = {r["doc_id"] for r in
            spark.read.parquet(f"{acc}/docs").collect()}
    assert got1 == {12, 13}   # keep-first collapsed 14; 10/11 known

    # batch 2: a copy of batch-1-accepted content must now be known
    b2 = spark.createDataFrame(
        [(20, prose_b), (21, "entirely new fifth batch of words about "
                             "ships and the grey harbor dawn light")],
        "doc_id long, text string")
    incremental_ingest_batch(b2, prior_dir, acc)
    got2 = {r["doc_id"] for r in
            spark.read.parquet(f"{acc}/docs").collect()}
    assert got2 == {12, 13, 21}

    # at-least-once replay of batch 2: nothing appended twice
    incremental_ingest_batch(b2, prior_dir, acc)
    rows = spark.read.parquet(f"{acc}/docs").collect()
    assert {r["doc_id"] for r in rows} == {12, 13, 21}
    assert len(rows) == 3


def test_incremental_ingest_live_stream(spark, tmp_path):
    # end-to-end: file stream -> foreachBatch incremental ingest vs a
    # prior profile; accepted sink holds exactly the novel content
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_incremental_ingest)

    prior_docs = spark.createDataFrame(
        [(1, GOOD)], "doc_id long, text string")
    prior_dir = str(tmp_path / "ii_prior")
    snapshot_profile(prior_docs).write.parquet(prior_dir)

    ind = str(tmp_path / "ii_in")
    acc = str(tmp_path / "ii_acc")
    ckpt = str(tmp_path / "ii_ckpt")
    os.makedirs(ind, exist_ok=True)
    rows = [
        (10, GOOD, _ts(1000)),                       # known exact
        (11, "novel words about glass harbors and the slow tide "
             "returning under a pale morning sky", _ts(1005)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, ingest_ts timestamp"
    ).coalesce(1).write.mode("append").parquet(ind)
    stream = file_docs_source(spark, ind, watermark="10 minutes")
    q = start_incremental_ingest(stream, prior_dir, acc, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"] for r in spark.read.parquet(f"{acc}/docs").collect()}
    assert got == {11}
    prof = spark.read.parquet(f"{acc}/profile").collect()
    assert {r["prior_id"] for r in prof} == {11}


def test_streaming_crawl_admission_batch_parity(spark, tmp_path):
    """One fixture through BOTH front doors: the streaming chain
    (url_frontier_dedup -> robots filter -> incremental ingest) must
    accept exactly the docs the batch composition
    (functions/crawl.py:admission_statuses) labels 'admitted'."""
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        admission_statuses)
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_crawl_admission)

    known = ("an old article about river navigation and the barge "
             "schedules of the lower delta published last crawl")
    fresh_a = ("genuinely new reporting on mountain weather stations "
               "and their wind measurements this season")
    fresh_b = ("another novel piece about orchard pollination and the "
               "timing of late spring frosts in the valley")
    page_ok = "<html><head></head><body><p>ok</p></body></html>"
    page_noidx = ('<html><head><meta name="robots" content="index">'
                  '<meta name="robots" content="noindex"></head></html>')
    hdr_ok = "HTTP/1.1 200 OK\r\n"
    hdr_noidx = ("HTTP/1.1 200 OK\r\nX-Robots-Tag: noarchive\r\n"
                 "X-Robots-Tag: noindex\r\n")

    # (doc_id, url, html, headers, text) — arrival order = doc_id order,
    # so streaming keep-first and the batch min(doc_id) keeper agree
    rows = [
        (1, "https://a.example/page?utm_source=x", page_ok, hdr_ok,
         fresh_a),                       # admitted
        (2, "HTTPS://A.example:443/page", page_ok, hdr_ok,
         fresh_b),                       # url dup of 1 -> dropped
        (3, "https://b.example/doc", page_noidx, hdr_ok,
         fresh_b),                       # robots (2nd meta tag)
        (4, "https://c.example/doc", page_ok, hdr_noidx,
         fresh_b),                       # robots (2nd header line)
        (5, "https://d.example/doc", page_ok, hdr_ok,
         known),                         # known content
        (6, "https://e.example/doc", page_ok, hdr_ok,
         fresh_b),                       # admitted
    ]

    prior_dir = str(tmp_path / "ca_prior")
    snapshot_profile(spark.createDataFrame(
        [(100, known)], "doc_id long, text string")
    ).write.parquet(prior_dir)

    # batch path
    docs = spark.createDataFrame(
        [(r[0], r[4]) for r in rows], "doc_id long, text string")
    urls = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "doc_id long, url string")
    pages = spark.createDataFrame(
        [(r[0], r[2], r[3]) for r in rows],
        "doc_id long, html string, headers string")
    prior = spark.read.parquet(prior_dir)
    batch = {r.doc_id: r.status
             for r in admission_statuses(docs, urls, pages, prior,
                                         threshold=0.5).collect()}
    assert batch == {1: "admitted", 2: "url_duplicate",
                     3: "robots_noindex", 4: "robots_noindex",
                     5: "known_content", 6: "admitted"}

    # streaming path — same fixture as a file stream
    ind = str(tmp_path / "ca_in")
    acc = str(tmp_path / "ca_acc")
    ckpt = str(tmp_path / "ca_ckpt")
    os.makedirs(ind, exist_ok=True)
    spark.createDataFrame(
        [(r[0], _ts(1000 + r[0]), r[1], r[2], r[3], r[4]) for r in rows],
        "doc_id long, ingest_ts timestamp, url string, html string, "
        "headers string, text string",
    ).coalesce(1).write.mode("append").parquet(ind)
    stream = (
        spark.readStream.schema(
            "doc_id long, ingest_ts timestamp, url string, html string, "
            "headers string, text string")
        .parquet(ind).withWatermark("ingest_ts", "10 minutes")
    )
    q = start_crawl_admission(stream, prior_dir, acc, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    accepted = {r.doc_id for r in
                spark.read.parquet(f"{acc}/docs").collect()}
    assert accepted == {d for d, s in batch.items() if s == "admitted"}
    # the accepted sink profile covers exactly the admitted docs
    prof = {r.prior_id for r in
            spark.read.parquet(f"{acc}/profile").collect()}
    assert prof == accepted


def test_streaming_crawl_admission_with_robots_txt(spark, tmp_path):
    """Stage 2b: a static robots.txt rules frame gates URLs inside each
    micro-batch — a disallowed path never reaches the accepted sink."""
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)
    from simpy__kafka__flink__kafka_spark.functions.robots import (
        robots_rules)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_crawl_admission)

    page_ok = "<html><head></head><body><p>ok</p></body></html>"
    hdr_ok = "HTTP/1.1 200 OK\r\n"
    rows = [
        (1, "https://a.example/open/one", "fresh text about rivers "
            "and navigation charts"),
        (2, "https://a.example/private/two", "fresh text about canals "
            "and lock mechanisms"),
        (3, "https://b.example/private/three", "fresh text about tides "
            "and moon phases"),
    ]
    robots = robots_rules(spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private/\n")],
        "domain string, robots_txt string"))

    prior_dir = str(tmp_path / "rt_prior")
    snapshot_profile(spark.createDataFrame(
        [(100, "unrelated prior content about glaciers")],
        "doc_id long, text string")).write.parquet(prior_dir)

    ind = str(tmp_path / "rt_in")
    acc = str(tmp_path / "rt_acc")
    ckpt = str(tmp_path / "rt_ckpt")
    os.makedirs(ind, exist_ok=True)
    spark.createDataFrame(
        [(d, _ts(1000 + d), u, page_ok, hdr_ok, t) for d, u, t in rows],
        "doc_id long, ingest_ts timestamp, url string, html string, "
        "headers string, text string",
    ).coalesce(1).write.mode("append").parquet(ind)
    stream = (
        spark.readStream.schema(
            "doc_id long, ingest_ts timestamp, url string, html string, "
            "headers string, text string")
        .parquet(ind).withWatermark("ingest_ts", "10 minutes")
    )
    q = start_crawl_admission(stream, prior_dir, acc, ckpt,
                              robots_rules_df=robots)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.read.parquet(f"{acc}/docs").collect()}
    # doc 2 blocked by a.example's robots.txt; doc 3's host has no rules
    assert got == {1, 3}


def test_warc_gz_stream_matches_batch_parse(spark, tmp_path):
    """Two arrival waves of .warc.gz shards through the binaryFile
    stream source parse to EXACTLY the batch parse_warc_gz rows (the
    gz peel + parser are the same renderings on both paths)."""
    import gzip

    from simpy__kafka__flink__kafka_spark.functions.html import (
        WARC_MARKER, parse_warc_gz)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        warc_gz_source)

    crlf = "\r\n"

    def shard_bytes(sid: int) -> bytes:
        recs = []
        for j in range(2):
            payload = f"payload {sid}-{j} text"
            recs.append(
                WARC_MARKER + "WARC-Type: response" + crlf
                + f"WARC-Target-URI: https://s{sid}.example.com/{j}" + crlf
                + f"Content-Length: {len(payload)}" + crlf + crlf
                + payload)
        return b"".join(gzip.compress(r.encode()) for r in recs)

    ind = str(tmp_path / "shards")
    os.makedirs(ind, exist_ok=True)
    # wave 1: shards 1-2; wave 2: shard 3
    for wave in ([1, 2], [3]):
        for sid in wave:
            with open(f"{ind}/crawl-{sid:05d}.warc.gz", "wb") as f:
                f.write(shard_bytes(sid))
        time.sleep(0.05)

    name = f"wg_{uuid.uuid4().hex[:8]}"
    q = (warc_gz_source(spark, ind)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(f"select * from {name}").drop("ingest_ts").collect()

    media = spark.createDataFrame(
        [(sid, bytearray(shard_bytes(sid))) for sid in (1, 2, 3)],
        "shard_id long, content binary")
    want = parse_warc_gz(media, id_col="shard_id").collect()
    key = lambda r: (r["shard_id"], r["rec_idx"])  # noqa: E731
    assert sorted((tuple(sorted(r.asDict().items())) for r in got)) == \
        sorted((tuple(sorted(r.asDict().items())) for r in want))
    assert len(want) == 6 and all(r["n_members"] == 2 for r in want)
    assert all(r["payload_ok"] == 1 for r in want)


def test_warc_gz_stream_skips_contractless_names(spark, tmp_path):
    """A glob-matching file with no trailing integer must be skipped,
    not poison-pill the query."""
    import gzip

    from simpy__kafka__flink__kafka_spark.functions.html import WARC_MARKER
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        warc_gz_source)

    ind = str(tmp_path / "shards2")
    os.makedirs(ind, exist_ok=True)
    rec = (WARC_MARKER + "WARC-Type: response\r\nContent-Length: 2"
           + "\r\n\r\nok")
    for name in ("crawl-00001.warc.gz", "backfill.warc.gz"):
        with open(f"{ind}/{name}", "wb") as f:
            f.write(gzip.compress(rec.encode()))
    name = f"wg2_{uuid.uuid4().hex[:8]}"
    q = (warc_gz_source(spark, ind)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"select shard_id from {name}").collect()
    assert {r["shard_id"] for r in rows} == {1}


def test_web_prep_streaming_batch_parity_with_restart(spark, tmp_path,
                                                      sf_dir):
    """Round-13 (VERDICT r12 task 6): the streaming web-prep fold over
    doc_id-ordered waves — including a MID-STREAM RESTART from the
    checkpoint — reproduces the batch web capstone's per-domain stats
    exactly.  Cross-batch fingerprint dedup and the per-domain cap
    continuation both fire (sf docs overflow the 20-doc cap)."""
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.html import (
        synthesize_page)
    from simpy__kafka__flink__kafka_spark.plans import registry
    from simpy__kafka__flink__kafka_spark.plans.dataprep import (
        _docs, _sentencified)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_web_prep, web_prep_totals)

    expect = {r["domain"]: (r["n_docs"], r["total_words"])
              for r in registry()["web_prep_full"]
              .build(spark, sf_dir).collect()}
    spark.catalog.clearCache()

    docs = _docs(spark, sf_dir).select(
        "doc_id", _sentencified().alias("text"))
    pages = docs.select(
        "doc_id", synthesize_page().alias("html"),
        F.concat(F.lit("site-"), (F.col("doc_id") % 17).cast("string"),
                 F.lit(".example.com")).alias("domain")).cache()
    n = pages.count()
    cuts = (n // 3, 2 * n // 3)

    ind = str(tmp_path / "wp_in")
    out = str(tmp_path / "wp_out")
    ckpt = str(tmp_path / "wp_ckpt")
    os.makedirs(ind, exist_ok=True)

    def wave(lo, hi):
        (pages.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("append").parquet(ind))

    def stream():
        return (spark.readStream
                .schema("doc_id long, html string, domain string")
                .option("maxFilesPerTrigger", "1").parquet(ind))

    wave(0, cuts[0])
    wave(cuts[0], cuts[1])
    q = start_web_prep(stream(), out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()                       # the restart point

    wave(cuts[1], n + 10)
    q2 = start_web_prep(stream(), out, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    pages.unpersist()

    got = {r["domain"]: (r["n_docs"], r["total_words"])
           for r in web_prep_totals(spark, out).collect()}
    assert got == expect


def test_web_prep_cap_dropped_fp_still_blocks_later_duplicate(
        spark, tmp_path):
    """Review find (round 13): the batch capstone dedups BEFORE the
    domain cap, so a doc dropped by the cap still consumes its
    fingerprint slot — a later same-text doc in ANOTHER domain must
    classify duplicate, not fresh.  Crafted: domain X overflows its
    cap in batch 1 (cap casualty carries text T); batch 2 brings T
    under domain Y."""
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.html import (
        synthesize_page)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        web_prep_batch, web_prep_totals)

    def page_rows(specs):
        # specs: (doc_id, domain, seed) — seed keys the text; same
        # seed => same clean text => same fingerprint
        base = ("quality content about the number NNN with enough "
                "words to clear every gopher rule easily. " * 4)
        rows = [(i, d, base.replace("NNN", str(seed)))
                for i, d, seed in specs]
        df = spark.createDataFrame(
            rows, "doc_id long, domain string, text string")
        return df.select("doc_id", "domain",
                         synthesize_page().alias("html"))

    out = str(tmp_path / "wp2_out")
    # batch 1: domain X gets cap+1 distinct docs; the cap casualty
    # (highest doc_id) carries seed 999
    specs1 = [(i, "x.example.com", i) for i in range(3)] + \
             [(3, "x.example.com", 999)]
    web_prep_batch(page_rows(specs1), out, domain_cap=3)
    # batch 2: same text (seed 999) under a fresh domain
    web_prep_batch(page_rows([(10, "y.example.com", 999)]), out,
                   domain_cap=3)
    totals = {r["domain"]: r["n_docs"]
              for r in web_prep_totals(spark, out).collect()}
    assert totals.get("x.example.com") == 3
    # the batch capstone would drop doc 10 at the dedup stage — so
    # must the fold: domain Y admits nothing
    assert "y.example.com" not in totals


def test_warc_to_web_prep_standing_stream(spark, tmp_path):
    """The full container-to-corpus composition: warc.gz shards ->
    response records -> extraction/quality/dedup/cap fold — two
    arrival waves with a CHECKPOINT RESTART between them, compared
    against one batch fold over the same pages.  Shard order is doc
    order, so the results must be identical."""
    import gzip

    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.html import (
        WARC_MARKER, synthesize_page)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_warc_web_prep, web_prep_batch, web_prep_totals)

    # synthesize page HTML strings through the SAME expression the
    # batch capstone uses (collected here to embed in warc payloads)
    base = ("corpus quality text about the number NNN with plenty of "
            "words to clear every gopher rule comfortably. " * 4)
    texts = [(i, base.replace("NNN", str(i if i % 3 else 99)))
             for i in range(8)]
    tdf = spark.createDataFrame(texts, "doc_id long, text string")
    html = {r["doc_id"]: r["h"] for r in
            tdf.select("doc_id", synthesize_page().alias("h")).collect()}

    crlf = "\r\n"

    def shard_bytes(sid: int, docs: list[int]) -> bytes:
        recs = []
        for j, d in enumerate(docs):
            payload = html[d]
            host = f"site-{d % 2}.example.com"
            recs.append(
                WARC_MARKER + "WARC-Type: response" + crlf
                + f"WARC-Target-URI: https://{host}/p/{d}" + crlf
                + f"Content-Length: {len(payload)}" + crlf + crlf
                + payload)
        return b"".join(gzip.compress(r.encode()) for r in recs)

    ind = str(tmp_path / "wwp_shards")
    out = str(tmp_path / "wwp_out")
    ckpt = str(tmp_path / "wwp_ckpt")
    os.makedirs(ind, exist_ok=True)

    # wave 1: shards 1-2 (docs 0..3); restart; wave 2: shard 3 (4..7)
    with open(f"{ind}/crawl-00001.warc.gz", "wb") as f:
        f.write(shard_bytes(1, [0, 1]))
    with open(f"{ind}/crawl-00002.warc.gz", "wb") as f:
        f.write(shard_bytes(2, [2, 3]))
    q = start_warc_web_prep(spark, ind, out, ckpt, domain_cap=2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    with open(f"{ind}/crawl-00003.warc.gz", "wb") as f:
        f.write(shard_bytes(3, [4, 5, 6, 7]))
    q2 = start_warc_web_prep(spark, ind, out, ckpt, domain_cap=2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {r["domain"]: (r["n_docs"], r["total_words"])
           for r in web_prep_totals(spark, out).collect()}

    # batch expectation: ONE fold over all pages in doc order
    pages = spark.createDataFrame(
        [(sid * 1_000_000 + j, html[d], f"site-{d % 2}.example.com")
         for sid, docs in ((1, [0, 1]), (2, [2, 3]), (3, [4, 5, 6, 7]))
         for j, d in enumerate(docs)],
        "doc_id long, html string, domain string")
    out2 = str(tmp_path / "wwp_batch")
    web_prep_batch(pages, out2, domain_cap=2)
    want = {r["domain"]: (r["n_docs"], r["total_words"])
            for r in web_prep_totals(spark, out2).collect()}
    assert got == want
    # duplicates (docs 0,3,6 share text NNN=99) and the cap both fired
    assert sum(n for n, _ in got.values()) < 8


def test_web_prep_repetition_gate_fold_vs_batch_with_restart(
        spark, tmp_path):
    """Round-14 (VERDICT r13 task 6): the Gopher repetition battery
    rides the standing web-prep stream as a per-doc stateless stage —
    the streamed fold (three waves with a mid-stream checkpoint
    restart) reproduces the one-shot batch fold exactly, and the gate
    actually FIRES (the repetitive docs are dropped in both)."""
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_web_prep, web_prep_batch, web_prep_totals)

    # 40 clean paragraph docs + 10 pathologically repetitive ones the
    # battery must drop (one line duplicated dozens of times)
    rows = []
    for i in range(50):
        if i % 5 == 4:
            body = "please buy these pills now. " * 60
        else:
            body = " ".join(
                f"sentence number {i} word{j} carries real content "
                "and it is long enough to pass the stage filters."
                for j in range(12))
        rows.append((i, f"<html><body><p>{body}</p></body></html>",
                     f"d{i % 4}.example.com"))
    pages = spark.createDataFrame(
        rows, "doc_id long, html string, domain string").cache()
    pages.count()

    batch_out = str(tmp_path / "rep_batch")
    web_prep_batch(pages, batch_out, domain_cap=20,
                   repetition_gate=True)
    expect = {r["domain"]: (r["n_docs"], r["total_words"])
              for r in web_prep_totals(spark, batch_out).collect()}
    # the no-gate fold accepts MORE rows, proving the battery fires
    nogate_out = str(tmp_path / "rep_nogate")
    web_prep_batch(pages, nogate_out, domain_cap=20)
    n_gated = sum(n for n, _ in expect.values())
    n_open = sum(r["n_docs"]
                 for r in web_prep_totals(spark, nogate_out).collect())
    assert n_gated < n_open

    ind = str(tmp_path / "rep_in")
    out = str(tmp_path / "rep_out")
    ckpt = str(tmp_path / "rep_ckpt")
    os.makedirs(ind, exist_ok=True)

    def wave(lo, hi):
        (pages.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("append").parquet(ind))

    def stream():
        return (spark.readStream
                .schema("doc_id long, html string, domain string")
                .option("maxFilesPerTrigger", "1").parquet(ind))

    wave(0, 17)
    wave(17, 34)
    q = start_web_prep(stream(), out, ckpt, repetition_gate=True)
    try:
        q.processAllAvailable()
    finally:
        q.stop()                       # the restart point

    wave(34, 50)
    q2 = start_web_prep(stream(), out, ckpt, repetition_gate=True)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    pages.unpersist()

    got = {r["domain"]: (r["n_docs"], r["total_words"])
           for r in web_prep_totals(spark, out).collect()}
    assert got == expect


def test_cdx_indexing_standing_stream_with_restart(spark, tmp_path):
    """Round-14: the standing warc.gz -> CDX index stream matches the
    batch warc_cdx_entries walk over the same shards — including a
    mid-stream restart from the checkpoint and a contractless file
    name that must be skipped — with urlkeys SURT-derived and every
    member span slice-verified."""
    import gzip

    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.html import (
        warc_cdx_entries)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_cdx_indexing)

    def rec(typ, uri, payload):
        head = (f"WARC/1.0\r\nWARC-Type: {typ}\r\n"
                + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
                + f"Content-Length: {len(payload)}\r\n\r\n")
        return gzip.compress((head + payload).encode())

    def shard(k):
        return (rec("response", f"https://www.Host-{k}.example.org/p/{k}"
                    f"?b=2&a=1", f"body {k}")
                + rec("metadata", None, f"fetchTimeMs: {k}"))

    ind = str(tmp_path / "cdx_in")
    out = str(tmp_path / "cdx_out")
    ckpt = str(tmp_path / "cdx_ckpt")
    os.makedirs(ind, exist_ok=True)
    for k in (0, 1):
        with open(f"{ind}/crawl-{k:05d}.warc.gz", "wb") as fh:
            fh.write(shard(k))
    with open(f"{ind}/backfill.warc.gz", "wb") as fh:
        fh.write(shard(9))            # contractless name -> skipped

    q = start_cdx_indexing(spark, ind, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()                      # the restart point
    with open(f"{ind}/crawl-00002.warc.gz", "wb") as fh:
        fh.write(shard(2))
    q2 = start_cdx_indexing(spark, ind, out, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = spark.read.parquet(out)
    assert got.count() == 6           # 3 shards x 2 records
    assert got.where(F.col("slice_ok") != 1).count() == 0
    r0 = got.where((F.col("shard_id") == 0)
                   & (F.col("warc_type") == "response")).collect()[0]
    assert r0["urlkey"] == "org,example,host-0)/p/0?a=1&b=2"
    assert r0["filename"] == "crawl-00000.warc.gz"
    # stream rows match the batch walk on the conforming shards
    media = spark.createDataFrame(
        [(k, bytearray(shard(k))) for k in (0, 1, 2)],
        "shard_id long, content binary")
    batch = {(r["shard_id"], r["rec_idx"]): (
        r["member_offset"], r["member_length"], r["payload_md5"])
        for r in warc_cdx_entries(media, id_col="shard_id").collect()}
    stream = {(r["shard_id"], r["rec_idx"]): (
        r["member_offset"], r["member_length"], r["payload_md5"])
        for r in got.collect()}
    assert stream == batch
