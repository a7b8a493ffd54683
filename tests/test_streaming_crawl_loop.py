"""Round-11 streaming crawl-loop closure: sitemap -> frontier seeding
(streaming/corpus.py:seed_frontier_batch / start_sitemap_seeding) and
the politeness-schedule tail on the admission chain
(schedule_accepted_batch, start_crawl_admission(schedule_dir=...)) —
each proved by pushing ONE fixture through the batch operators and the
streaming path and comparing."""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import functions as F

URLSET_A = """<?xml version="1.0"?>
<urlset>
  <url><loc>https://a.example/page1</loc><lastmod>2026-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.9</priority></url>
  <url><loc>https://a.example/private/secret</loc></url>
  <url><loc>https://a.example/page2</loc><priority>junk</priority></url>
</urlset>"""

INDEX_B = """<?xml version="1.0"?>
<sitemapindex>
  <sitemap><loc>https://b.example/sitemaps/child.xml</loc></sitemap>
</sitemapindex>"""

# the child carries urls AND a nested index entry (must be dropped —
# the one-level recursion bound; the stream is the outer loop)
CHILD_B = """<?xml version="1.0"?>
<urlset>
  <url><loc>https://b.example/doc1</loc><priority>0.4</priority></url>
  <url><loc>https://b.example/private/x</loc></url>
</urlset>
<sitemapindex>
  <sitemap><loc>https://b.example/sitemaps/grandchild.xml</loc></sitemap>
</sitemapindex>"""

ROBOTS = {"a.example": "User-agent: *\nDisallow: /private/\n"
                       "Sitemap: https://a.example/sitemap.xml\n",
          "b.example": "User-agent: *\nDisallow: /private/\n"
                       "Sitemap: https://b.example/sitemap_index.xml\n"}


def _ts(s: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(
        s, tz=_dt.timezone.utc).replace(tzinfo=None)


def _rules(spark):
    from simpy__kafka__flink__kafka_spark.functions.robots import (
        robots_rules)

    robots = spark.createDataFrame(list(ROBOTS.items()),
                                   "domain string, robots_txt string")
    return robots_rules(robots).localCheckpoint()


def test_robots_sitemaps_surface_the_stream_inputs(spark):
    """The composition's first hop: robots Sitemap lines surface
    exactly the files the seeding stream will carry."""
    from simpy__kafka__flink__kafka_spark.functions.robots import (
        robots_sitemaps)

    robots = spark.createDataFrame(list(ROBOTS.items()),
                                   "domain string, robots_txt string")
    got = {(r.domain, r.sitemap_url)
           for r in robots_sitemaps(robots).collect()}
    assert got == {("a.example", "https://a.example/sitemap.xml"),
                   ("b.example", "https://b.example/sitemap_index.xml")}


def test_seed_frontier_batch_parity_recursion_and_replay(spark, tmp_path):
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        seed_frontier_batch)

    frontier = str(tmp_path / "frontier")
    fetch = spark.createDataFrame(
        [("https://b.example/sitemaps/child.xml", CHILD_B)],
        "sitemap_url string, xml string")
    rules = _rules(spark)
    batch = spark.createDataFrame(
        [("a.example", URLSET_A), ("b.example", INDEX_B)],
        "domain string, xml string")
    seed_frontier_batch(batch, frontier, fetch_df=fetch,
                        robots_rules_df=rules)

    got = {(r.domain, r.url): (r.priority, r.lastmod, r.changefreq)
           for r in spark.read.parquet(frontier).collect()}
    # /private/ urls robots-gated on BOTH domains; the child urlset
    # resolved through one recursion level; the grandchild index entry
    # seeds nothing (one-level bound)
    assert set(got) == {("a.example", "https://a.example/page1"),
                        ("a.example", "https://a.example/page2"),
                        ("b.example", "https://b.example/doc1")}
    assert got[("a.example", "https://a.example/page1")] == (
        0.9, "2026-01-02", "daily")
    # junk priority falls back to the protocol default
    assert got[("a.example", "https://a.example/page2")][0] == 0.5
    assert got[("b.example", "https://b.example/doc1")][0] == 0.4

    # replay idempotence: the same batch again appends nothing
    seed_frontier_batch(batch, frontier, fetch_df=fetch,
                        robots_rules_df=rules)
    assert spark.read.parquet(frontier).count() == 3


def test_start_sitemap_seeding_live_stream(spark, tmp_path):
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_sitemap_seeding)

    ind = str(tmp_path / "sm_in")
    frontier = str(tmp_path / "sm_frontier")
    ckpt = str(tmp_path / "sm_ckpt")
    os.makedirs(ind, exist_ok=True)
    spark.createDataFrame(
        [("a.example", URLSET_A, _ts(100)),
         ("b.example", INDEX_B, _ts(101))],
        "domain string, xml string, ingest_ts timestamp",
    ).coalesce(1).write.mode("append").parquet(ind)
    stream = (spark.readStream
              .schema("domain string, xml string, ingest_ts timestamp")
              .parquet(ind).withWatermark("ingest_ts", "10 minutes"))
    fetch = spark.createDataFrame(
        [("https://b.example/sitemaps/child.xml", CHILD_B)],
        "sitemap_url string, xml string")
    q = start_sitemap_seeding(stream, frontier, ckpt, fetch_df=fetch,
                              robots_rules_df=_rules(spark))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.url for r in spark.read.parquet(frontier).collect()}
    assert got == {"https://a.example/page1", "https://a.example/page2",
                   "https://b.example/doc1"}


def test_sitemap_seeding_checkpoint_restart(spark, tmp_path):
    """Stop the seeding query after batch 1, deliver more files, restart
    from the same checkpoint: the frontier ends with exactly the union,
    no duplicates — replayed batches hit the sink anti-join."""
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_sitemap_seeding)

    ind = str(tmp_path / "in")
    frontier = str(tmp_path / "frontier")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ind, exist_ok=True)
    schema = "domain string, xml string, ingest_ts timestamp"

    def deliver(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(ind)

    def run_until_quiet():
        stream = (spark.readStream.schema(schema).parquet(ind)
                  .withWatermark("ingest_ts", "10 minutes"))
        q = start_sitemap_seeding(stream, frontier, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    deliver([("a.example", URLSET_A, _ts(1))])
    run_until_quiet()
    n1 = spark.read.parquet(frontier).count()
    assert n1 == 3          # ungated: both /private/ rows seed too
    deliver([("b.example",
              CHILD_B.replace("sitemapindex>", "ignored>"), _ts(2))])
    run_until_quiet()       # restart from the same checkpoint
    rows = spark.read.parquet(frontier).collect()
    assert len(rows) == 5
    assert len({(r.domain, r.url) for r in rows}) == 5   # no dups


def test_schedule_accepted_batch_folds_to_batch_operator(spark, tmp_path):
    """Folding admitted URLs through per-batch scheduling (in arrival =
    id order) must equal the all-at-once batch crawl_schedule, per-slot
    pacing included."""
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        crawl_schedule)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        schedule_accepted_batch)

    rows = [(i, f"https://h{i % 2}.example/p{i}") for i in range(12)]
    delays = spark.createDataFrame([("h0.example", 3.0)],
                                   "host string, crawl_delay double")
    sched_dir = str(tmp_path / "sched")
    for lo, hi in ((0, 4), (4, 9), (9, 12)):
        batch = spark.createDataFrame(rows[lo:hi],
                                      "doc_id long, url string")
        schedule_accepted_batch(batch, sched_dir, per_wave=2,
                                delays=delays, default_delay_s=1.5)
    got = {r.doc_id: (r.host, r.slot, r.wave, r.not_before_s)
           for r in spark.read.parquet(sched_dir).collect()}
    urls = spark.createDataFrame(rows, "doc_id long, url string")
    want = {r.doc_id: (r.host, r.slot, r.wave, r.not_before_s)
            for r in crawl_schedule(urls, per_wave=2, delays=delays,
                                    default_delay_s=1.5).collect()}
    assert got == want
    # replay idempotence: re-running the middle batch changes nothing
    schedule_accepted_batch(
        spark.createDataFrame(rows[4:9], "doc_id long, url string"),
        sched_dir, per_wave=2, delays=delays, default_delay_s=1.5)
    assert spark.read.parquet(sched_dir).count() == 12


def test_schedule_partial_overlap_replay_stays_dense(spark, tmp_path):
    """A replayed batch PARTIALLY overlapping the sink (half-committed
    append / overlapping caller batches) must rank only its surviving
    rows: ranking before the anti-join would leave the dropped rows'
    ranks as permanent holes in the dense (host, slot) sequence."""
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        schedule_accepted_batch)

    sched_dir = str(tmp_path / "sched")
    a = spark.createDataFrame([(1, "https://h.example/a")],
                              "doc_id long, url string")
    schedule_accepted_batch(a, sched_dir, per_wave=2)
    # replay carries the already-sunk doc 1 plus the new doc 2
    both = spark.createDataFrame(
        [(1, "https://h.example/a"), (2, "https://h.example/b")],
        "doc_id long, url string")
    schedule_accepted_batch(both, sched_dir, per_wave=2)
    got = {r.doc_id: r.slot
           for r in spark.read.parquet(sched_dir).collect()}
    assert got == {1: 0, 2: 1}                   # dense, no hole at 1


def test_admission_with_schedule_tail_end_to_end(spark, tmp_path):
    """The full streaming front door with the politeness tail: admitted
    docs (and ONLY admitted docs) get schedule rows, slots dense per
    host, pacing per the host's Crawl-delay."""
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_crawl_admission)

    page = "<html><body><p>ok</p></body></html>"
    hdr = "HTTP/1.1 200 OK\r\n"
    fresh = ("a genuinely new page about %s with enough words to pass "
             "the gates and some more trailing text")
    rows = [
        (1, "https://s.example/a", fresh % "alpha"),
        (2, "https://s.example/a?utm_source=x", fresh % "beta"),  # url dup
        (3, "https://s.example/b", fresh % "gamma"),
        (4, "https://t.example/c", fresh % "delta"),
    ]
    prior_dir = str(tmp_path / "pp")
    snapshot_profile(spark.createDataFrame(
        [(99, "totally unrelated prior content nothing matches")],
        "doc_id long, text string")).write.parquet(prior_dir)
    ind = str(tmp_path / "in")
    os.makedirs(ind, exist_ok=True)
    spark.createDataFrame(
        [(d, _ts(1000 + d), u, page, hdr, t) for d, u, t in rows],
        "doc_id long, ingest_ts timestamp, url string, html string, "
        "headers string, text string",
    ).coalesce(1).write.mode("append").parquet(ind)
    stream = (spark.readStream.schema(
        "doc_id long, ingest_ts timestamp, url string, html string, "
        "headers string, text string")
        .parquet(ind).withWatermark("ingest_ts", "10 minutes"))
    delays = spark.createDataFrame([("s.example", 7.0)],
                                   "host string, crawl_delay double")
    acc = str(tmp_path / "acc")
    sched = str(tmp_path / "sched")
    q = start_crawl_admission(stream, prior_dir, acc,
                              str(tmp_path / "ck"), keep=("url",),
                              schedule_dir=sched, delays_df=delays,
                              per_wave=4, default_delay_s=1.5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    accepted = {r.doc_id for r in
                spark.read.parquet(f"{acc}/docs").collect()}
    assert accepted == {1, 3, 4}                 # 2 is a url duplicate
    got = {r.doc_id: (r.host, r.slot, r.not_before_s)
           for r in spark.read.parquet(sched).collect()}
    assert set(got) == accepted
    assert got[1] == ("s.example", 0, 0.0)
    assert got[3] == ("s.example", 1, 7.0)       # per-slot Crawl-delay
    assert got[4] == ("t.example", 0, 0.0)       # wave 0 * default


def test_schedule_backoff_folds_to_batch_composition(spark, tmp_path):
    """The anomaly READ side (VERDICT r11 task 9): fold host-keyed
    bucket counts through the streaming anomaly sink in two batches,
    feed that sink into per-batch scheduling, and compare to the
    all-at-once batch composition anomaly_backoff(crawl_schedule(...),
    score_bucket_counts(...)) — parity by the one-rendering
    construction."""
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        anomaly_backoff, crawl_schedule)
    from simpy__kafka__flink__kafka_spark.operators.timeseries import (
        score_bucket_counts)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        schedule_accepted_batch)
    from simpy__kafka__flink__kafka_spark.streaming.windows import (
        score_anomaly_batch)

    # hb bursts at bucket 12 (50 vs calm 1s: 12 zero-variance history
    # buckets flag it); ha stays calm and must keep its cadence
    counts = ([("hb.example", t * 3_600_000, 1 if t != 12 else 50)
               for t in range(16)]
              + [("ha.example", t * 3_600_000, 2) for t in range(16)])
    schema = "host string, bucket_ts long, x long"
    anom_dir = str(tmp_path / "anom")
    for lo, hi in ((0, 10), (10, 16)):   # watermark-ordered fold
        rows = [c for c in counts if lo <= c[1] // 3_600_000 < hi]
        score_anomaly_batch(spark.createDataFrame(rows, schema),
                            anom_dir, id_col="host")
    sink = spark.read.parquet(anom_dir)
    url_rows = [(i, f"https://{'hb' if i % 2 else 'ha'}.example/p{i}")
                for i in range(10)]
    delays = spark.createDataFrame([("hb.example", 2.0)],
                                   "host string, crawl_delay double")
    sched_dir = str(tmp_path / "sched")
    for lo, hi in ((0, 6), (6, 10)):
        batch = spark.createDataFrame(url_rows[lo:hi],
                                      "doc_id long, url string")
        schedule_accepted_batch(batch, sched_dir, per_wave=2,
                                delays=delays, anomalies=sink)
    cols = ("host", "slot", "wave", "not_before_s", "n_anomalies",
            "not_before_backoff_s")
    got = {r.doc_id: tuple(r[c] for c in cols)
           for r in spark.read.parquet(sched_dir).collect()}
    urls = spark.createDataFrame(url_rows, "doc_id long, url string")
    batch_anom = score_bucket_counts(
        spark.createDataFrame(counts, schema), id_col="host")
    want = {r.doc_id: tuple(r[c] for c in cols)
           for r in anomaly_backoff(
               crawl_schedule(urls, per_wave=2, delays=delays),
               batch_anom).collect()}
    assert got == want
    # not vacuous: the burst host backed off 4x, the calm host did not
    hb = {k: v for k, v in want.items() if v[0] == "hb.example"}
    ha = {k: v for k, v in want.items() if v[0] == "ha.example"}
    assert all(v[4] > 0 and v[5] == round(v[3] * 4, 6)
               for v in hb.values())
    assert all(v[4] == 0 and v[5] == v[3] for v in ha.values())


def test_schedule_sink_schema_stable_without_anomalies(spark, tmp_path):
    """Round-12 review fix: batches scheduled BEFORE the detector sink
    exists must write the same 7-column schema (NULL flags), so a
    warmed-up loop never produces a mixed-schema parquet directory."""
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        schedule_accepted_batch)

    sched_dir = str(tmp_path / "sched")
    schedule_accepted_batch(
        spark.createDataFrame([(1, "https://h.example/a")],
                              "doc_id long, url string"), sched_dir)
    sink = spark.read.parquet(sched_dir)
    counts = spark.createDataFrame(
        [("h.example", t * 3_600_000, 1 if t != 12 else 99)
         for t in range(16)], "host string, bucket_ts long, x long")
    from simpy__kafka__flink__kafka_spark.operators.timeseries import (
        score_bucket_counts)

    schedule_accepted_batch(
        spark.createDataFrame([(2, "https://h.example/b")],
                              "doc_id long, url string"), sched_dir,
        anomalies=score_bucket_counts(counts, id_col="host"))
    rows = {r.doc_id: r for r in spark.read.parquet(sched_dir).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_anomalies is None          # pre-detector batch
    assert rows[1].not_before_backoff_s is None
    assert rows[2].n_anomalies == 1             # the bucket-12 burst
    assert rows[2].not_before_backoff_s == rows[2].not_before_s * 4


def test_admission_schedule_reads_anomaly_sink_live(spark, tmp_path):
    """The crawl loop's read side composed END-TO-END in streaming
    (round 12): the rate detector's sink feeds the front door's
    politeness tail, so a host whose fetch-rate buckets flagged backs
    off 4x while calm hosts keep their cadence — and a pre-detector
    run leaves NULL flags under the SAME sink schema."""
    import datetime as dt

    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_crawl_admission)
    from simpy__kafka__flink__kafka_spark.streaming.windows import (
        score_anomaly_batch)

    # detector sink: s.example bursts (12 calm buckets then 99), t calm
    counts = ([("s.example", t * 3_600_000, 1 if t != 12 else 99)
               for t in range(16)]
              + [("t.example", t * 3_600_000, 2) for t in range(16)])
    anom = str(tmp_path / "anom")
    score_anomaly_batch(
        spark.createDataFrame(counts,
                              "host string, bucket_ts long, x long"),
        anom, id_col="host")
    page = "<html><body><p>ok</p></body></html>"
    hdr = "HTTP/1.1 200 OK\r\n"
    fresh = ("a genuinely new page about %s with enough words to pass "
             "the gates and some more trailing text")
    rows = [(1, "https://s.example/a", fresh % "alpha"),
            (2, "https://s.example/b", fresh % "beta"),
            (3, "https://t.example/c", fresh % "gamma")]
    prior = str(tmp_path / "pp")
    snapshot_profile(spark.createDataFrame(
        [(99, "totally unrelated prior content nothing matches")],
        "doc_id long, text string")).write.parquet(prior)
    ind = str(tmp_path / "in")
    os.makedirs(ind, exist_ok=True)
    spark.createDataFrame(
        [(d, _ts(1000 + d), u, page, hdr, t) for d, u, t in rows],
        "doc_id long, ingest_ts timestamp, url string, html string, "
        "headers string, text string",
    ).coalesce(1).write.mode("append").parquet(ind)
    stream = (spark.readStream.schema(
        "doc_id long, ingest_ts timestamp, url string, html string, "
        "headers string, text string")
        .parquet(ind).withWatermark("ingest_ts", "10 minutes"))
    delays = spark.createDataFrame([("s.example", 7.0)],
                                   "host string, crawl_delay double")
    sched = str(tmp_path / "sched")
    q = start_crawl_admission(stream, prior, str(tmp_path / "acc"),
                              str(tmp_path / "ck"), keep=("url",),
                              schedule_dir=sched, delays_df=delays,
                              per_wave=4, default_delay_s=1.5,
                              anomalies_dir=anom)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id: r for r in spark.read.parquet(sched).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2].n_anomalies >= 1               # the burst host
    assert got[2].not_before_backoff_s == round(
        got[2].not_before_s * 4, 6)
    assert got[3].n_anomalies == 0               # calm host: no backoff
    assert got[3].not_before_backoff_s == got[3].not_before_s


def test_anomaly_flags_age_out_of_the_backoff(spark, tmp_path):
    """Round-12 review fix: the detector sink is append-only HISTORY —
    a host that burst once on day one must NOT stay backed off forever.
    Flags older than max_age_buckets of DATA time (vs the sink's latest
    bucket) age out of the streaming schedule's backoff."""
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        anomaly_backoff, crawl_schedule)
    from simpy__kafka__flink__kafka_spark.operators.timeseries import (
        score_bucket_counts)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        schedule_accepted_batch)

    # old.example bursts at bucket 12 then stays calm for 40 buckets;
    # hot.example bursts at the LATEST bucket
    counts = ([("old.example", t * 3_600_000,
                1 if t != 12 else 99) for t in range(52)]
              + [("hot.example", t * 3_600_000,
                  1 if t != 51 else 99) for t in range(52)])
    scored = score_bucket_counts(
        spark.createDataFrame(counts,
                              "host string, bucket_ts long, x long"),
        id_col="host")
    urls = spark.createDataFrame(
        [(1, "https://old.example/a"), (2, "https://hot.example/b")],
        "doc_id long, url string")
    delays = spark.createDataFrame([("old.example", 1.0)],
                                   "host string, crawl_delay double")
    aged = {r.host: r for r in anomaly_backoff(
        crawl_schedule(urls, delays=delays), scored,
        max_age_buckets=24).collect()}
    assert aged["hot.example"].n_anomalies >= 1
    assert aged["old.example"].n_anomalies == 0      # aged out
    # the streaming schedule applies the horizon by default
    sched_dir = str(tmp_path / "sched")
    schedule_accepted_batch(urls, sched_dir, anomalies=scored)
    got = {r.host: r for r in spark.read.parquet(sched_dir).collect()}
    assert got["old.example"].n_anomalies == 0
    assert got["hot.example"].n_anomalies >= 1


def test_read_parquet_if_exists_tolerates_empty_dir(spark, tmp_path):
    """Round-12 review fix: two streaming queries share a sink — the
    reader can observe the directory CREATED but with no committed
    parquet yet (UNABLE_TO_INFER_SCHEMA), which must read as
    'no sink yet', not kill the admission stream."""
    import os

    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        read_parquet_if_exists)

    missing = str(tmp_path / "nope")
    assert read_parquet_if_exists(spark, missing) is None
    empty = str(tmp_path / "mid-flight")
    os.makedirs(empty)
    assert read_parquet_if_exists(spark, empty) is None
    spark.createDataFrame([(1,)], "x long").write.parquet(
        str(tmp_path / "real"))
    assert read_parquet_if_exists(
        spark, str(tmp_path / "real")).count() == 1


def test_sitemap_gz_source_feeds_seeding(spark, tmp_path):
    """Round 13: gzipped sitemap FILES (the protocol's delivery
    shape) stream through sitemap_gz_source — host from the file
    name, bounded gunzip, non-conforming names skipped — into the
    same seeding fold, producing the same frontier rows as the plain
    stream."""
    import gzip

    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        sitemap_gz_source, start_sitemap_seeding)

    ind = str(tmp_path / "smgz_in")
    frontier = str(tmp_path / "smgz_frontier")
    ckpt = str(tmp_path / "smgz_ckpt")
    os.makedirs(ind, exist_ok=True)
    with open(f"{ind}/a.example.sitemap.xml.gz", "wb") as f:
        f.write(gzip.compress(URLSET_A.encode()))
    # a concatenated two-member file (legal gzip, real servers emit it)
    half = len(INDEX_B) // 2
    with open(f"{ind}/b.example.sitemap-1.xml.gz", "wb") as f:
        f.write(gzip.compress(INDEX_B[:half].encode())
                + gzip.compress(INDEX_B[half:].encode()))
    with open(f"{ind}/not-a-sitemap.xml.gz", "wb") as f:
        f.write(gzip.compress(b"<urlset></urlset>"))  # skipped: no contract name

    fetch = spark.createDataFrame(
        [("https://b.example/sitemaps/child.xml", CHILD_B)],
        "sitemap_url string, xml string")
    q = start_sitemap_seeding(sitemap_gz_source(spark, ind), frontier,
                              ckpt, fetch_df=fetch,
                              robots_rules_df=_rules(spark))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.url for r in spark.read.parquet(frontier).collect()}
    assert got == {"https://a.example/page1", "https://a.example/page2",
                   "https://b.example/doc1"}
