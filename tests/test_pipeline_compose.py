"""The composed multi-stage streaming pipeline (round 15, VERDICT r14
task 7): sitemap seeding -> frontier-gated admission -> web prep ->
CDX indexing -> cross-snapshot dedup-ingest as ONE five-query
checkpointed deployment (streaming/corpus.py:start_corpus_pipeline),
driven at x10 the unit-test corpus with a MID-CHAIN restart (upstream
stages had consumed wave 2, downstream stages had not) and compared
against a single uninterrupted run over identical input.
"""
from __future__ import annotations

import gzip
import os

import pytest


def _mk_fixture(spark, n_docs: int):
    """n_docs pages over 2 hosts: shingle-disjoint quality texts with
    a duplicate group confined to the first shard (i < 20, i % 3 == 0
    all share one text); doc 5 carries a robots noindex meta tag."""
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.html import (
        synthesize_page)

    # every 5-shingle of a doc contains a doc-unique token, so DISTINCT
    # docs share zero shingles and the final ingest stage's near-dup
    # classifier cannot cross-fire (a shared base text classified the
    # whole corpus near_known vs the one-doc prior — round-15 fixture
    # find); the duplicate group (i % 3 == 0) is CONFINED to the first
    # shard's docs (i < 20): web_prep's keep-first is arrival-order
    # dependent across micro-batches by documented contract, so a dup
    # group spanning shards makes WHICH copy survives depend on how
    # the file source happens to split batches (observed flake) —
    # confined to one shard, the in-batch min-doc_id rule always picks
    # doc 0.  Stopwords interleave to keep gopher green.
    def text_of(i: int) -> str:
        eff = i if (i % 3 or i >= 20) else 99
        return " ".join(
            f"the word t{eff}a{j} sits with t{eff}b{j} and then "
            f"t{eff}c{j} appears." for j in range(10))

    texts = [(i, text_of(i)) for i in range(n_docs)]
    tdf = spark.createDataFrame(texts, "doc_id long, text string")
    html = {r["doc_id"]: r["h"] for r in
            tdf.select("doc_id", synthesize_page().alias("h")).collect()}
    if 5 in html:
        html[5] = '<meta name="robots" content="noindex">' + html[5]
    return html


def _write_sitemaps(path: str, docs: list[int]) -> None:
    os.makedirs(path, exist_ok=True)
    for host_i in (0, 1):
        urls = "".join(
            f"<url><loc>https://site-{host_i}.example.com/p/{d}</loc>"
            "</url>"
            for d in docs if d % 2 == host_i)
        xml = f'<?xml version="1.0"?><urlset>{urls}</urlset>'
        name = f"site-{host_i}.example.com.sitemap-{min(docs)}.xml.gz"
        with open(f"{path}/{name}", "wb") as f:
            f.write(gzip.compress(xml.encode()))


def _write_shards(path: str, html: dict, shards: list[tuple[int, list[int]]],
                  unseeded_in: int | None = None,
                  extra: dict[int, list[tuple[str, int]]] | None = None,
                  ) -> None:
    """``extra`` maps shard id -> [(uri, doc)] records appended after
    the shard's regular members — ONE rec() rendering for every
    fixture record in this file."""
    from simpy__kafka__flink__kafka_spark.functions.html import (
        WARC_MARKER)

    os.makedirs(path, exist_ok=True)
    crlf = "\r\n"

    def rec(uri: str, payload: str) -> bytes:
        return gzip.compress(
            (WARC_MARKER + "WARC-Type: response" + crlf
             + f"WARC-Target-URI: {uri}" + crlf
             + f"Content-Length: {len(payload)}" + crlf + crlf
             + payload).encode())

    for sid, docs in shards:
        members = [rec(f"https://site-{d % 2}.example.com/p/{d}",
                       html[d]) for d in docs]
        if unseeded_in == sid:
            members.append(rec(
                "https://site-0.example.com/unseeded/999", html[docs[0]]))
        for uri, d in (extra or {}).get(sid, []):
            members.append(rec(uri, html[d]))
        with open(f"{path}/crawl-{sid:05d}.warc.gz", "wb") as f:
            f.write(b"".join(members))


def _drain(qs: dict) -> None:
    """Process pending input through the chain in topological order —
    run the full order twice so sink files appended by an upstream
    stage in pass 1 are consumed downstream in pass 2."""
    for _ in range(2):
        for name in ("seed", "detect", "admit", "index", "prep",
                     "ingest"):
            if name in qs:
                qs[name].processAllAvailable()


def _stop(qs: dict) -> None:
    for q in qs.values():
        q.stop()


def _corpus_state(spark, root: str):
    idx = spark.read.parquet(f"{root}/index")
    prep = spark.read.parquet(f"{root}/prep/docs")
    corpus = spark.read.parquet(f"{root}/corpus/docs")
    return (
        {(r.shard_id, r.rec_idx, r.urlkey, r.payload_md5, r.slice_ok)
         for r in idx.collect()},
        {(r.doc_id, r.domain, r.n_words, r.fp) for r in prep.collect()},
        {(r.doc_id, r.text) for r in corpus.collect()},
    )


def test_composed_pipeline_mid_chain_restart_parity(spark, tmp_path):
    from simpy__kafka__flink__kafka_spark.functions.dedup import (
        snapshot_profile)
    from simpy__kafka__flink__kafka_spark.functions.html import (
        extract_main_content)
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        c4_sentence_filter)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_corpus_pipeline)

    N = 80                                   # x10 the unit fixture
    html = _mk_fixture(spark, N)

    # prior snapshot knows doc 1's CLEAN text -> the ingest stage must
    # classify it exact_known and keep it out of the corpus sink
    pages1 = spark.createDataFrame([(1, html[1])],
                                   "doc_id long, html string")
    clean1 = (c4_sentence_filter(
        extract_main_content(pages1).select("doc_id", "main_text"),
        text_col="main_text")
        .where("doc_kept = 1").select("doc_id", "clean_text")
        .collect()[0]["clean_text"])
    prior_dir = str(tmp_path / "prior")
    snapshot_profile(spark.createDataFrame(
        [(900, clean1)], "doc_id long, text string")
    ).write.parquet(prior_dir)

    wave1_docs = list(range(0, 40))
    wave2_docs = list(range(40, N))
    shards1 = [(1, wave1_docs[:20]), (2, wave1_docs[20:])]
    shards2 = [(3, wave2_docs[:20]), (4, wave2_docs[20:])]

    # --- staged run: wave 1, MID-CHAIN stop, wave 2, restart --------
    # frontier-before-fetch ordering (the real crawl sequence): the
    # sitemaps seed first, shards land after — the pre-seed race is
    # covered separately by test_admission_defers_pre_seed_pages
    sm = str(tmp_path / "sm")
    wc = str(tmp_path / "wc")
    root = str(tmp_path / "staged")
    os.makedirs(wc, exist_ok=True)
    _write_sitemaps(sm, wave1_docs)
    qs = start_corpus_pipeline(spark, sm, wc, root, prior_dir,
                               domain_cap=50)
    try:
        qs["seed"].processAllAvailable()
        _write_shards(wc, html, shards1, unseeded_in=1)
        _drain(qs)
        # the downstream stages stop FIRST, then wave 2 lands and only
        # the upstream stages consume it — the mid-chain restart
        # point: admitted/index carry wave 2, prep/ingest verifiably
        # have not seen it and must recover it from their checkpoints
        qs["ingest"].stop()
        qs["prep"].stop()
        _write_sitemaps(sm, wave2_docs)
        qs["seed"].processAllAvailable()
        _write_shards(wc, html, shards2)
        qs["admit"].processAllAvailable()
        qs["index"].processAllAvailable()
    finally:
        _stop(qs)
    qs = start_corpus_pipeline(spark, sm, wc, root, prior_dir,
                               domain_cap=50)
    try:
        _drain(qs)
    finally:
        _stop(qs)
    staged = _corpus_state(spark, root)

    # --- uninterrupted run over identical input ---------------------
    sm2 = str(tmp_path / "sm2")
    wc2 = str(tmp_path / "wc2")
    root2 = str(tmp_path / "single")
    os.makedirs(wc2, exist_ok=True)
    _write_sitemaps(sm2, wave1_docs)
    _write_sitemaps(sm2, wave2_docs)
    qs = start_corpus_pipeline(spark, sm2, wc2, root2, prior_dir,
                               domain_cap=50)
    try:
        qs["seed"].processAllAvailable()
        _write_shards(wc2, html, shards1 + shards2, unseeded_in=1)
        _drain(qs)
    finally:
        _stop(qs)
    single = _corpus_state(spark, root2)

    assert staged == single                 # restart parity, all sinks

    idx, prep, corpus = staged
    # the index covers every response record incl. the unseeded page
    # (indexing is archival, not admission) with verified spans
    assert len(idx) == N + 1
    assert all(s == 1 for (_, _, _, _, s) in idx)
    # admission: the unseeded page and the noindex doc never reached
    # the admitted sink (frontier gate / directive filter)
    admitted = spark.read.parquet(f"{root}/admitted").collect()
    urls = {r.url for r in admitted}
    assert not any("unseeded" in u for u in urls)
    assert "https://site-1.example.com/p/5" not in urls
    assert len(admitted) == N - 1            # everything else passed

    def orig(doc_id: int) -> int:
        sid, j = doc_id // 1_000_000, doc_id % 1_000_000
        return {1: 0, 2: 20, 3: 40, 4: 60}[sid] + j

    # prep deduped the shard-1 dup group down to ONE survivor (doc 0,
    # the smallest doc_id in the one batch that carries the group)
    # and kept every unique doc
    dup_set = {o for o in range(20) if o % 3 == 0}
    prep_orig = {orig(d) for (d, _, _, _) in prep}
    assert prep_orig & dup_set == {0}
    assert prep_orig == (set(range(N)) - dup_set | {0}) - {5}
    # the ingest stage excluded exactly the prior-known clean text
    assert len(corpus) == len(prep) - 1
    corpus_orig = {orig(d) for (d, _) in corpus}
    assert prep_orig - corpus_orig == {1}

    # the never-seeded page sits in the deferred sink — visible
    # compliance-violation residue, not a silent drop
    deferred = spark.read.parquet(f"{root}/deferred").collect()
    assert {r.url for r in deferred} == {
        "https://site-0.example.com/unseeded/999"}

    # the politeness tail: every admitted page got a schedule row,
    # per-host slot sequences are DENSE across batches and the
    # restart, and no anomaly bucket can FLAG inside the test horizon
    # (rows read 0 once the detector sink exists, NULL before — both
    # mean un-backed-off; never a narrower schema)
    sched = spark.read.parquet(f"{root}/schedule").collect()
    assert len(sched) == len(admitted)
    slots: dict = {}
    for r in sched:
        slots.setdefault(r.host, []).append(r.slot)
    for host, ss in slots.items():
        assert sorted(ss) == list(range(len(ss))), host
    assert all((r.n_anomalies or 0) == 0 for r in sched)


def test_admission_robots_tombstone_and_pacing(spark, tmp_path):
    """The robots.txt arm of the composed admission: a seeded page
    robots-rejected gets a PERMANENT tombstone (exactly one row, not
    retried or re-tombstoned on later batches), and the politeness
    schedule keys on the STRIPPED host (a ported URI variant shares
    its host's slot sequence and Crawl-delay pacing — the r15 review
    find) with per-slot pacing for delay-carrying hosts."""
    from simpy__kafka__flink__kafka_spark.functions.robots import (
        robots_rules)
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_frontier_admission)

    html = _mk_fixture(spark, 6)
    wc = str(tmp_path / "wc")
    frontier = str(tmp_path / "frontier")
    admitted = str(tmp_path / "admitted")
    sched = str(tmp_path / "sched")
    ckpt = str(tmp_path / "ckpt")

    # frontier: docs 0..5 seeded, doc 1 additionally via a PORTED URI
    rows = [(f"site-{d % 2}.example.com",
             f"https://site-{d % 2}.example.com/p/{d}")
            for d in range(6)]
    rows.append(("site-1.example.com",
                 "https://site-1.example.com:8443/p/1"))
    spark.createDataFrame(rows, "domain string, url string") \
        .write.parquet(frontier)

    # robots: site-1 disallows /p/3
    rules = robots_rules(spark.createDataFrame(
        [("site-1.example.com",
          "User-agent: *\nDisallow: /p/3\n")],
        "domain string, robots_txt string")).localCheckpoint()
    delays = spark.createDataFrame(
        [("site-0.example.com", 7.0)], "host string, crawl_delay double")

    # shards 1-2: docs 0..3 plus doc 1 on the ported authority (a
    # DISTINCT canonical url, so the stream dedup keeps it)
    _write_shards(
        wc, html, [(1, [0, 1, 2, 3]), (2, [])],
        extra={2: [("https://site-1.example.com:8443/p/1", 1)]})

    q = start_frontier_admission(spark, wc, frontier, admitted, ckpt,
                                 robots_rules_df=rules,
                                 schedule_dir=sched, delays_df=delays,
                                 per_wave=2, default_delay_s=1.0)
    try:
        q.processAllAvailable()
        # later batch: one more doc — the tombstoned page must not be
        # retried or re-tombstoned
        _write_shards(wc, html, [(3, [4, 5])])
        q.processAllAvailable()
    finally:
        q.stop()

    adm = spark.read.parquet(admitted).collect()
    # doc 3: robots-rejected (tombstoned); doc 5: noindex meta (the
    # stateless directive filter, upstream of the batch — never
    # deferred, never tombstoned)
    assert {r.url for r in adm} == (
        {f"https://site-{d % 2}.example.com/p/{d}"
         for d in (0, 1, 2, 4)}
        | {"https://site-1.example.com:8443/p/1"})
    rej = spark.read.parquet(f"{admitted}_deferred_rejected").collect()
    assert len(rej) == 1               # exactly one tombstone, ever

    sched_rows = spark.read.parquet(sched).collect()
    # RAW row count first: a replay-idempotence regression that
    # double-appended schedule rows must not hide behind a doc_id-
    # keyed dict (review find r15)
    assert len(sched_rows) == len(adm)
    sr = {r.doc_id: r for r in sched_rows}
    assert len(sr) == len(adm)
    # the ported variant pacing-shares site-1's stripped host
    hosts = {r.host for r in sr.values()}
    assert hosts == {"site-0.example.com", "site-1.example.com"}
    s1 = sorted(r.slot for r in sr.values()
                if r.host == "site-1.example.com")
    assert s1 == list(range(len(s1)))  # dense incl. the ported page
    # per-slot Crawl-delay pacing for the delay-carrying host
    for r in sr.values():
        if r.host == "site-0.example.com":
            assert r.not_before_s == 7.0 * r.slot


def test_admission_defers_pre_seed_pages(spark, tmp_path):
    """Shard delivery racing frontier growth: pages arriving BEFORE
    their sitemap is seeded defer (sink-side state) and admit on a
    later batch once the frontier catches up — never a silent drop."""
    from simpy__kafka__flink__kafka_spark.streaming.corpus import (
        start_frontier_admission)

    html = _mk_fixture(spark, 4)
    wc = str(tmp_path / "wc")
    frontier = str(tmp_path / "frontier")
    admitted = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    _write_shards(wc, html, [(1, [0, 1])])
    q = start_frontier_admission(spark, wc, frontier, admitted, ckpt)
    try:
        q.processAllAvailable()       # no frontier yet -> all deferred
        assert spark.read.parquet(admitted).count() == 0
        dn = spark.read.parquet(f"{admitted}_deferred").count()
        assert dn == 2
        # the frontier catches up; the NEXT batch (new shard) retries
        # the deferral and admits both waves
        spark.createDataFrame(
            [(f"site-{d % 2}.example.com",
              f"https://site-{d % 2}.example.com/p/{d}") for d in
             range(4)], "domain string, url string"
        ).write.parquet(frontier)
        _write_shards(wc, html, [(2, [2, 3])])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.url for r in spark.read.parquet(admitted).collect()}
    assert got == {f"https://site-{d % 2}.example.com/p/{d}"
                   for d in range(4)}
