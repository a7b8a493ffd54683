"""Round-9 IR/crawl additions: BM25 scoring, anchor-text aggregation,
politeness scheduling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_bm25_matches_hand_computation(spark):
    from simpy__kafka__flink__kafka_spark.functions.text import bm25_scores

    corpus = {
        1: "spark joins data with spark shuffles",
        2: "window functions over streams",
        3: "nothing relevant here at all",
        4: "spark spark spark window",
    }
    docs = spark.createDataFrame(list(corpus.items()),
                                 "doc_id long, text string")
    terms = ["spark", "window"]
    got = {r.doc_id: (r.n_hits, r.score)
           for r in bm25_scores(docs, terms).collect()}

    # reference computation
    toks = {d: t.split() for d, t in corpus.items()}
    dl = {d: len(ws) for d, ws in toks.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    k1, b = 1.2, 0.75
    want = {}
    for d, ws in toks.items():
        hits, score = 0, 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            dft = sum(1 for w2 in toks.values() if t in w2)
            idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
            score += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dl[d] / avgdl))
            hits += 1
        if hits:
            want[d] = (hits, round(score, 6))
    assert got == want
    assert 3 not in got                    # no-hit docs are absent
    assert got[4][0] == 2                  # both terms hit


def test_anchor_texts_strip_markup_and_aggregate(spark):
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        anchor_texts)

    rows = [
        (1, '<a href="/x"><b>Bold</b> link</a> <a href="/y">plain</a>'),
        (2, '<A HREF="/x">Bold link</A>'),          # case-insensitive
        (3, '<a class="z" href="/x" rel="nofollow">other text</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.target: (r.n_anchors, r.n_unique_texts)
           for r in anchor_texts(df).collect()}
    # /x: three anchors, two distinct texts ('Bold link' twice after
    # markup strip, 'other text' once)
    assert got["/x"] == (3, 2)
    assert got["/y"] == (1, 1)


def test_crawl_schedule_politeness_cap(spark):
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        crawl_schedule)

    rows = [(i, f"https://h{i % 3}.example/p{i}") for i in range(30)]
    urls = spark.createDataFrame(rows, "doc_id long, url string")
    out = crawl_schedule(urls, per_wave=4).collect()
    # every (host, wave) bucket holds at most per_wave URLs
    from collections import Counter

    per = Counter((r.host, r.wave) for r in out)
    assert max(per.values()) <= 4
    # slots are dense 0..n-1 within each host
    by_host: dict[str, list[int]] = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r.slot)
    for slots in by_host.values():
        assert sorted(slots) == list(range(len(slots)))
    # deterministic: slot order follows doc_id within a host
    for r in out:
        assert r.wave == r.slot // 4


def test_crawl_schedule_paced_per_slot_for_delayed_hosts(spark):
    """Crawl-delay is the interval between SUCCESSIVE requests: a host
    with a stated delay must never see two fetch slots closer than the
    delay (per-slot pacing), while a host without one keeps the wave
    cadence at the caller default."""
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        crawl_schedule)

    rows = ([(i, f"https://slow.example/p{i}") for i in range(10)]
            + [(100 + i, f"https://fast.example/p{i}") for i in range(10)])
    urls = spark.createDataFrame(rows, "doc_id long, url string")
    delays = spark.createDataFrame([("slow.example", 10.0)],
                                   "host string, crawl_delay double")
    out = crawl_schedule(urls, per_wave=4, delays=delays,
                         default_delay_s=1.5).collect()
    slow = sorted((r.slot, r.not_before_s) for r in out
                  if r.host == "slow.example")
    fast = sorted((r.slot, r.wave, r.not_before_s) for r in out
                  if r.host == "fast.example")
    # delayed host: successive slots are >= delay apart (= slot * delay)
    for (s, t) in slow:
        assert t == s * 10.0
    gaps = [b[1] - a[1] for a, b in zip(slow, slow[1:])]
    assert all(g >= 10.0 for g in gaps)
    # default host: wave cadence, per_wave simultaneous fetches allowed
    for (s, w, t) in fast:
        assert w == s // 4 and t == w * 1.5


def test_snapshot_diff_classes(spark):
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        snapshot_diff)

    old = spark.createDataFrame(
        [("u1", "kept the same text"),
         ("u2", "will be edited soon"),
         ("u3", "gone in the next crawl")],
        "url string, text string")
    new = spark.createDataFrame(
        [("u1", "kept   the  same text"),   # whitespace-normalized equal
         ("u2", "was edited since"),
         ("u4", "brand new page")],
        "url string, text string")
    got = {r.url: r.change for r in snapshot_diff(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed",
                   "u3": "removed", "u4": "added"}


def test_surt_key_rules(spark):
    """www-strip, label reversal, default-port strip via canonicalize,
    tracking-param removal, query sort, lowercased tail, empty path."""
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.urls import surt_key

    cases = [
        ("https://www.Example.org/A/b?b=2&a=1&utm_x=9",
         "org,example)/a/b?a=1&b=2"),
        ("http://Sub.Host.example.COM:80/x", "com,example,host,sub)/x"),
        ("https://example.org", "org,example)/"),
        ("https://example.org:8443/y", "org,example:8443)/y"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(surt_key("url")).collect()]
    assert got == [w for _, w in cases]


def test_cdx_parse_typed_and_malformed(spark):
    from simpy__kafka__flink__kafka_spark.functions.urls import cdx_parse

    lines = [
        (1, 'org,ex)/p 20250101000000 {"url":"https://ex.org/p",'
            '"status":"200","mime":"text/html","length":"123",'
            '"offset":"456","filename":"c-00001.warc.gz"}'),
        (2, "not a cdx line"),
        (3, 'org,ex)/q 20250101000001 {"url":"u","status":"30x",'
            '"length":"oops"}'),
    ]
    df = spark.createDataFrame(lines, "doc_id long, line string")
    rows = {r["doc_id"]: r for r in cdx_parse(df).collect()}
    good = rows[1]
    assert (good["urlkey"], good["ts"], good["status"], good["length"],
            good["offset"]) == ("org,ex)/p", 20250101000000, 200, 123, 456)
    assert rows[2]["urlkey"] is None          # malformed shape -> NULL key
    bad = rows[3]                              # bad numerics -> NULL fields
    assert bad["urlkey"] == "org,ex)/q"
    assert bad["status"] is None and bad["length"] is None


def test_warc_cdx_entries_spans_verified(spark):
    """Round-14 indexing step: member byte spans are exact (contiguous,
    covering the shard) and each raw slice re-gunzips to its member
    (slice_ok — the CDX range-request contract); headers/md5 parse."""
    import gzip
    import hashlib

    from simpy__kafka__flink__kafka_spark.functions.html import (
        warc_cdx_entries)

    def rec(typ, uri, payload):
        head = (f"WARC/1.0\r\nWARC-Type: {typ}\r\n"
                + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
                + f"Content-Length: {len(payload)}\r\n\r\n")
        return gzip.compress((head + payload).encode())

    m1 = rec("response", "https://a.example.org/x", "hello body")
    m2 = rec("metadata", None, "fetchTimeMs: 12")
    shard = m1 + m2
    media = spark.createDataFrame([(7, bytearray(shard))],
                                  "doc_id long, content binary")
    rows = sorted(warc_cdx_entries(media).collect(),
                  key=lambda r: r["rec_idx"])
    assert [r["warc_type"] for r in rows] == ["response", "metadata"]
    assert rows[0]["target_uri"] == "https://a.example.org/x"
    assert rows[0]["payload_md5"] == hashlib.md5(b"hello body").hexdigest()
    assert all(r["slice_ok"] == 1 for r in rows)
    # spans are exact and contiguous
    assert rows[0]["member_offset"] == 0
    assert rows[0]["member_length"] == len(m1)
    assert rows[1]["member_offset"] == len(m1)
    assert rows[0]["member_length"] + rows[1]["member_length"] == len(
        shard)


def test_warc_cdx_entries_corrupt_member_typed(spark):
    import gzip

    import pytest

    from simpy__kafka__flink__kafka_spark.functions.html import (
        warc_cdx_entries)

    good = gzip.compress(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nx")
    bad = bytearray(good * 2)
    bad[len(good) + 12] ^= 0xFF       # flip a byte inside member 2
    media = spark.createDataFrame([(1, bytes(bad))],
                                  "doc_id long, content binary")
    with pytest.raises(Exception, match="gzip"):
        warc_cdx_entries(media).collect()
