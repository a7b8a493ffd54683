"""Regression tests for the round-9 ADVICE findings and VERDICT
"What's wrong" items fixed in round 10:

1. functions/sampling.py mixture_plan divided by n_tokens with no
   zero guard — an all-empty source produced NULL/NaN that the two
   engines could disagree on; now pinned to 0.0/epochs 0 on both.
   It also hardcoded the 'text' column; now text_col is a parameter.
2. functions/text.py phrase_search only lowercased terms — whitespace
   or empty terms silently never matched; now normalized (strip +
   lower) with ValueError on unmatchable terms and empty phrases.
3. functions/crawl.py snapshot_diff silently fanned out on duplicate
   keys (up to 4 join rows with mixed classifications); now each side
   collapses to its min fingerprint per key on BOTH engines.
4. functions/robots.py group selection used startswith('*'), claiming
   invalid 'User-agent: *bot' segments for the default group; now
   exact token equality.  robots_rules also gained RFC 9309 §2.2.1
   named-agent selection (a named group OVERRIDES '*') and
   robots_crawl_delays parses Crawl-delay for schedule pacing.
5. functions/crawl.py crawl_schedule ranked with one window partition
   per host — a mega-host became a single-task sort; now sharded on
   (host, id div shard_size) with ranged offsets, identical output.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

# --- 1. mixture_plan zero-token guard + text_col ---------------------------


def test_mixture_plan_zero_token_source(spark):
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        mixture_plan)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "web"),
         (2, "epsilon zeta", "web"),
         (3, "   ", "empty_src"),
         (4, "", "empty_src")],
        "doc_id long, text string, source string")
    rows = {r.source: r for r in
            mixture_plan(docs, budget_tokens=100).collect()}
    z = rows["empty_src"]
    assert z.n_tokens == 0
    assert z.natural_share == 0.0
    assert z.target_share == 0.0
    assert z.sample_rate == 0.0
    assert z.epochs == 0
    w = rows["web"]
    assert w.n_tokens == 6
    # the non-empty source owns the whole mix
    assert w.natural_share == 1.0 and w.target_share == 1.0


def test_mixture_plan_zero_token_engine_parity(spark):
    """The exact edge the advice flagged: both engines must agree on the
    all-empty source row (0.0, never NULL/NaN)."""
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        mixture_plan)

    fixture = [(1, "alpha beta gamma delta", "web"),
               (2, "epsilon zeta", "web"),
               (3, "   ", "empty_src")]
    docs = spark.createDataFrame(
        fixture, "doc_id long, text string, source string")
    got = {(r.source): (r.natural_share, r.target_share, r.sample_rate,
                        r.epochs)
           for r in mixture_plan(docs, budget_tokens=100).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, "
                "source VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", fixture)
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(r"""
        WITH per AS (
          SELECT source,
                 CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\s+'))
                          END) AS BIGINT) AS n_tokens
          FROM d GROUP BY 1),
        tot AS (SELECT sum(n_tokens) AS _tot,
                       sum(pow(n_tokens, 0.5)) AS _z FROM per)
        SELECT source,
               round(CASE WHEN n_tokens > 0
                          THEN CAST(n_tokens AS DOUBLE) / _tot
                          ELSE 0.0 END, 6),
               round(CASE WHEN n_tokens > 0 THEN pow(n_tokens, 0.5) / _z
                          ELSE 0.0 END, 6),
               round(CASE WHEN n_tokens > 0
                          THEN 100.0 * pow(n_tokens, 0.5) / _z / n_tokens
                          ELSE 0.0 END, 6),
               CAST(ceil(round(CASE WHEN n_tokens > 0
                          THEN 100.0 * pow(n_tokens, 0.5) / _z / n_tokens
                          ELSE 0.0 END, 6)) AS BIGINT)
        FROM per CROSS JOIN tot""").fetchall()}
    assert got == want


def test_mixture_plan_text_col_param(spark):
    from simpy__kafka__flink__kafka_spark.functions.sampling import (
        mixture_plan)

    docs = spark.createDataFrame(
        [(1, "one two three", "s")], "doc_id long, body string, source string")
    [row] = mixture_plan(docs, budget_tokens=10,
                         text_col="body").collect()
    assert row.n_tokens == 3


# --- 2. phrase_search term validation --------------------------------------


def test_phrase_search_rejects_empty_phrase(spark):
    from simpy__kafka__flink__kafka_spark.functions.text import phrase_search

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty phrase"):
        phrase_search(docs, [])


def test_phrase_search_rejects_unmatchable_terms(spark):
    from simpy__kafka__flink__kafka_spark.functions.text import phrase_search

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="single non-empty tokens"):
        phrase_search(docs, ["two words"])
    with pytest.raises(ValueError, match="single non-empty tokens"):
        phrase_search(docs, ["ok", "   "])


def test_phrase_search_normalizes_terms(spark):
    """' Batch ' must match the same tokens as 'batch' — the document
    side is stripped/lowercased by words(), so the phrase side is too."""
    from simpy__kafka__flink__kafka_spark.functions.text import phrase_search

    docs = spark.createDataFrame(
        [(1, "run the batch stream job"), (2, "stream batch")],
        "doc_id long, text string")
    got = {r.doc_id: r.first_pos
           for r in phrase_search(docs, [" Batch ", "STREAM"]).collect()}
    assert got == {1: 2}


# --- 3. snapshot_diff duplicate-key contract --------------------------------


def test_snapshot_diff_duplicate_keys_classify_once(spark):
    from simpy__kafka__flink__kafka_spark.functions.crawl import snapshot_diff

    old = spark.createDataFrame(
        [("u1", "version a"), ("u1", "version b"),  # dup key, differing text
         ("u2", "same")],
        "url string, text string")
    new = spark.createDataFrame(
        [("u1", "version a"), ("u2", "same"), ("u2", "same")],
        "url string, text string")
    rows = snapshot_diff(old, new).collect()
    got = {r.url: r.change for r in rows}
    assert len(rows) == len(got), "duplicate key fanned out"
    # u1 old side collapses to min(md5('version a'), md5('version b'));
    # whichever wins, the classification is deterministic — assert it
    # matches the same keep-min rule evaluated in DuckDB
    con = duckdb.connect()
    [(u1_change,)] = con.execute(
        "SELECT CASE WHEN least(md5('version a'), md5('version b'))"
        " <> md5('version a') THEN 'changed' ELSE 'unchanged' END"
    ).fetchall()
    assert got == {"u1": u1_change, "u2": "unchanged"}


# --- 3b. anchor_texts quote forms --------------------------------------------


def test_anchor_texts_all_quote_forms(spark):
    """Double-quoted, single-quoted, AND unquoted hrefs all count; a
    symmetric quote pair is stripped from the target, inner markup from
    the anchor text.  (Single/unquoted were silently dropped pre-r10.)"""
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        anchor_texts)

    page = ('<p><a href="/x">double</a>'
            "<a href='/x'>single <b>bold</b></a>"
            '<a rel=nofollow href=/x class=y>unquoted</a>'
            '<a href = "/spaced">spaced eq</a>'
            "<a href='/y'>other</a></p>")
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    got = {r.target: (r.n_anchors, r.n_unique_texts)
           for r in anchor_texts(df).collect()}
    assert got == {"/x": (3, 3), "/spaced": (1, 1), "/y": (1, 1)}


def test_anchor_texts_quote_forms_engine_parity(spark):
    """The same mixed-quote page through Spark and DuckDB with the
    shared ANCHOR_RE: identical pair extraction on both engines."""
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        ANCHOR_RE, anchor_texts)

    page = ('<a href="/a">one</a><a href=\'/b\'>two</a>'
            '<a href=/c>three</a><a href=\'\'>empty</a>')
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    got = sorted((r.target, r.n_anchors)
                 for r in anchor_texts(df).collect())
    pat = ANCHOR_RE.replace("'", "''")
    con = duckdb.connect()
    want = sorted(con.execute(f"""
        WITH m AS (
          SELECT unnest(regexp_extract_all(?, '{pat}', 0)) AS a),
        p AS (
          SELECT regexp_replace(
                   regexp_extract(a, '{pat}', 1),
                   '(?s)^"(.*)"$|^''(.*)''$', '\\1\\2') AS target
          FROM m)
        SELECT target, CAST(count(*) AS BIGINT) FROM p GROUP BY 1
    """, [page]).fetchall())
    assert got == want
    assert ("/b", 1) in got and ("/c", 1) in got


def test_anchor_href_inside_other_attribute_not_claimed(spark):
    """An 'href=' occurrence inside ANOTHER attribute's quoted value
    must not fabricate an anchor — the tag-prefix walker consumes whole
    quoted attribute values."""
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        anchor_texts)

    page = ('<a title="see href=/fake now">click</a>'
            '<a title="href=/fake2">other</a>'
            '<a data-x="noise" href="/real" rel="a>b">ok</a>')
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    got = {r.target for r in anchor_texts(df).collect()}
    # only the genuine href survives; the '>' inside rel="a>b" (after
    # the href) truncates the tag there — target kept, text may carry
    # value remnants (the documented post-href tradeoff)
    assert got == {"/real"}


def test_anchor_unbalanced_tail_quote_does_not_swallow_next_tag(spark):
    """An unbalanced quote AFTER the href must not swallow the next
    tag: both anchors survive with their own texts."""
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        anchor_texts)

    page = '<a href=/x p="u>A</a><a href=/y q=">B</a>'
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    got = {r.target: r.n_anchors for r in anchor_texts(df).collect()}
    assert got == {"/x": 1, "/y": 1}


def test_anchor_tag_name_and_recall_tradeoffs(spark):
    """The hardened ANCHOR_RE's design points: <area href> fabricates
    nothing (tag name must be exactly 'a'), data-href never matches,
    an unbalanced quote in a tag drops only THAT tag's anchor (no
    cross-tag swallowing), and the documented recall tradeoff — a
    quote inside an earlier UNQUOTED attribute value drops the anchor
    rather than risking a fabricated one."""
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        anchor_texts)

    page = ('<map><area href="/map-target" alt=x></map>'
            '<a name="z">plain named anchor</a>'
            '<a data-href=/not-a-link>nope</a>'
            "<a title=don't href=\"/dropped\">tradeoff</a>"
            '<a href="/kept">good</a>')
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    got = {r.target for r in anchor_texts(df).collect()}
    assert got == {"/kept"}


def test_anchor_target_quote_strip_is_single_layer(spark):
    """href=\"'x'\" must yield the literal target 'x' (inner quotes
    preserved) — a sequential double-strip would merge it with anchors
    pointing at plain x."""
    from simpy__kafka__flink__kafka_spark.functions.quality import (
        anchor_texts)

    page = '<a href="\'x\'">inner</a><a href="x">plain</a>'
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    got = {r.target for r in anchor_texts(df).collect()}
    assert got == {"'x'", "x"}


# --- 3c. bm25 tok_df hygiene --------------------------------------------------


def test_bm25_filters_caller_supplied_tokens(spark):
    """A tok_df built WITHOUT the empty-token filter must yield the
    same scores as the default path (the filter applies to both
    sources, not just the else branch)."""
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.text import (
        bm25_scores, words)

    docs = spark.createDataFrame(
        [(1, "spark joins  and   windows"), (2, "stream stream spark")],
        "doc_id long, text string")
    raw_tok = docs.select("doc_id",
                          F.explode(words("text")).alias("term"))
    want = {(r.doc_id): (r.n_hits, r.score)
            for r in bm25_scores(docs, ["spark", "stream"]).collect()}
    got = {(r.doc_id): (r.n_hits, r.score)
           for r in bm25_scores(docs, ["spark", "stream"],
                                tok_df=raw_tok).collect()}
    assert got == want


# --- 4. robots group selection ----------------------------------------------

_STARBOT_BODY = (
    "User-agent: *bot\nDisallow: /\n\n"
    "User-agent: *\nAllow: /\nDisallow: /private/\n"
)
_NAMED_BODY = (
    "User-agent: mybot\nDisallow: /\n\n"
    "User-agent: *\nAllow: /\n"
)


def _rules_df(spark, body, **kw):
    from simpy__kafka__flink__kafka_spark.functions.robots import robots_rules

    dom = spark.createDataFrame([("d", body)], "domain string, "
                                "robots_txt string")
    return robots_rules(dom, **kw)


def test_star_prefix_segment_not_claimed_by_default_group(spark):
    rules = {(r.is_allow, r.path)
             for r in _rules_df(spark, _STARBOT_BODY).collect()}
    # the '*bot' group's 'Disallow: /' must NOT leak into the '*' group
    assert rules == {(1, "/"), (0, "/private/")}


def test_named_group_overrides_star(spark):
    """RFC 9309 §2.2.1: a crawler named by a specific group uses THAT
    group only — a site saying 'User-agent: mybot / Disallow: /' is off
    limits to mybot even when '*' allows everything."""
    star = {(r.is_allow, r.path)
            for r in _rules_df(spark, _NAMED_BODY).collect()}
    named = {(r.is_allow, r.path)
             for r in _rules_df(spark, _NAMED_BODY,
                                user_agent="MyBot").collect()}
    other = {(r.is_allow, r.path)
             for r in _rules_df(spark, _NAMED_BODY,
                                user_agent="otherbot").collect()}
    assert star == {(1, "/")}
    assert named == {(0, "/")}
    assert other == {(1, "/")}  # unnamed crawler falls back to '*'


def test_named_group_gates_urls(spark):
    from simpy__kafka__flink__kafka_spark.functions.robots import (
        robots_allowed, robots_rules)

    dom = spark.createDataFrame([("ex.com", _NAMED_BODY)],
                                "domain string, robots_txt string")
    urls = spark.createDataFrame(
        [(1, "ex.com", "https://ex.com/page")],
        "doc_id long, domain string, url string")
    [default] = robots_allowed(urls, robots_rules(dom)).collect()
    [named] = robots_allowed(
        urls, robots_rules(dom, user_agent="mybot")).collect()
    assert default.allowed == 1
    assert named.allowed == 0


def test_empty_named_group_overrides_star(spark):
    """RFC 9309 §2.2.1: a group that MATCHES the crawler but carries no
    rules (trailing 'User-agent: bot' at EOF) means no restrictions —
    it must override '*', not fall back to it."""
    body = "User-agent: *\nDisallow: /\n\nUser-agent: freebot\n"
    star = {(r.is_allow, r.path)
            for r in _rules_df(spark, body).collect()}
    named = {(r.is_allow, r.path)
             for r in _rules_df(spark, body,
                                user_agent="freebot").collect()}
    assert star == {(0, "/")}
    assert named == set()  # matched, zero rules -> everything allowed


def test_stacked_user_agent_lines_share_rules(spark):
    """RFC 9309 ABNF: consecutive User-agent lines (blank lines between
    them allowed) form ONE group sharing the following rules — the
    split-based parser used to bind them to the last token only."""
    body = ("User-agent: abot\n\nUser-agent: bbot\nUser-agent: *\n"
            "Disallow: /x\n\nUser-agent: cbot\nDisallow: /y\n")
    star = {(r.is_allow, r.path)
            for r in _rules_df(spark, body).collect()}
    abot = {(r.is_allow, r.path)
            for r in _rules_df(spark, body, user_agent="abot").collect()}
    cbot = {(r.is_allow, r.path)
            for r in _rules_df(spark, body, user_agent="cbot").collect()}
    assert star == {(0, "/x")}
    assert abot == {(0, "/x")}   # stacked above '*', shares its rules
    assert cbot == {(0, "/y")}


def test_crawl_delay_only_group_does_not_collapse(spark):
    """A group carrying ONLY a Crawl-delay line is still rule-bearing:
    its delay must not be skipped, and the next group's rules must not
    leak into it."""
    from simpy__kafka__flink__kafka_spark.functions.robots import (
        robots_crawl_delays)

    body = ("User-agent: *\nCrawl-delay: 7\n\n"
            "User-agent: slowbot\nDisallow: /\n")
    dom = spark.createDataFrame([("d", body)],
                                "domain string, robots_txt string")
    [d] = robots_crawl_delays(dom).collect()
    assert d.crawl_delay == 7.0
    assert _rules_df(spark, body).count() == 0  # '*' group has no paths


def test_preamble_rules_bind_nobody(spark):
    """Directives before the first User-agent line belong to no group
    (RFC: ignored)."""
    body = "Disallow: /secret\nUser-agent: *\nAllow: /\n"
    rules = {(r.is_allow, r.path)
             for r in _rules_df(spark, body).collect()}
    assert rules == {(1, "/")}


def test_crawl_delays_max_of_lines_and_group_selection(spark):
    from simpy__kafka__flink__kafka_spark.functions.robots import (
        robots_crawl_delays)

    body = ("User-agent: mybot\nCrawl-delay: 10\n\n"
            "User-agent: *\nCrawl-delay: 1.5\nCrawl-delay: 3\n")
    dom = spark.createDataFrame([("d", body), ("nodelay", "User-agent: *\n"
                                               "Disallow: /x\n")],
                                "domain string, robots_txt string")
    star = {r.domain: r.crawl_delay
            for r in robots_crawl_delays(dom).collect()}
    named = {r.domain: r.crawl_delay
             for r in robots_crawl_delays(
                 dom, user_agent="mybot").collect()}
    assert star == {"d": 3.0}          # max of the group's lines
    assert named == {"d": 10.0}        # named group overrides
    # 'nodelay' omitted on both paths (caller applies its default)


# --- 5. sharded crawl_schedule ----------------------------------------------


def test_crawl_schedule_sharded_matches_single_window(spark):
    """shard_size=4 forces multi-shard hosts; output must equal the
    naive per-host row_number schedule exactly (slot AND wave), even
    with one host owning ~90% of the URLs."""
    from pyspark.sql import Window as W

    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        crawl_schedule)

    rows = [(i, f"https://mega.example.com/p/{i}") for i in range(45)]
    rows += [(100 + i, f"https://tiny-{i}.example.com/") for i in range(5)]
    urls = spark.createDataFrame(rows, "doc_id long, url string")
    got = {(r.doc_id): (r.host, r.slot, r.wave)
           for r in crawl_schedule(urls, per_wave=4,
                                   shard_size=4).collect()}

    host = F.lower(F.regexp_extract(
        "url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    naive = (urls.select("doc_id", host.alias("host"))
             .withColumn("slot", (F.row_number().over(
                 W.partitionBy("host").orderBy("doc_id")) - 1)
                 .cast("long"))
             .withColumn("wave", F.expr("slot div 4")))
    want = {r.doc_id: (r.host, r.slot, r.wave) for r in naive.collect()}
    assert got == want


def test_crawl_schedule_delay_pacing(spark):
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        crawl_schedule)

    urls = spark.createDataFrame(
        [(i, "https://slow.example.com/p") for i in range(6)]
        + [(10 + i, "https://fast.example.com/p") for i in range(6)],
        "doc_id long, url string")
    delays = spark.createDataFrame([("slow.example.com", 5.0)],
                                   "host string, crawl_delay double")
    out = crawl_schedule(urls, per_wave=2, delays=delays,
                         default_delay_s=1.0).collect()
    by = {(r.host, r.slot): r.not_before_s for r in out}
    # delayed host paces per-SLOT (round-11 semantics fix: Crawl-delay
    # is the interval between successive requests, so per_wave
    # simultaneous fetches would be per_wave x the promised rate)
    assert by[("slow.example.com", 0)] == 0.0
    assert by[("slow.example.com", 1)] == 5.0
    assert by[("slow.example.com", 4)] == 20.0   # slot * Crawl-delay
    # default host keeps the wave cadence
    assert by[("fast.example.com", 4)] == 2.0    # wave(=2) * default
