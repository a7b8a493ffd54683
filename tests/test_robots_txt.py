"""robots.txt protocol (functions/robots.py): group selection, pattern
translation, and longest-match / allow-wins-ties precedence."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.robots import (
    robots_allowed, robots_rules)


def _rules(spark, body):
    df = spark.createDataFrame([("d", body)],
                               "domain string, robots_txt string")
    return robots_rules(df)


def _gate(spark, body, paths):
    rules = _rules(spark, body)
    urls = spark.createDataFrame(
        [(i, "d", f"https://h.example{p}") for i, p in enumerate(paths)],
        "doc_id long, domain string, url string")
    rows = robots_allowed(urls, rules).collect()
    return {paths[r.doc_id]: (r.allowed, r.match_len) for r in rows}


def test_group_selection_and_merging(spark):
    body = ("User-agent: googlebot\nDisallow: /\n\n"
            "User-Agent: *\nDisallow: /a/\n\n"
            "user-agent: *\nDisallow: /b/\n")
    got = {(r.is_allow, r.path) for r in _rules(spark, body).collect()}
    # both * groups merge; the googlebot group is ignored
    assert got == {(0, "/a/"), (0, "/b/")}


def test_multi_agent_line_group(spark):
    # RFC 9309: several User-agent lines can head ONE group; splitting
    # on the agent token leaves the bot segment empty of rules and the
    # *-segment carrying them
    body = "User-agent: somebot\nUser-agent: *\nDisallow: /x/\n"
    got = {(r.is_allow, r.path) for r in _rules(spark, body).collect()}
    assert got == {(0, "/x/")}


def test_comments_crlf_and_empty_disallow(spark):
    body = ("User-agent: *\r\n"
            "Disallow: /secret/  # hidden\r\n"
            "Disallow:\r\n"            # imposes nothing -> dropped
            "# Allow: /not-a-rule\r\n")
    rules = _rules(spark, body).collect()
    assert [(r.is_allow, r.path.strip()) for r in rules] == [(0, "/secret/")]


def test_precedence_longest_match_allow_wins_tie(spark):
    body = ("User-agent: *\n"
            "Disallow: /shop/\n"
            "Allow: /shop/sale/\n"
            "Disallow: /shop/sale/\n")   # same length as the allow -> tie
    got = _gate(spark, body, ["/shop/x", "/shop/sale/x", "/elsewhere"])
    assert got["/shop/x"] == (0, 6)
    # tie at len 11: allow wins
    assert got["/shop/sale/x"] == (1, 11)
    assert got["/elsewhere"] == (1, 0)


def test_wildcard_and_anchor(spark):
    body = ("User-agent: *\n"
            "Disallow: /*.pdf$\n"
            "Allow: /download*\n")
    got = _gate(spark, body, ["/a/report.pdf", "/a/report.pdfx",
                              "/download/report.pdf"])
    assert got["/a/report.pdf"] == (0, 7)       # $ anchors
    assert got["/a/report.pdfx"] == (1, 0)      # anchor rejects suffix
    # allow (raw pattern len 10, wildcard counted — the Google
    # specificity measure) outranks the pdf rule (len 7)
    assert got["/download/report.pdf"] == (1, 10)


def test_like_metacharacters_are_literal(spark):
    # a literal % or _ in a rule path must not act as a LIKE wildcard
    body = "User-agent: *\nDisallow: /100%_done/\n"
    got = _gate(spark, body, ["/100%_done/x", "/100Xsdone/x"])
    assert got["/100%_done/x"][0] == 0
    assert got["/100Xsdone/x"][0] == 1


def test_no_star_group_allows_everything(spark):
    body = "User-agent: nichebot\nDisallow: /\n"
    got = _gate(spark, body, ["/anything", "/"])
    assert all(v == (1, 0) for v in got.values())


def test_bare_host_url_is_root_path(spark):
    body = "User-agent: *\nDisallow: /\n"
    rules = _rules(spark, body)
    urls = spark.createDataFrame(
        [(1, "d", "https://h.example")],
        "doc_id long, domain string, url string")
    [r] = robots_allowed(urls, rules).collect()
    assert (r.allowed, r.match_len) == (0, 1)
