"""Sitemap support (functions/robots.py:robots_sitemaps +
functions/crawl.py:parse_sitemap): Sitemap lines are global
(group-independent), urlset entries parse with protocol defaults and a
try_cast priority fallback, sitemapindex entries surface as kind
'sitemap', and malformed entries degrade instead of erroring."""

from __future__ import annotations


def _parse(spark, xml):
    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        parse_sitemap)

    df = spark.createDataFrame([(1, xml)], "doc_id long, xml string")
    return parse_sitemap(df).collect()


def test_urlset_full_and_defaults(spark):
    xml = ("<urlset>"
           "<url><loc> https://a.example/x </loc>"
           "<lastmod>2026-01-02</lastmod>"
           "<changefreq>weekly</changefreq>"
           "<priority>0.8</priority></url>"
           "<url><loc>https://a.example/y</loc></url>"
           "</urlset>")
    rows = {r.loc: r for r in _parse(spark, xml)}
    full = rows["https://a.example/x"]
    assert (full.kind, full.lastmod, full.changefreq, full.priority) == (
        "url", "2026-01-02", "weekly", 0.8)
    dflt = rows["https://a.example/y"]
    assert (dflt.lastmod, dflt.changefreq, dflt.priority) == (
        None, None, 0.5)


def test_junk_priority_falls_back(spark):
    xml = ("<urlset><url><loc>https://a.example/z</loc>"
           "<priority>very-high</priority></url></urlset>")
    [r] = _parse(spark, xml)
    assert r.priority == 0.5


def test_sitemapindex_entries(spark):
    xml = ("<sitemapindex>"
           "<sitemap><loc>https://a.example/sitemap-1.xml</loc></sitemap>"
           "<sitemap><loc>https://a.example/sitemap-2.xml</loc></sitemap>"
           "</sitemapindex>")
    rows = _parse(spark, xml)
    assert {r.kind for r in rows} == {"sitemap"}
    assert {r.loc for r in rows} == {"https://a.example/sitemap-1.xml",
                                     "https://a.example/sitemap-2.xml"}
    assert all(r.priority is None for r in rows)


def test_empty_loc_entries_dropped(spark):
    xml = ("<urlset><url><loc></loc></url>"
           "<url><changefreq>daily</changefreq></url>"
           "<url><loc>https://a.example/kept</loc></url></urlset>")
    rows = _parse(spark, xml)
    assert [r.loc for r in rows] == ["https://a.example/kept"]


def test_multiline_entries(spark):
    xml = ("<urlset>\n  <url>\n    <loc>\n      https://a.example/m\n"
           "    </loc>\n    <priority>0.3</priority>\n  </url>\n"
           "</urlset>")
    [r] = _parse(spark, xml)
    assert (r.loc, r.priority) == ("https://a.example/m", 0.3)


def test_robots_sitemaps_are_group_independent(spark):
    """Sitemap lines bind globally even when they sit inside a
    specific-agent group's text (sitemaps.org semantics)."""
    from simpy__kafka__flink__kafka_spark.functions.robots import (
        robots_sitemaps)

    body = ("Sitemap: https://d.example/before-any-group.xml\n"
            "User-agent: googlebot\nDisallow: /\n"
            "Sitemap: https://d.example/inside-named-group.xml\n\n"
            "User-agent: *\nAllow: /\n"
            "Sitemap:   https://d.example/trailing.xml  \n"
            "Sitemap:\n")
    dom = spark.createDataFrame([("d", body)],
                                "domain string, robots_txt string")
    got = {r.sitemap_url for r in robots_sitemaps(dom).collect()}
    assert got == {"https://d.example/before-any-group.xml",
                   "https://d.example/inside-named-group.xml",
                   "https://d.example/trailing.xml"}


def test_sitemap_gz_parse_matches_plain_and_oracle(spark, sf_dir):
    """Gz peel + the one parser rendering: the gz row's entries equal
    the plain row's exactly (plus the member count), and the DuckDB
    oracle (the plain SQL wrapped with the member contract) matches."""
    import gzip

    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.functions.crawl import (
        sitemap_gz_parse)
    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["sitemap_gz_parse"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "sitemap_gz_parse")

    # corrupt gzip is typed, not a crash
    import pytest
    xml = '<?xml version="1.0"?><urlset><url><loc>https://a/x</loc></url></urlset>'
    good = gzip.compress(xml.encode())
    media = spark.createDataFrame(
        [(1, bytearray(good[:10]))], "doc_id long, content binary")
    with pytest.raises(Exception) as ei:
        sitemap_gz_parse(media).collect()
    assert "gzip" in str(ei.value).lower() or "member" in str(ei.value).lower()
