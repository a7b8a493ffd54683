"""URL canonicalization + URL-level dedup — the stage a real crawl
pipeline runs BEFORE content dedup (round-7 verdict task #5): the same
page fetched as ``HTTP://Host:80/x/`` and ``http://host/x`` must collapse
to one canonical key so content-level dedup never even sees the copy.

Canonicalization rules (the common subset of the canonicalizers used by
crawl pipelines — scheme/host lowercasing, default-port strip, fragment
strip, trailing-slash strip, tracking-parameter removal, query-parameter
sort):

1. fragment dropped (``#...``),
2. scheme and host[:port] lowercased (path/query case preserved),
3. default ports stripped (``:80`` for http, ``:443`` for https),
4. trailing slashes stripped from the path,
5. tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``),
6. remaining query parameters sorted byte-wise.

Scale shape: canonicalization is ZERO-shuffle row codegen (regexp +
higher-order array functions, no UDF); URL-level dedup is ONE exchange
keyed on the canonical URL — uniform md5-quality key at 100 TB (hot
canonical URLs are exactly the duplicates being collapsed, and the
aggregation is a count+min, so map-side partial aggregation absorbs
them).  Every regex stays in the Java-regex/RE2 common subset so the
DuckDB oracle (plans/dataprep.py) runs the IDENTICAL patterns.

Reference parity note: the reference trace pipeline has no URL surface;
this module belongs to the training-data-pipeline extension operators
(same family as functions/html.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex/RE2 common subset — used VERBATIM by the DuckDB oracle.
SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
FRAGMENT_RE = "#.*"
TRAILING_SLASH_RE = "/+$"
QUERY_RE = r"\?.*"
TRACKING_PARAM_RE = "^(utm_[^=&]*|fbclid|gclid|msclkid)(=.*)?$"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of one URL column — pure row expressions (see
    module docstring for the rule list).  Inputs without a ``scheme://``
    prefix (relative hrefs) get the path/query rules only."""
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_replace(u, FRAGMENT_RE, "")
    scheme = F.lower(F.regexp_extract(nofrag, SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(nofrag, HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "http",
               F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https",
              F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    rest = F.when(scheme != "", F.regexp_extract(nofrag, REST_RE, 1)) \
        .otherwise(nofrag)
    path = F.regexp_replace(
        F.regexp_replace(rest, QUERY_RE, ""), TRAILING_SLASH_RE, "")
    q = F.regexp_extract(rest, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    ))
    q2 = F.array_join(params, "&")
    tail = F.concat(
        path, F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")))
    return F.when(
        scheme != "", F.concat(scheme, F.lit("://"), host, tail)
    ).otherwise(tail)


def url_canonicalize(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """(id_col, url, canonical_url) — zero-shuffle; rides the ingest
    scan like the quality scorers."""
    return df.select(
        F.col(id_col), F.col(url_col).alias("url"),
        canonicalize_url(url_col).alias("canonical_url"),
    )


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-level keep-first dedup: one row per canonical URL with the
    lowest-id document as the keeper and the collapse count.  ONE
    exchange on the canonical key; count+min aggregate combines
    map-side.  Output: (canonical_url, n_docs, keeper_doc_id)."""
    return (
        df.select(canonicalize_url(url_col).alias("canonical_url"),
                  F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(id_col).cast("long").alias("keeper_doc_id"),
        )
    )


# --- SURT keys + CDX index lines (round 13) ----------------------------------
# The web-archive companion surface to the warc.gz front door: a CDX(J)
# index line is "urlkey timestamp {json}" where urlkey is the SURT
# (Sort-friendly URI Reordering Transform) of the capture URL — host
# labels reversed and comma-joined so one host's captures sort
# contiguously.  Public layout: the Internet Archive SURT convention /
# the CommonCrawl cdx-00000..gz index shards.  Both stay pure row
# expressions (zero-shuffle, zero Python).

def surt_key(url: Column | str) -> Column:
    """CommonCrawl-style urlkey: canonicalize (module rules), drop a
    leading ``www.``, reverse the host labels comma-joined, then
    ``)`` + the lowercased path?query (``/`` when the canonical path
    is empty).  ``https://www.Example.org/A/b?b=2&a=1&utm_x=9`` ->
    ``org,example)/a/b?a=1&b=2``."""
    canon = canonicalize_url(url)
    hostport = F.regexp_extract(canon, HOSTPORT_RE, 1)
    # userinfo never participates in the urlkey (SURT drops it, and
    # the web-prep host derivation strips it) — remove 'user:pass@'
    # before any label work so credentials can't be reversed into it
    hostport = F.regexp_replace(hostport, r"^[^@/]*@", "")
    # a surviving non-default port trails the REVERSED host in SURT
    # ('org,example:8443)...'), so split it off before label reversal
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r"(:\d+)$", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    tail = F.lower(F.regexp_extract(canon, REST_RE, 1))
    return F.concat(
        rev, port, F.lit(")"),
        F.when(tail == "", F.lit("/")).otherwise(tail))


CDX_LINE_RE = r"^(\S+) (\d{14}) (\{.*\})$"
CDX_JSON_SCHEMA = ("url string, status string, mime string, "
                   "length string, offset string, filename string")


def cdx_parse(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse CDXJ index lines — ``urlkey timestamp {json}`` — into
    typed columns (urlkey, ts, url, status, mime, length, offset,
    filename).  Numeric JSON fields arrive as strings in real CDX
    shards and are try_cast (a malformed capture row yields NULLs,
    never a poison-pill); a line that does not match the three-part
    shape yields a NULL urlkey the caller filters on.  Zero-shuffle
    row expressions + from_json."""
    line = F.col(line_col)
    j = F.from_json(F.regexp_extract(line, CDX_LINE_RE, 3),
                    CDX_JSON_SCHEMA)
    urlkey = F.regexp_extract(line, CDX_LINE_RE, 1)
    return df.select(
        *[c for c in df.columns if c != line_col],
        F.when(urlkey != "", urlkey).alias("urlkey"),
        F.regexp_extract(line, CDX_LINE_RE, 2).try_cast("long")
        .alias("ts"),
        j["url"].alias("url"),
        j["status"].try_cast("int").alias("status"),
        j["mime"].alias("mime"),
        j["length"].try_cast("long").alias("length"),
        j["offset"].try_cast("long").alias("offset"),
        j["filename"].alias("filename"),
    )
