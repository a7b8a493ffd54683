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
