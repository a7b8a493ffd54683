"""robots.txt protocol support (RFC 9309) — the FILE-level half of crawl
compliance (functions/quality.py:robots_flags covers the page-level meta
tag / X-Robots-Tag half): parse each domain's robots.txt body into the
default-agent rule group, then gate URLs with the standard
longest-match / allow-wins-ties precedence (RFC 9309 §2.2.2, the
Google semantics).

Scale shape: parsing is zero-shuffle per-row regexp/array codegen (one
robots.txt row per DOMAIN — the table is domain-cardinality, tiny
relative to the URL stream); the gate is one broadcast-able equi-join of
URLs onto their domain's exploded rules followed by a per-URL max — the
rule fan-out per URL is bounded by the rules in ONE robots.txt (tens),
never corpus-sized.

Engine-parity notes (the oracle runs the same arithmetic):
- rule paths become LIKE patterns with ESCAPE '!' — ``*`` maps to ``%``,
  a trailing ``$`` anchors (no trailing ``%``), literal ``%``/``_``/
  ``!`` are escaped — identical LIKE semantics on both engines, no
  regex-dialect risk;
- precedence is the packed integer max ``len(path)*2 + is_allow``:
  longest rule wins, allow wins a same-length tie — deterministic and
  hash-stable;
- an empty-path rule ("Disallow:") imposes nothing and is dropped at
  parse (RFC 9309 §2.2.2).

Reference parity note: the reference trace pipeline has no crawl
surface; this belongs to the training-data extension operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one directive line: type + path, comments and CR stripped
_RULE_RE = r"(?im)^[ \t]*(allow|disallow)[ \t]*:[ \t]*([^#\r\n]*)"


def robots_rules(df: DataFrame, body_col: str = "robots_txt",
                 key_col: str = "domain") -> DataFrame:
    """Explode each robots.txt body into the DEFAULT-AGENT group's rules:
    (key_col, is_allow: int, path: string, rule_len: int).

    Group selection: the body splits on ``User-agent:`` lines; every
    segment whose agent token is ``*`` contributes its rules (RFC 9309
    merges same-agent groups).  Specific-agent groups are ignored — the
    default-group posture of a generic corpus crawler.  Empty-path rules
    are dropped (they impose nothing)."""
    segs = F.split(F.col(body_col), r"(?i)user-agent[ \t]*:")
    star = F.filter(
        segs, lambda s: F.trim(s).startswith("*"))
    merged = F.array_join(star, "\n")
    matches = F.regexp_extract_all(merged, F.lit(_RULE_RE), 0)
    rules = F.transform(
        matches,
        lambda m: F.struct(
            F.when(F.lower(F.regexp_extract(m, r"(?i)(allow|disallow)", 1))
                   == "allow", F.lit(1)).otherwise(F.lit(0))
            .alias("is_allow"),
            F.trim(F.regexp_extract(m, r":(.*)$", 1)).alias("path"),
        ))
    return (
        df.select(key_col, F.explode(rules).alias("r"))
        .select(key_col, F.col("r.is_allow").alias("is_allow"),
                F.col("r.path").alias("path"))
        .where(F.col("path") != "")
        .withColumn("rule_len", F.length("path").cast("int"))
    )


def _wildcarded(path: Column) -> Column:
    """RFC path -> LIKE body with ESCAPE '!': literals ``!``/``%``/``_``
    escaped, then ``*`` -> ``%``.  The trailing-``$`` anchor is applied
    by the caller (it needs a named column to slice)."""
    esc = F.replace(F.replace(F.replace(
        path, F.lit("!"), F.lit("!!")),
        F.lit("%"), F.lit("!%")),
        F.lit("_"), F.lit("!_"))
    return F.replace(esc, F.lit("*"), F.lit("%"))


def url_path(url: Column) -> Column:
    """Path component of a URL ('' query/fragment stripped; bare host
    -> '/')."""
    p = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)",
                         1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_allowed(urls: DataFrame, rules: DataFrame,
                   url_col: str = "url", id_col: str = "doc_id",
                   key_col: str = "domain") -> DataFrame:
    """Gate every URL through its domain's robots rules with
    longest-match / allow-wins-ties precedence.  ``urls`` carries
    (id_col, key_col, url_col); ``rules`` is :func:`robots_rules`
    output.  A URL with no matching rule is allowed (RFC default).
    Output: (id_col, allowed: int, match_len: int — 0 when unmatched).

    One equi-join on the domain key (rules side is domain-cardinality —
    broadcast at any realistic scale) + one per-URL aggregate."""
    u = urls.select(id_col, key_col,
                    url_path(F.col(url_col)).alias("_path"))
    r = (
        rules.select(key_col, "is_allow", "rule_len",
                     _wildcarded(F.col("path")).alias("_wild"))
        .withColumn(
            "pat",
            F.when(F.col("_wild").endswith("$"),
                   F.expr("substring(_wild, 1, length(_wild) - 1)"))
            .otherwise(F.concat(F.col("_wild"), F.lit("%"))))
        .drop("_wild")
    )
    joined = u.join(F.broadcast(r), key_col, "left")
    hit = F.expr("_path LIKE pat ESCAPE '!'") & F.col("pat").isNotNull()
    packed = F.max(F.when(hit, F.col("rule_len") * 2 + F.col("is_allow")))
    return (
        joined.groupBy(id_col).agg(packed.alias("_pk"))
        .select(
            id_col,
            F.when(F.col("_pk").isNull() | (F.col("_pk") % 2 == 1),
                   F.lit(1)).otherwise(F.lit(0)).alias("allowed"),
            F.coalesce(F.expr("_pk div 2"), F.lit(0)).cast("int")
            .alias("match_len"),
        )
    )
