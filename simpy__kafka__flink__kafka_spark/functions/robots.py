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
# Crawl-delay: seconds (integer or decimal) — non-standard but ubiquitous
_DELAY_RE = r"(?im)^[ \t]*crawl-delay[ \t]*:[ \t]*([0-9]+(?:\.[0-9]+)?)"
# agent token of a post-split segment: first non-ws run on the UA line
_AGENT_TOK_RE = r"^[ \t]*([^ \t\r\n#]*)"


def _agent_token(seg: Column) -> Column:
    """The user-agent product token a post-split segment names — the
    FIRST whitespace-delimited token only, compared by EQUALITY.  (A
    ``startswith('*')`` comparison would also claim invalid-but-seen
    ``User-agent: *bot`` segments for the default group.)"""
    return F.lower(F.regexp_extract(seg, _AGENT_TOK_RE, 1))


# a segment COUNTS as rule-bearing when it carries any group-member
# directive line (allow / disallow / crawl-delay) — a crawl-delay-only
# group must not collapse into the next group's rules
_DIRECTIVE_RE = r"(?im)^[ \t]*(allow|disallow|crawl-delay)[ \t]*:"
_UA_SPLIT_RE = r"(?i)user-agent[ \t]*:"


def _group_rule_text(df: DataFrame, body_col: str, key_col: str,
                     user_agent: str | None) -> DataFrame:
    """Per key, the concatenated directive text of the segments whose
    rules bind ``user_agent`` (RFC 9309 §2.2.1-2.2.2).

    Bodies split on ``User-agent:`` lines; a group declared with
    STACKED agent lines (``User-agent: a`` / ``User-agent: b`` /
    rules — blank lines in between allowed, per the RFC ABNF) splits
    into agent-only segments whose rules live in the first FOLLOWING
    rule-bearing segment, so each segment's binding rules are at
    ``rpos = min(pos of rule-bearing segment >= own pos)`` — a window
    over SEGMENT rows (tens per domain; the frame is domain-cardinality,
    so this whole selection is negligible next to the URL stream).

    Selection: positions claimed by segments naming the crawler's exact
    product token when any exist, else those claimed by ``*`` segments
    — a named group OVERRIDES the default group (never merges).
    Same-agent segments merge.  ``user_agent=None`` is the
    generic-crawler posture (``*`` only).
    Output: (key_col, seg) — one row per key that HAS a binding group.
    """
    from pyspark.sql import Window as W

    segs = F.split(F.col(body_col), _UA_SPLIT_RE)
    ex = (df.select(key_col, F.posexplode(segs).alias("pos", "seg"))
          # pos 0 is the preamble before any User-agent line: rules
          # there belong to no group (RFC: ignored)
          .where(F.col("pos") > 0)
          .select(key_col, "pos", "seg",
                  _agent_token(F.col("seg")).alias("tok"),
                  F.col("seg").rlike(_DIRECTIVE_RE).alias("has_rules")))
    w = (W.partitionBy(key_col).orderBy("pos")
         .rowsBetween(W.currentRow, W.unboundedFollowing))
    # each segment's binding rules live in the first FOLLOWING (or own)
    # rule-bearing segment — fetched directly in the same window pass, so
    # no join-back to the segment table is ever needed
    ex = ex.withColumn(
        "rpos", F.min(F.when(F.col("has_rules"), F.col("pos"))).over(w)
    ).withColumn(
        "bseg", F.first(F.when(F.col("has_rules"), F.col("seg")),
                        ignorenulls=True).over(w))

    def _merge(chosen: DataFrame) -> DataFrame:
        # rule/delay consumers treat the text as a SET of directive
        # lines, so the merge order is immaterial — dedup (stacked agent
        # lines sharing one rule segment) and concat in position order
        # anyway for determinism, inside the aggregate (collect_set)
        # rather than as a separate distinct exchange
        return chosen.groupBy(key_col).agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set(F.struct("rpos", "bseg"))),
                    lambda s: s["bseg"]),
                "\n").alias("seg"))

    star = ex.where((F.col("tok") == "*") & F.col("rpos").isNotNull())
    if user_agent is None:
        # generic-crawler short-circuit: no named-override selection —
        # one window pass + one aggregate, nothing else
        return _merge(star.select(key_col, "rpos", "bseg"))
    ua = user_agent.strip().lower()
    named = (ex.where((F.col("tok") == ua)
                      & F.col("rpos").isNotNull())
             .select(key_col, "rpos", "bseg"))
    # keyed on the TOKEN match, not on named rule positions: a
    # matching group with ZERO rules (trailing 'User-agent: <bot>'
    # at EOF) still overrides '*' per RFC 9309 §2.2.1 — the named
    # crawler gets NO restrictions, not the default group's
    keys_with_named = (ex.where(F.col("tok") == ua)
                       .select(key_col).distinct())
    chosen = named.unionByName(
        star.select(key_col, "rpos", "bseg")
        .join(keys_with_named, key_col, "left_anti"))
    return _merge(chosen)


def robots_rules(df: DataFrame, body_col: str = "robots_txt",
                 key_col: str = "domain",
                 user_agent: str | None = None) -> DataFrame:
    """Explode each robots.txt body into the rules binding
    ``user_agent``: (key_col, is_allow: int, path: string, rule_len:
    int).

    Group selection (RFC 9309 §2.2.1): segments naming the crawler's
    exact product token when any exist, else the ``*`` segments, with
    STACKED ``User-agent:`` lines sharing the following rules — see
    :func:`_group_rule_text`.  Empty-path rules are dropped (they
    impose nothing, RFC 9309 §2.2.2)."""
    grouped = _group_rule_text(df, body_col, key_col, user_agent)
    matches = F.regexp_extract_all(F.col("seg"), F.lit(_RULE_RE), 0)
    rules = F.transform(
        matches,
        lambda m: F.struct(
            F.when(F.lower(F.regexp_extract(m, r"(?i)(allow|disallow)", 1))
                   == "allow", F.lit(1)).otherwise(F.lit(0))
            .alias("is_allow"),
            F.trim(F.regexp_extract(m, r":(.*)$", 1)).alias("path"),
        ))
    return (
        grouped.select(key_col, F.explode(rules).alias("r"))
        .select(key_col, F.col("r.is_allow").alias("is_allow"),
                F.col("r.path").alias("path"))
        .where(F.col("path") != "")
        .withColumn("rule_len", F.length("path").cast("int"))
    )


def robots_crawl_delays(df: DataFrame, body_col: str = "robots_txt",
                        key_col: str = "domain",
                        user_agent: str | None = None) -> DataFrame:
    """Per-domain ``Crawl-delay`` (seconds) from the group binding
    ``user_agent`` — the pacing hint :func:`~.crawl.crawl_schedule`
    turns into per-wave fetch times.  Several delay lines in the
    merged group fold to the MAXIMUM — the most conservative reading
    (wait at least as long as any line asks).
    Domains whose group carries no delay are omitted (the caller
    applies its default).  Zero-shuffle parse on a domain-cardinality
    frame.  Output: (key_col, crawl_delay: double)."""
    grouped = _group_rule_text(df, body_col, key_col, user_agent)
    delays = F.transform(
        F.regexp_extract_all(F.col("seg"), F.lit(_DELAY_RE), 1),
        lambda d: d.cast("double"))
    return (
        grouped.select(key_col, F.array_max(delays).alias("crawl_delay"))
        .where(F.col("crawl_delay").isNotNull())
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


# Sitemap: lines are GLOBAL per the sitemaps.org protocol — they bind
# regardless of any User-agent group, so they parse from the whole body
_SITEMAP_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^#\r\n]*)"


def robots_sitemaps(df: DataFrame, body_col: str = "robots_txt",
                    key_col: str = "domain") -> DataFrame:
    """Sitemap URLs advertised by each robots.txt — the frontier-seeding
    half of the file (sitemaps.org: Sitemap lines are global, NOT part
    of any agent group, so no group selection applies).  Zero-shuffle
    parse on the domain-cardinality frame.
    Output: (key_col, sitemap_url) — one row per advertised sitemap,
    whitespace-trimmed, empty lines dropped."""
    urls = F.transform(
        F.regexp_extract_all(F.col(body_col), F.lit(_SITEMAP_RE), 1),
        lambda u: F.trim(u))
    return (
        df.select(key_col, F.explode(urls).alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
    )


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
