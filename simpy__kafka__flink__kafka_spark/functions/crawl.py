"""Crawl-admission composition — the priority-ordered front door a
crawler applies before content reaches the corpus pipeline:

1. canonical-URL keep-first dedup        -> 'url_duplicate'
2. robots/noindex compliance             -> 'robots_noindex'
3. cross-snapshot content check          -> 'known_content'
4. otherwise                             -> 'admitted'

:func:`admission_statuses` is the BATCH form (one row per doc with its
status) shared by the ``crawl_admission`` registry capstone and the
batch-parity test of the STREAMING front door
(streaming/corpus.py:start_crawl_admission) — both paths run this
module's precedence, so the test can push one fixture through each and
compare.

Scale shape: stage 1 is ONE exchange on the canonical key (zero-shuffle
canonicalization feeding a count+min map-side combine); stage 2 is
zero-shuffle regexp codegen; stage 3 is the banded profile check of
functions/dedup.py:dedup_against (fingerprint semi-join + LSH candidate
join — never all-pairs).  The final assembly is three doc_id-keyed left
joins sharing one exchange family.

Reference parity note: the reference trace pipeline has no crawl
surface; this belongs to the training-data extension operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_against
from .quality import robots_flags
from .urls import canonicalize_url


def admission_statuses(docs: DataFrame, urls: DataFrame, pages: DataFrame,
                       prior: DataFrame, threshold: float = 0.5,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Classify every doc with its crawl-admission status in priority
    order (module docstring).  ``docs`` carries (id, text); ``urls``
    (id, url); ``pages`` (id, html, headers); ``prior`` is a
    :func:`~..functions.dedup.snapshot_profile` of the previous crawl.
    Output: (id_col, status)."""
    from ..cachepin import pin

    # keeper via groupBy(min) + join-back over a PINNED canon frame
    # (round-16, reverting the round-15 window form): `min(id) over
    # (partition by cu)` with an unbounded frame puts every row of a hot
    # canonical URL into ONE window partition on one task — no map-side
    # partial aggregation, and AQE cannot split a window partition the
    # way it splits a skewed join.  On a crawl corpus heavily-duplicated
    # URLs are the expected hot keys, so the keeper must stay map-side
    # combinable: the groupBy min combines per-map-task, and the
    # join-back is a JOIN, which AQE's skew handling can split.  The pin
    # keeps the round-15 win (URL synthesis + canonicalization regexes
    # execute once) without the window's mega-partition shape.
    canon = pin(urls.select(id_col, canonicalize_url("url").alias("cu")))
    keepers = canon.groupBy("cu").agg(F.min(id_col).alias("_keeper"))
    url_dup = (canon.join(keepers, "cu")
               .where(F.col(id_col) != F.col("_keeper"))
               .select(id_col, F.lit(1).alias("_u")))
    robots = (robots_flags(pages, headers_col="headers", id_col=id_col)
              .where(F.col("noindex") == 1)
              .select(id_col, F.lit(1).alias("_r")))
    content = dedup_against(docs, prior, threshold=threshold,
                            id_col=id_col, text_col=text_col)
    known = (content.where(F.col("status") != "fresh")
             .select(id_col, F.lit(1).alias("_k")))
    return (
        docs.select(id_col)
        .join(url_dup, id_col, "left")
        .join(robots, id_col, "left")
        .join(known, id_col, "left")
        .select(
            id_col,
            F.when(F.col("_u") == 1, F.lit("url_duplicate"))
            .when(F.col("_r") == 1, F.lit("robots_noindex"))
            .when(F.col("_k") == 1, F.lit("known_content"))
            .otherwise(F.lit("admitted")).alias("status"),
        )
    )


def not_before_expr(default_delay_s: float = 1.0):
    """THE pacing rule, rendered once (round 12): ``not_before_s`` =
    ``slot * crawl_delay`` for hosts with a STATED Crawl-delay (the
    interval between successive requests — per-wave pacing would be
    ``per_wave``x the promised rate), else ``wave * default_delay_s``.
    Expects columns ``slot``, ``wave``, and a nullable ``crawl_delay``.
    Shared by :func:`crawl_schedule` and the streaming schedule
    (streaming/corpus.py:schedule_accepted_batch) — the round-11
    per-wave -> per-slot semantics change had to be hand-synchronized
    across two verbatim copies of this expression; one rendering ends
    that drift class (VERDICT r11 task 4)."""
    return F.round(
        F.when(F.col("crawl_delay").isNotNull(),
               F.col("slot") * F.col("crawl_delay"))
        .otherwise(F.col("wave") * F.lit(float(default_delay_s))),
        6)


def crawl_schedule(urls: DataFrame, per_wave: int = 4,
                   id_col: str = "doc_id",
                   url_col: str = "url",
                   shard_size: int = 65536,
                   delays: DataFrame | None = None,
                   default_delay_s: float = 1.0,
                   host_col: str | None = None) -> DataFrame:
    """Politeness scheduling for admitted URLs: fetches are grouped into
    WAVES with at most ``per_wave`` URLs per host per wave (the
    rate-limit discipline a crawler owes each origin).  Slot order
    within a host is deterministic (ascending id), so the schedule is
    reproducible and hash-checkable.

    Scale shape: the per-host rank is SHARDED — a mega-host (10^8 URLs
    on one origin, routine at real crawl scale) must not become one
    window partition sorted on a single task.  Rows shard on
    ``(host, id div shard_size)``; each shard ranks locally (bounded
    sort), and a shard-cardinality offset table (per-host exclusive
    prefix count over shard index — the ranged-rank family of
    operators/sequences.py:ranged_row_number, keyed per host) lifts
    local ranks to exact per-host slots.  Identical output to
    ``row_number() OVER (PARTITION BY host ORDER BY id)`` because the
    shard index is monotone in the id.

    When ``delays`` carries per-host ``Crawl-delay`` seconds
    (functions/robots.py:robots_crawl_delays keyed on ``host``), hosts
    with a STATED delay pace per-SLOT (``not_before_s = slot * delay``)
    — Crawl-delay is the interval between successive requests, so
    ``per_wave`` simultaneous fetches every ``delay`` seconds would be
    ``per_wave``x the promised request rate.  Hosts without a stated
    delay keep the wave cadence at ``default_delay_s`` (the per-wave cap
    is the only politeness contract they have declared).

    Output: (id_col, host, slot, wave[, not_before_s]) — slot is the
    0-based rank within the host, wave = slot div per_wave.

    ``host_col`` (round 15): when the caller already carries a host
    column, it is used VERBATIM instead of the authority regex — the
    composed pipeline keys its anomaly detector on the stripped
    Target-URI host, and deriving a userinfo/port-carrying authority
    here instead would both miss the backoff join and hand each URI
    variant its own slot sequence (the pacing-evasion class the r13
    domain-cap fix closed)."""
    from pyspark.sql import Window as W

    host = (F.lower(F.col(host_col)) if host_col is not None
            else F.lower(F.regexp_extract(
                F.col(url_col),
                r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)))
    sh = (urls.select(id_col, host.alias("host"))
          .withColumn("_shard", F.expr(f"{id_col} div {int(shard_size)}")))
    counts = sh.groupBy("host", "_shard").agg(
        F.count(F.lit(1)).alias("_c"))
    w_off = (W.partitionBy("host").orderBy("_shard")
             .rowsBetween(W.unboundedPreceding, -1))
    offs = counts.select(
        "host", "_shard",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"))
    w_local = W.partitionBy("host", "_shard").orderBy(id_col)
    out = (
        sh.join(offs, ["host", "_shard"])
        .withColumn("slot", (F.row_number().over(w_local) - 1
                             + F.col("_off")).cast("long"))
        .withColumn("wave", F.expr(f"slot div {int(per_wave)}"))
        .select(id_col, "host", "slot", "wave")
    )
    if delays is None:
        return out
    return (
        out.join(F.broadcast(delays), "host", "left")
        .withColumn("not_before_s", not_before_expr(default_delay_s))
        .select(id_col, "host", "slot", "wave", "not_before_s")
    )


def anomaly_backoff(schedule: DataFrame, anomalies: DataFrame,
                    backoff: int = 4,
                    host_col: str = "host",
                    max_age_buckets: int | None = None,
                    grid_ms: int = 3_600_000) -> DataFrame:
    """Feed rate-anomaly signals into the politeness schedule — the
    READ side of the rolling z-score detector (VERDICT r11 task 9:
    reputation already feeds seed ORDER through frontier_rank; this
    feeds fetch TIMING).  A host with >= 1 flagged bucket backs off:
    its ``not_before_s`` stretches by integer ``backoff`` (slot order
    is kept — the crawler still owes the host its dense sequence, it
    just fetches slower until the flags age out of the detector's
    trailing window).

    ``anomalies`` is the detector's output keyed on ``host_col``
    (operators/timeseries.py:rolling_zscore_anomalies, or the parquet
    sink of streaming/windows.py:start_anomaly_detection — both carry
    ``is_anomaly``).  ``schedule`` is :func:`crawl_schedule` output (or
    the streaming schedule sink): (id, host, slot, wave, not_before_s).

    ``max_age_buckets`` makes flags AGE OUT (round-12 review fix: the
    detector's sink is append-only history, so counting every flagged
    bucket ever would back a host off forever after one day-one burst):
    only buckets within that many ``grid_ms`` buckets of the sink's
    LATEST bucket count.  The horizon anchors on DATA time (the sink's
    max bucket_ts), not wall clock, so replays stay deterministic.
    None (the batch registry row's setting) counts all flags — that row
    scores a single bounded events table, where "all" IS the trailing
    window.

    Scale shape: flags collapse to HOST cardinality (one map-side
    combined aggregate over the detector's already-bucketed output —
    bucket rows are timeline-hours per host, never event volume), then
    ONE broadcast join onto the schedule: no new exchange over the URL
    volume; the age filter adds one scalar max-aggregate broadcast.
    Output: schedule columns + (n_anomalies, not_before_backoff_s)."""
    flagged = anomalies.where(F.col("is_anomaly") == 1)
    if max_age_buckets is not None:
        edge = anomalies.agg(F.max("bucket_ts").alias("_edge"))
        flagged = (
            flagged.crossJoin(F.broadcast(edge))
            .where(F.col("bucket_ts")
                   > F.col("_edge")
                   - F.lit(int(max_age_buckets) * int(grid_ms)))
            .drop("_edge"))
    flags = (
        flagged
        .groupBy(F.col(host_col).alias("host"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_anomalies"))
    )
    return (
        schedule.join(F.broadcast(flags), "host", "left")
        .withColumn("n_anomalies",
                    F.coalesce("n_anomalies", F.lit(0)).cast("long"))
        .withColumn(
            "not_before_backoff_s",
            F.round(F.col("not_before_s")
                    * F.when(F.col("n_anomalies") > 0,
                             F.lit(int(backoff)))
                    .otherwise(F.lit(1)), 6))
    )


def host_reputation(docs: DataFrame, host_col: str = "host",
                    text_col: str = "text",
                    ppm: int = 1_000_000) -> DataFrame:
    """Per-host crawl-quality profile — the seed-prioritization signal a
    frontier scheduler reads (a host that keeps serving duplicates or
    junk earns less fetch budget): document count, exact-duplicate rate
    (content fingerprints), mean quality score, and a combined
    reputation = mean quality discounted by the duplicate rate.

    Exactness posture: per-doc quality (already round(.,6) on both
    engines) integer-scales as ``floor(q * ppm + 0.5)`` — within 1e-9
    of an integer, so the +0.5 floor is deterministic — and every
    downstream ratio is integer division (``div``/``//`` agree), so the
    row hash-matches with no float summation anywhere.

    Scale shape: zero-shuffle per-doc fingerprint+score, then one
    host-keyed aggregate family (the distinct-fingerprint count expands
    to a (host, fp) pre-aggregate — fingerprints only cross the
    exchange, never text).  Output: (host_col, n_docs, n_unique,
    dup_rate_ppm, mean_quality_ppm, reputation_ppm)."""
    from .text import normalized, quality_score

    per = docs.select(
        F.col(host_col).alias("host"),
        F.md5(normalized(text_col)).alias("_fp"),
        F.floor(quality_score(text_col) * ppm + F.lit(0.5))
        .cast("long").alias("_q"),
    )
    agg = per.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("_fp").cast("long").alias("n_unique"),
        F.sum("_q").alias("_sq"),
    )
    return agg.select(
        F.col("host").alias(host_col), "n_docs", "n_unique",
        F.expr(f"((n_docs - n_unique) * {ppm}) div n_docs")
        .alias("dup_rate_ppm"),
        F.expr("_sq div n_docs").alias("mean_quality_ppm"),
        F.expr(f"((_sq div n_docs) * "
               f"({ppm} - ((n_docs - n_unique) * {ppm}) div n_docs)) "
               f"div {ppm}").alias("reputation_ppm"),
    )


# sitemaps.org XML: <urlset><url><loc/><lastmod/><changefreq/>
# <priority/></url>... or an index <sitemapindex><sitemap><loc/>...
# Tags are lowercase per the protocol; (?s) because entries span lines.
SITEMAP_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
SITEMAP_INDEX_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ_RE = r"(?s)<changefreq>\s*(.*?)\s*</changefreq>"
_PRIORITY_RE = r"(?s)<priority>\s*(.*?)\s*</priority>"


def parse_sitemap(df: DataFrame, xml_col: str = "xml",
                  id_col: str = "doc_id",
                  carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """Explode sitemap XML into one row per entry — the frontier-seeding
    step after :func:`~.robots.robots_sitemaps` surfaces the files:
    ``<urlset>`` entries come out as kind ``url`` (loc, lastmod,
    changefreq, priority — priority defaults to 0.5 per the protocol,
    unparseable values fall back via try_cast), ``<sitemapindex>``
    entries as kind ``sitemap`` (loc only; fetch-and-recurse is the
    consumer's loop).  Zero-shuffle regexp codegen, the warc_parse
    posture; patterns stay in the Java-regex/RE2 common subset.
    Output: (id_col, kind, loc, lastmod, changefreq, priority,
    *carry_cols) — per-file metadata rides ``carry_cols`` replicated
    onto every entry (the warc-parse carry posture; a join-back would
    break the zero-shuffle/streaming contract)."""
    def entries(block_re: str, kind: str, with_meta: bool) -> DataFrame:
        blocks = F.regexp_extract_all(F.col(xml_col), F.lit(block_re), 1)
        ex = df.select(F.col(id_col),
                       *[F.col(c) for c in carry_cols],
                       F.explode(blocks).alias("b"))
        loc = F.regexp_extract("b", _LOC_RE, 1)
        if with_meta:
            meta = [
                F.nullif(F.regexp_extract("b", _LASTMOD_RE, 1), F.lit(""))
                .alias("lastmod"),
                F.nullif(F.regexp_extract("b", _CHANGEFREQ_RE, 1),
                         F.lit("")).alias("changefreq"),
                F.coalesce(
                    F.regexp_extract("b", _PRIORITY_RE, 1)
                    .try_cast("double"),
                    F.lit(0.5)).alias("priority"),
            ]
        else:
            meta = [F.lit(None).cast("string").alias("lastmod"),
                    F.lit(None).cast("string").alias("changefreq"),
                    F.lit(None).cast("double").alias("priority")]
        return ex.select(F.col(id_col), F.lit(kind).alias("kind"),
                         loc.alias("loc"), *meta,
                         *[F.col(c) for c in carry_cols]
                         ).where(F.col("loc") != "")

    return entries(SITEMAP_URL_BLOCK_RE, "url", True).unionByName(
        entries(SITEMAP_INDEX_BLOCK_RE, "sitemap", False))


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_col: str = "url",
                  text_col: str = "text") -> DataFrame:
    """Change classification between two crawl snapshots keyed by URL —
    the bookkeeping an incremental pipeline runs to decide what to
    re-extract: ``added`` (key only in the new snapshot), ``removed``
    (only in the old), ``changed`` (both sides, content fingerprint
    differs), ``unchanged``.

    The one-row-per-key-per-side contract is ENFORCED, not assumed: a
    snapshot carrying duplicate keys (a re-crawl that fetched one URL
    twice) collapses to its minimum fingerprint per key — the keep-min
    keeper rule of url_dedup, deterministic on both engines — so a
    duplicated key classifies once instead of fanning out up to 4 join
    rows with mixed classifications.

    Scale shape: zero-shuffle fingerprinting on each side, then one
    key-keyed min-aggregate (map-side combine; a no-op exchange-wise
    when keys are already unique) feeding ONE full-outer equi-join on
    the key — no text ever crosses the join (fingerprints only, the
    snapshot_profile posture).
    Output: (key_col, change)."""
    from .text import normalized

    o = (old.select(F.col(key_col).alias("k"),
                    F.md5(normalized(text_col)).alias("_fp"))
         .groupBy("k").agg(F.min("_fp").alias("ofp")))
    n = (new.select(F.col(key_col).alias("k"),
                    F.md5(normalized(text_col)).alias("_fp"))
         .groupBy("k").agg(F.min("_fp").alias("nfp")))
    return (
        o.join(n, "k", "full_outer")
        .select(
            F.col("k").alias(key_col),
            F.when(F.col("ofp").isNull(), F.lit("added"))
            .when(F.col("nfp").isNull(), F.lit("removed"))
            .when(F.col("ofp") != F.col("nfp"), F.lit("changed"))
            .otherwise(F.lit("unchanged")).alias("change"),
        )
    )


def scd2_history(snapshots: DataFrame, key_col: str = "url",
                 snap_col: str = "snap_id",
                 text_col: str = "text") -> DataFrame:
    """SCD-type-2 effective-dated history over a sequence of crawl
    snapshots — the storage layout an incremental pipeline keeps so any
    past crawl can be reconstructed without storing every copy: one row
    per (key, content-version run) with its validity interval.  The
    multi-snapshot generalization of :func:`snapshot_diff` (which
    classifies exactly two snapshots).

    Input: one row per OBSERVED (key, snapshot); a key absent from a
    snapshot simply has no observation there — a run whose fingerprint
    matches across the gap stays one run (``n_snaps`` counts observed
    snapshots, so gaps are auditable as ``n_snaps < last_seen -
    valid_from + 1``).

    ``valid_to`` is EXCLUSIVE (the next version's ``valid_from``), NULL
    while current — adjacent intervals tile without overlap, the SCD2
    join contract (``from <= s < to``).

    Scale shape: ONE exchange on the key carries the whole plan — the
    run detection (lag + running sum), the per-run frame aggregates
    (window over (key, version): hash(key) already clusters them), the
    run collapse (filter to run starts, no second shuffle), and the
    valid_to stitch (lead over key) are all window passes on the same
    partitioning; only fingerprints cross the exchange, never text.
    Output: (key_col, fingerprint, version, valid_from, valid_to,
    last_seen, n_snaps, is_current)."""
    from pyspark.sql import Window as W

    from .text import normalized

    fp = snapshots.select(
        F.col(key_col).alias("k"),
        F.col(snap_col).cast("long").alias("snap"),
        F.md5(normalized(text_col)).alias("fingerprint"),
    )
    wk = W.partitionBy("k").orderBy("snap")
    runs = fp.withColumn(
        "chg",
        F.when(F.lag("fingerprint").over(wk).isNull()
               | (F.lag("fingerprint").over(wk) != F.col("fingerprint")),
               F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("version", F.sum("chg").over(
        wk.rowsBetween(W.unboundedPreceding, W.currentRow)))
    frame = (W.partitionBy("k", "version")
             .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    per_run = runs.select(
        "k", "fingerprint", "version", "chg",
        F.min("snap").over(frame).alias("valid_from"),
        F.max("snap").over(frame).alias("last_seen"),
        F.count(F.lit(1)).over(frame).cast("long").alias("n_snaps"),
    ).where(F.col("chg") == 1).drop("chg")
    wv = W.partitionBy("k").orderBy("version")
    return per_run.select(
        F.col("k").alias(key_col), "fingerprint",
        F.col("version").cast("long").alias("version"),
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "last_seen", "n_snaps",
        F.when(F.lead("valid_from").over(wv).isNull(), F.lit(1))
        .otherwise(F.lit(0)).alias("is_current"),
    )


def sitemap_gz_parse(media: DataFrame, id_col: str = "doc_id",
                     content_col: str = "content",
                     max_bytes: int | None = None) -> DataFrame:
    """Gzipped sitemap ingestion (round 13): real crawls deliver
    ``sitemap.xml.gz`` (the protocol caps files at 50 MB UNCOMPRESSED
    and recommends gzip), so peel the compression layer with the SAME
    bounded gunzip the warc.gz front door uses
    (functions/html.py:gunzip_members — budgeted output, typed errors
    on corrupt members) and feed the SAME :func:`parse_sitemap`
    rendering.  One mapInPandas + zero-shuffle regexp expressions —
    streaming-safe like parse_warc_gz.  Output: parse_sitemap columns
    plus ``n_members``."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from .html import gunzip_members

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("xml", T.StringType(), True),
        T.StructField("n_members", T.IntegerType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def peel(b: bytes) -> tuple[str, int]:
                raw, n = gunzip_members(bytes(b), max_bytes=max_bytes)
                return raw.decode("utf-8", errors="replace"), n

            o = pdf[content_col].map(peel)
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "xml": o.map(lambda t: t[0]),
                "n_members": o.map(lambda t: t[1]).astype("int32"),
            })

    xml = media.select(id_col, content_col).mapInPandas(run, schema)
    return parse_sitemap(xml, id_col=id_col,
                         carry_cols=("n_members",))
