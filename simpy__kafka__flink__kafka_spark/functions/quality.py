"""Published corpus-quality rule sets as exact, oracle-checkable column
expressions: the C4 sentence-level cleanup (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning...", appendix of the C4
construction) and the Gopher document-level quality rules (Rae et al.
2021, "Scaling Language Models: ...Gopher", table A1).  Both papers'
rules are simple counts and ratios — re-expressed here with every
threshold compared in INTEGERS (``3 * n <= chars`` instead of
``chars / n >= 3``) so the Spark plan and the DuckDB oracle decide every
document identically with no float-division drift.

Scale shape: both operators are zero-shuffle — per-row array/regexp
expressions over the document scan, same posture as
:func:`..functions.text.quality_score` and the HTML extractor.

Reference parity note: the reference system has no corpus-quality
surface; this module belongs to the training-data-pipeline extension
operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalized, words

# The eight Gopher stop words (Rae et al. 2021, A1.1: "the, be, to, of,
# and, that, have, with") — a doc must contain at least STOP_MIN of them.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

# C4 blocklist fragments: any document containing one is dropped whole.
C4_BAD_FRAGMENTS = ("lorem ipsum", "{")

# Shared verbatim with the DuckDB oracle (RE2/Java common subset).
HREF_RE = '(?i)href="([^"]*)"'


def c4_sentence_filter(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       min_sentence_words: int = 3,
                       min_sentences: int = 3) -> DataFrame:
    """C4-style line/sentence cleanup on the normalized text: split into
    sentences at ``". "`` boundaries, KEEP sentences with at least
    ``min_sentence_words`` whitespace words, then keep the DOC only if at
    least ``min_sentences`` sentences survive and no blocklist fragment
    ("lorem ipsum", "{") appears anywhere.  clean_text is the kept
    sentences re-joined with ". " (trailing punctuation of the final
    sentence preserved as-is — split semantics, not re-punctuation).

    Zero-shuffle: split -> filter -> array_join per row.
    Output: (id_col, n_sentences, n_kept, doc_kept: int, clean_text) —
    clean_text is empty when the doc is dropped.
    """
    t = normalized(text_col)
    sents = F.split(t, r"\. ")
    nonempty = F.filter(sents, lambda s: F.length(s) > 0)
    kept = F.filter(
        nonempty,
        lambda s: F.size(F.split(s, " ")) >= min_sentence_words,
    )
    bad = F.lit(False)
    for frag in C4_BAD_FRAGMENTS:
        bad = bad | t.contains(frag)
    doc_kept = (~bad) & (F.size(kept) >= min_sentences)
    return df.select(
        F.col(id_col),
        F.size(nonempty).cast("long").alias("n_sentences"),
        F.size(kept).cast("long").alias("n_kept"),
        doc_kept.cast("int").alias("doc_kept"),
        F.when(doc_kept, F.array_join(kept, ". ")).otherwise(F.lit(""))
        .alias("clean_text"),
    )


def _count_fragment(t: Column, frag: str) -> Column:
    """Occurrences of a literal fragment — (len(t) - len(t without frag))
    / len(frag), exact and regex-free on both engines."""
    return (
        (F.length(t) - F.length(F.replace(t, F.lit(frag), F.lit(""))))
        / F.lit(len(frag))
    ).cast("long")


def gopher_quality(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: int = 3,
                   max_mean_word_len: int = 10,
                   min_stop_hits: int = 2,
                   keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, A1.1) with every
    ratio threshold decided in integers:

    - word count in [min_words, max_words]
    - mean word length in [min_mean_word_len, max_mean_word_len]
      (``min * n <= total_chars <= max * n``)
    - symbol-to-word ratio (``#`` or ``...``) <= 0.1  (``10 * symbols <=
      n_words``)
    - >= 80% of words contain an alphabetic character (``5 * alpha >=
      4 * n_words``)
    - at least ``min_stop_hits`` of the eight Gopher stop words present
      (with multiplicity)

    Zero-shuffle per-row expressions.  Output: (id_col, n_words,
    total_word_chars, n_symbols, n_alpha_words, n_stop_hits,
    passes: int) plus any ``keep_cols`` passed through verbatim — a
    composition hook so a pipeline can gate on ``passes`` and keep the
    scored text WITHOUT a join-back (a join would fork the upstream plan
    into two branches that each recompute it).
    """
    t = normalized(text_col)
    ws = words(text_col)
    n_words = F.size(ws)
    total_chars = F.aggregate(
        ws, F.lit(0), lambda acc, w: acc + F.length(w))
    n_symbols = _count_fragment(t, "#") + _count_fragment(t, "...")
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    n_stops = F.size(F.filter(ws, lambda w: w.isin(*GOPHER_STOPS)))
    passes = (
        (n_words >= min_words) & (n_words <= max_words)
        & (total_chars >= min_mean_word_len * n_words)
        & (total_chars <= max_mean_word_len * n_words)
        & (10 * n_symbols <= n_words)
        & (5 * n_alpha >= 4 * n_words)
        & (n_stops >= min_stop_hits)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        total_chars.cast("long").alias("total_word_chars"),
        n_symbols.cast("long").alias("n_symbols"),
        n_alpha.cast("long").alias("n_alpha_words"),
        n_stops.cast("long").alias("n_stop_hits"),
        passes.cast("int").alias("passes"),
        *[F.col(c) for c in keep_cols],
    )


# Java-regex/RE2 common subset, shared verbatim with the DuckDB oracle.
DOMAIN_RE = "^[a-z][a-z0-9+.-]*://([^/?#]*)"


def url_domain(url: Column | str) -> Column:
    """Registrable host part of a URL (scheme-prefixed), lowercased;
    empty string for scheme-less / relative URLs."""
    u = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(F.lower(u), DOMAIN_RE, 1)


def cap_per_domain(df: DataFrame, max_per_domain: int = 20,
                   id_col: str = "doc_id",
                   url_col: str = "url") -> DataFrame:
    """Per-domain document cap — the RefinedWeb/FineWeb rebalancing stage
    that stops a handful of mega-domains from dominating the corpus:
    keep the ``max_per_domain`` lowest-``id_col`` documents of each
    domain (deterministic rank, ties impossible on a unique id).

    Scale shape: ONE shuffle keyed on the domain (the window partition).
    Skew note for 100 TB: a mega-domain's partition holds all its docs
    even though only K survive; if a single domain exceeds executor
    memory, pre-filter with an approximate per-partition top-K before
    the window (the sharded-prefix pattern in operators/sequences.py) —
    at the cap values used in practice (10^2..10^4 docs/domain) the
    plain window is the right default, and AQE splits oversized
    partitions at runtime.
    Output: (id_col, domain, domain_rank) for KEPT docs only.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("domain").orderBy(id_col)
    return (
        df.select(F.col(id_col), url_domain(url_col).alias("domain"))
        .withColumn("domain_rank", F.row_number().over(w))
        .where(F.col("domain_rank") <= max_per_domain)
    )


def extract_links(df: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """Outlink extraction from raw HTML — the web-graph side of the
    extraction front door: every ``href="..."`` target, counted raw and
    distinct, with a deterministic fingerprint of the sorted distinct
    target set (hash-safe stand-in for the array column at the gate).
    Zero-shuffle per-row expressions; the pattern stays in the
    Java-regex/RE2 common subset for the oracle.
    Output: (id_col, n_links, n_unique_targets, targets_hash).
    """
    targets = F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1)
    uniq = F.array_sort(F.array_distinct(targets))
    return df.select(
        F.col(id_col),
        F.size(targets).cast("long").alias("n_links"),
        F.size(uniq).cast("long").alias("n_unique_targets"),
        F.md5(F.array_join(uniq, "\n")).alias("targets_hash"),
    )


# href value in ALL THREE attribute forms real HTML carries — double-
# quoted, single-quoted, unquoted (to the next whitespace/'>').  Design
# points (every one is pinned by the 18-case cross-engine matrix in
# tests/test_advice_fixes_r10.py):
# - ``<a\s``: the tag NAME must be exactly ``a`` — ``<area href=...>``
#   (image maps carry href by spec) fabricates nothing;
# - the tag-prefix walker consumes other attributes as whole quoted
#   units or quote-free runs, so an ``href=`` INSIDE another
#   attribute's quoted value (title="see href=/fake") is never claimed;
#   prefix quoted units are '>'-BOUNDED so an unbalanced quote can at
#   worst drop THIS tag's anchor, never swallow into following tags;
# - href must follow whitespace (``data-href=`` never matches);
# - the tag-tail walker is simply ``[^>]*`` — the tag ends at the FIRST
#   '>' after the href (safe post-capture: the href is already taken,
#   and quoted units in the prefix/tail grammar are '>'-free anyway, so
#   a unit-aware walker would stop at the identical '>').  An earlier
#   quote-unit-or-lone-quote alternation matched the SAME language but
#   was ambiguous (a quote parses as unit-start or as lone quote) and
#   backtracked exponentially on Java/PCRE over adversarial quote runs
#   with no closing '>' — one crawled page could hang an executor while
#   the RE2 oracle (linear) never saw it.
# Documented recall tradeoffs (regex engines without atomic groups —
# the RE2/Java common subset — cannot avoid all of these at once):
# - a tag whose earlier UNQUOTED attribute value contains a quote
#   character (title=don't ... href=...) drops its anchor rather than
#   risking a fabricated one;
# - a raw '>' inside a quoted attribute value BEFORE the href (or in
#   the href value itself — where valid URLs pct-encode it) drops the
#   anchor; AFTER the href it only truncates the tag there, so the
#   target survives and at worst the anchor text carries value
#   remnants.
# Group 1 is the RAW href token (quotes included; the alternation
# keeps it free of nested groups), group 2 the anchor text;
# _unquote_href strips one symmetric quote pair.
ANCHOR_RE = ("(?is)<a\\s(?:(?:\"[^\">]*\"|'[^'>]*'|[^>\"'])*?\\s)?"
             "href\\s*=\\s*"
             "(\"[^\">]*\"|'[^'>]*'|[^\\s>\"'][^\\s>]*)"
             "[^>]*>(.*?)</a>")


def _unquote_href(raw: Column) -> Column:
    """Strip EXACTLY ONE symmetric surrounding quote pair from a raw
    href token — a single alternation pass, because two sequential
    strips would also peel inner quotes (``href="'x'"`` must yield
    ``'x'``, not ``x``).  A backreference to the non-participating
    alternative is empty on both engines ((?s) so a value containing a
    newline still unquotes)."""
    return F.regexp_replace(raw, "(?s)^\"(.*)\"$|^'(.*)'$", "$1$2")


def anchor_texts(df: DataFrame, html_col: str = "html",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-TARGET anchor-text aggregation — the classic web-corpus
    relevance signal (what other pages' link text says a URL is about):
    every ``<a href=...>text</a>`` pair folds into its target's
    profile, whichever of the three attribute quote forms the page
    uses (double-quoted, single-quoted, unquoted — all common in real
    HTML; dropping the latter two understated n_anchors).  Inner markup
    is stripped from the anchor text; whitespace-trimmed.

    Scale shape: zero-shuffle per-page extraction (regexp + array
    transform, the robots-rules pattern) + ONE target-keyed exchange;
    the per-target state is the postings-hash convention
    (zero-padded "doc:text" entries, sorted — order-canonical so both
    engines hash the identical string).
    Output: (target, n_anchors, n_unique_texts, anchors_hash)."""
    m = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 0)
    pairs = F.transform(
        m,
        lambda x: F.struct(
            _unquote_href(F.regexp_extract(x, ANCHOR_RE, 1))
            .alias("target"),
            F.trim(F.regexp_replace(
                F.regexp_extract(x, ANCHOR_RE, 2),
                "<[^>]*>", "")).alias("anchor"),
        ))
    rows = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(pairs).alias("p"))
            .select("doc_id", F.col("p.target").alias("target"),
                    F.col("p.anchor").alias("anchor")))
    entry = F.concat(F.lpad(F.col("doc_id").cast("string"), 12, "0"),
                     F.lit(":"), F.col("anchor"))
    return rows.groupBy("target").agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.countDistinct("anchor").cast("long").alias("n_unique_texts"),
        F.md5(F.array_join(F.array_sort(F.collect_list(entry)), "|"))
        .alias("anchors_hash"),
    )


# Robots / noindex filtering --------------------------------------------------
# The crawl-compliance gate a pipeline runs right after extraction: a
# page opting out via <meta name="robots"> or an X-Robots-Tag response
# header must not enter the training corpus (noindex) and must not
# contribute outlinks (nofollow).  Zero-shuffle regexp codegen; every
# pattern stays in the Java-regex/RE2 common subset for the oracle.

# both attribute orders (name before content and content before name)
META_ROBOTS_RE = ('(?is)<meta[^>]*name\\s*=\\s*"robots"[^>]*'
                  'content\\s*=\\s*"([^"]*)"')
META_ROBOTS_REV_RE = ('(?is)<meta[^>]*content\\s*=\\s*"([^"]*)"[^>]*'
                      'name\\s*=\\s*"robots"')
X_ROBOTS_RE = "(?im)^x-robots-tag:\\s*([^\\r\\n]*)"
# token-wise membership: 'noindex' must be a ,/space-delimited token of
# the directive list, not a substring of another token
_NOINDEX_TOK_RE = "(?i)(^|[, ])(noindex|none)([, ]|$)"
_NOFOLLOW_TOK_RE = "(?i)(^|[, ])(nofollow|none)([, ]|$)"


def robots_directives(html_col: str = "html",
                      headers_col: str | None = None) -> Column:
    """Folded robots directive string for one page: ALL meta robots
    tags (both attribute orders) and ALL X-Robots-Tag header lines —
    real pages commonly carry several of each, and a later tag adding
    ``noindex`` is just as binding as the first (union-of-directives,
    the most-restrictive reading crawlers apply).  A plain zero-shuffle
    column expression, so it composes into streaming selects as well as
    :func:`robots_flags`."""
    h = F.col(html_col)
    return F.concat_ws(
        ",",
        F.array_join(F.regexp_extract_all(h, F.lit(META_ROBOTS_RE), 1), ","),
        F.array_join(
            F.regexp_extract_all(h, F.lit(META_ROBOTS_REV_RE), 1), ","),
        (F.array_join(
            F.regexp_extract_all(F.col(headers_col), F.lit(X_ROBOTS_RE), 1),
            ",")
         if headers_col is not None else F.lit("")),
    )


def robots_flags(df: DataFrame, html_col: str = "html",
                 headers_col: str | None = None,
                 id_col: str = "doc_id") -> DataFrame:
    """Per-page robots directives: EVERY meta robots tag (both attribute
    orders) and, when ``headers_col`` carries the HTTP response header
    block, EVERY X-Robots-Tag line — directives union across tags/lines,
    so a second tag carrying ``noindex`` binds even when the first says
    ``index``.  ``none`` implies both noindex and
    nofollow (RFC 9309 / Google semantics).  Output: (id_col,
    noindex: int, nofollow: int, indexable: int) — filter on
    ``indexable == 1`` before admitting pages, and drop outlinks of
    ``nofollow == 1`` pages before the web-graph stage."""
    directives = robots_directives(html_col, headers_col)
    noindex = directives.rlike(_NOINDEX_TOK_RE)
    nofollow = directives.rlike(_NOFOLLOW_TOK_RE)
    return df.select(
        F.col(id_col),
        noindex.cast("int").alias("noindex"),
        nofollow.cast("int").alias("nofollow"),
        (~noindex).cast("int").alias("indexable"),
    )


# Hashing-trick linear quality scorer -----------------------------------------

HASH_DIM = 4096          # feature buckets (fastText-style hashing trick)


def _bucket_weight(bucket: Column) -> Column:
    """Deterministic integer weight for a feature bucket: md5-hex fold of
    'w:<bucket>' mapped to [-500, 500].  A stand-in weight vector with
    the exact storage/plan shape of a trained one (production swaps in
    learned weights via the same broadcast column expression); integer
    weights keep the logit EXACT on both engines."""
    from .text import md5_bucket

    return md5_bucket(F.concat(F.lit("w:"), bucket.cast("string")),
                      1001) - 500


def linear_quality_score(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         dim: int = HASH_DIM) -> DataFrame:
    """Classifier-based quality filtering in the fastText shape (the
    GPT-3/LLaMA corpus-filter step): every word hashes into one of
    ``dim`` feature buckets (hashing trick — no vocabulary table at any
    corpus size) and the document logit is the sum of its buckets'
    weights, counted WITH multiplicity.  Weights here are the
    deterministic :func:`_bucket_weight` stand-in so the whole operator
    is integer-exact and oracle-checkable; a trained model drops into
    the same expression.  The mean weight (logit / n_words) is the
    length-normalized score a threshold filter consumes.

    Zero-shuffle: per-row array expressions only.
    Output: (id_col, n_words, logit, mean_weight).
    """
    from .text import words

    ws = words(text_col)
    from .text import md5_bucket

    bucket = lambda w: md5_bucket(w, dim)  # noqa: E731
    logit = F.aggregate(
        ws, F.lit(0).cast("long"),
        lambda acc, w: acc + _bucket_weight(bucket(w)),
    )
    n = F.size(ws)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        logit.alias("logit"),
        F.round(
            F.when(n > 0, logit.cast("double") / n.cast("double"))
            .otherwise(F.lit(0.0)), 6).alias("mean_weight"),
    )


# Bigram language-model scoring ----------------------------------------------

LM_SCALE = 10 ** 9       # integer probability scale (see bigram_lm_score)


def bigram_lm_score(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    counts_df: DataFrame | None = None) -> DataFrame:
    """KenLM-style corpus-fluency scoring with a bigram LM — the quality
    signal CCNet/RedPajama filter on — made hash-oracle-checkable by
    keeping EVERY step in integers: the add-one-smoothed conditional
    probability of each bigram is scaled to ``LM_SCALE`` with floor
    division, and a doc's score is the floor-mean of its bigram scores.
    (Real perplexity takes logs — float, engine-divergent; the scaled
    linear-space mean ranks docs the same way for filtering purposes and
    is bit-identical across engines.)

    ``counts_df`` lets a deployment score against counts trained on a
    REFERENCE corpus (the CCNet posture: a Wikipedia-trained LM scores
    the crawl); default trains on the scored corpus itself.  Expected
    columns: (w1, w2, c2) bigram counts.

    Scale shape: one exchange for the bigram count table, one for the
    unigram prefix table (both map-side combined), then two keyed joins
    of the doc-bigram stream and the per-doc aggregation.  Vocabulary
    size rides as a broadcast 1-row aggregate.  Keep-empty contract:
    docs with < 2 words keep a row with n_bigrams 0 and lm_score 0.
    Output: (id_col, n_bigrams, lm_score) — lm_score in [0, LM_SCALE].
    """
    from .text import words

    from ..cachepin import pin

    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))
    # adjacent pairs via zip_with over the word array (the bpe
    # _adjacent_pairs shape) — zero-join bigram derivation, one scan,
    # instead of a positional self-join that re-executes per reference
    arr = words("text")
    n1 = F.greatest(F.size(arr) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(arr, 1, n1), F.slice(arr, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    bigrams = (
        base.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        .where((F.length("w1") > 0) & (F.length("w2") > 0))
    )
    # pinned (round-15): the instance stream feeds BOTH the count table
    # and the scoring join — unpinned, the split+zip_with+explode ran
    # twice (the dsir_weights pattern; at 100 TB this is the persisted
    # tokenized frame both passes read)
    bigrams = pin(bigrams)
    if counts_df is None:
        # pinned: the count table feeds the prefix table, the vocab
        # aggregate, AND the scoring join — vocabulary-sized (bounded),
        # so the pin is safe at any corpus size
        counts_df = pin(bigrams.groupBy("w1", "w2")
                        .agg(F.count(F.lit(1)).alias("c2")))
    uni = counts_df.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = counts_df.select("w2").union(counts_df.select("w1")) \
        .distinct().agg(F.count(F.lit(1)).alias("v"))
    scored = (
        bigrams
        .join(counts_df, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(f"((coalesce(c2, 0) + 1) * {LM_SCALE}) div "
                   "(coalesce(c1, 0) + v)").alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
             F.expr("sum(p) div count(1)").cast("long").alias("lm_score"))
    )
    return base.select("doc_id").join(scored, "doc_id", "left").select(
        F.col("doc_id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("lm_score", F.lit(0)).cast("long").alias("lm_score"),
    )


def ccnet_buckets(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3,
                  counts_df: DataFrame | None = None) -> DataFrame:
    """CCNet-style per-language fluency bucketing (Wenzek et al. 2020):
    within each predicted language, docs are split into ``k`` equal
    quantile buckets by LM fluency — head (most fluent), middle, tail —
    the selection signal CCNet/RedPajama pipelines keep or drop whole
    buckets on.  Fluency is :func:`bigram_lm_score` (higher = head);
    ``counts_df`` scores against a reference-corpus LM (the CCNet
    posture), default trains on the bucketed corpus itself.

    Scale shape: the per-language quantile rank is NOT a per-language
    window — one mega-language (90% of a crawl is English) must never
    become a single sorted task (the crawl_schedule / frontier_rank
    lesson).  It composes the scale-safe ranged operators instead: a
    global ranged row_number over (lang, -lm_score, doc_id) minus each
    language's exclusive prefix count over lang order — identical
    output to ``row_number() OVER (PARTITION BY lang ORDER BY lm_score
    DESC, doc_id)``, which is exactly what the oracle runs.  The
    bucket is the integer formula ``((rank - 1) * k) div n_lang``
    (contiguous quantiles, sizes differing by at most one) rather than
    SQL ntile, whose first-groups-get-the-remainder layout is harder
    to reproduce scale-safely for no filtering benefit.

    Output: (id_col, lang, lm_score, bucket_idx, bucket) — bucket is
    head/middle/tail for k=3, ``b{i}`` otherwise."""
    from ..cachepin import pin
    from ..operators.sequences import ranged_row_number
    from .text import language_id_agg

    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))
    # codegen agg form, not the interpreted per-row fold (round-15:
    # the per-row form cost ~3.5 s of this plan's 5 s at sf0.1)
    lang = language_id_agg(base)
    lm = bigram_lm_score(base, counts_df=counts_df).select(
        "doc_id", "lm_score")
    # pinned: repartitionByRange's boundary sampling would otherwise
    # re-execute the lang + LM subtree a second time (the frontier_rank
    # precedent)
    scored = pin(lang.join(lm, "doc_id")
                 .withColumn("_neg", -F.col("lm_score")))
    ranked = ranged_row_number(scored, ["lang", "_neg", "doc_id"],
                               out_col="_gseq")
    # Each language's exclusive prefix count over lang order IS
    # min(_gseq) - 1 for that language (the global sequence is
    # contiguous over (lang, ...) order), so the offset table comes
    # straight off the ranked frame — one tiny lang-keyed aggregate —
    # instead of a second ranged_prefix_sum machinery (range exchange +
    # cache + triangle join) over the count frame (round-15 opt).
    offs = ranked.groupBy("lang").agg(
        (F.min("_gseq") - 1).cast("long").alias("_loff"),
        F.count(F.lit(1)).cast("long").alias("_n"))
    idx = F.expr(f"((_gseq - _loff - 1) * {k}) div _n").cast("int")
    if k == 3:
        label = (F.when(idx == 0, "head")
                 .when(idx == 1, "middle").otherwise("tail"))
    else:
        label = F.concat(F.lit("b"), idx.cast("string"))
    return (ranked.join(F.broadcast(offs), "lang")
            .select(F.col("doc_id").alias(id_col), "lang", "lm_score",
                    idx.alias("bucket_idx"), label.alias("bucket")))


def quality_classifier_trained(df: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text",
                               labels: DataFrame | None = None,
                               num_features: int = 1024) -> DataFrame:
    """fastText-style TRAINED quality classifier (the CCNet/LLaMA
    corpus-filter posture: a linear model over hashed bag-of-words
    scores P(high-quality) per doc).  Features are ``HashingTF`` over
    the shared whitespace tokenization; the model is
    ``pyspark.ml.classification.LogisticRegression`` (L-BFGS — zero
    init, so the fit is deterministic on fixed data with no seed).

    ``labels`` — (id_col, label double in {0,1}) — lets a deployment
    train on curated positives (wiki) vs crawl negatives; default is
    the WEAK-supervision stand-in this container can build: label 1
    where the heuristic :func:`quality_score` >= 0.5 (the classifier
    then generalizes the heuristic through lexical features — the
    standard bootstrap when no curated corpus is mounted).

    EAGER training (iterative L-BFGS passes — the kmeans_centroids
    exemption; train offline and persist coefficients at scale) and
    rows-only by policy: float sigmoid scores are not SQL-expressible.
    Scoring itself is one broadcast of the coefficient vector.

    Output: (id_col, label, prob_high double, pred int)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    from .text import quality_score, words

    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))
    if labels is None:
        labels = base.select(
            "doc_id",
            (quality_score("text") >= 0.5).cast("double").alias("label"))
    else:
        labels = labels.select(F.col(id_col).alias("doc_id"),
                               F.col("label").cast("double"))
    toks = base.select("doc_id", words("text").alias("ws"))
    tf = HashingTF(inputCol="ws", outputCol="features",
                   numFeatures=num_features)
    feats = tf.transform(toks)
    lr = LogisticRegression(featuresCol="features", labelCol="label",
                            maxIter=10, regParam=0.01)
    # train on the LABELED subset only; SCORE the whole corpus — with a
    # partial curated labels frame, generalizing to the unlabeled docs
    # is the entire point of the fastText-filter posture (an inner join
    # before transform would silently drop them from the output)
    model = lr.fit(feats.join(labels, "doc_id"))
    scored = model.transform(feats).join(labels, "doc_id", "left")
    return scored.select(
        F.col("doc_id").alias(id_col),
        F.col("label").cast("int").alias("label"),
        F.round(vector_to_array("probability")[1], 6).alias("prob_high"),
        F.col("prediction").cast("int").alias("pred"),
    )


# --- Gopher repetition-signal battery (round 13) -----------------------------

# Published thresholds (Rae et al. 2021, Table A1 "repetition removal"):
# a doc FAILS when any fraction exceeds its bound.  Kept as integer
# ppm so the pass flag is decided by integer comparison on both
# engines.
GOPHER_REP_THRESHOLDS_PPM = {
    "dup_line_ppm": 300_000,
    "dup_para_ppm": 300_000,
    "dup_line_char_ppm": 200_000,
    "dup_para_char_ppm": 200_000,
    "top2_char_ppm": 200_000,
    "top3_char_ppm": 180_000,
    "top4_char_ppm": 160_000,
    "dup5_char_ppm": 150_000,
    "dup10_char_ppm": 100_000,
}


def gopher_repetition(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Gopher repetition-removal signals (Rae et al. 2021, A1.2) —
    the published battery the one-number ``repetition_stats`` row
    summarizes — with every fraction scaled to INTEGER ppm (floor)
    so both engines decide every threshold identically:

    - ``dup_line_ppm`` / ``dup_para_ppm``: fraction of non-empty
      lines (split on ``\\n``) / paragraphs (``\\n\\n``) that are
      repeats of an earlier identical one;
    - ``dup_line_char_ppm`` / ``dup_para_char_ppm``: fraction of
      line/paragraph characters inside those repeats;
    - ``top{2,3,4}_char_ppm``: characters of the single most frequent
      word n-gram (count x joined length, ties to the
      lexicographically smallest gram) over normalized-text chars —
      counted only when the gram occurs at least twice (a gram seen
      once is not repetition; without the floor every short doc
      trivially fails);
    - ``dup{5,10}_char_ppm``: characters of words covered by ANY
      n-gram occurring twice or more — position-coverage union, the
      Dolma/RedPajama reading of Gopher's "characters contained in
      duplicated n-grams" — over normalized-text chars;
    - ``passes_repetition``: 1 iff every signal is within the
      published bound (:data:`GOPHER_REP_THRESHOLDS_PPM`).

    Scale shape: line/paragraph duplicate stats are in-row array
    expressions (array_distinct identities — zero shuffle, exact
    string comparison); the gram stage explodes at most ``4 + 5 + 10``
    tokens per word ONCE, its counting exchange keyed on
    ``(xxhash64 gram identity, length)`` so gram strings never leave
    the map stage (round-14, VERDICT r13 task 2), and ONE per-doc
    aggregation off that count carries the three top-gram maxima plus
    the n=5/10 dup-gram position lists (round-15: the former separate
    tops/covers branches re-executed the gram construction and paid an
    explode+distinct+join for coverage).  The top-gram lexicographic
    tie-break the published battery describes is value-invariant
    (tied grams have equal ``cnt * length``, and only that product
    reaches the output), so the top stage is a plain ``max``.  A
    same-doc same-length xxhash64 gram collision would merge two
    grams; at < 2^-40 per document this is the standard sketch-grade
    exemption (the md5-fingerprint dedup rows make the same trade).
    Docs with no words/lines keep a row with zero signals and
    ``passes_repetition`` 1 (the keep-empty contract).
    Output: (id_col, n_lines, all nine ppm columns,
    passes_repetition)."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))
    norm_len = F.length(normalized("text"))

    # Line/paragraph duplicate stats are per-doc facts over the doc's
    # own segments, so they never need to leave the row (round-15 opt:
    # the former explode -> groupBy(doc,h,slen) -> groupBy(doc) pair
    # cost two exchanges and a re-scan PER segmentation).  The dup
    # identities fall out of array_distinct:
    #   dup      = n - |distinct|        (sum over groups of cnt-1)
    #   dup_chars = chars - distinct_chars (sum of (cnt-1)*len)
    def seg_cols(sep: str, prefix: str) -> list[Column]:
        arr = F.filter(F.split("text", sep), lambda x: F.length(x) > 0)
        uq = F.array_distinct(arr)
        chars = F.aggregate(arr, F.lit(0).cast("long"),
                            lambda a, x: a + F.length(x))
        uchars = F.aggregate(uq, F.lit(0).cast("long"),
                             lambda a, x: a + F.length(x))
        return [
            F.size(arr).cast("long").alias(f"{prefix}_n"),
            (F.size(arr) - F.size(uq)).cast("long").alias(f"{prefix}_dup"),
            chars.alias(f"{prefix}_chars"),
            (chars - uchars).alias(f"{prefix}_dup_chars"),
        ]

    ws = words("text")

    # ONE pass over the corpus builds every n's grams (round-13 review:
    # five independent explode pipelines re-scanned the source per n).
    # No gram STRING is ever built (round-15, VERDICT r14 task 2): each
    # word is hashed/measured ONCE into wh/wl, and a gram's identity is
    # xxhash64 over the n-salted word-hash slice (words cannot contain
    # the join separator — words() splits on whitespace — so word-
    # sequence equality IS joined-string equality) with its length the
    # word-length-slice sum + (n-1) separators.  The n salt also
    # closes ADVICE r14 #3: cross-n collisions were already impossible
    # (n is a group key); now the hashed bytes differ too.
    warr = base.select(
        "doc_id",
        F.transform(ws, lambda w: F.xxhash64(w)).alias("wh"),
        F.transform(ws, lambda w: F.length(w)).alias("wl"))

    def gram_structs(n: int):
        cnt = F.size(F.col("wh")) - (n - 1)
        # sequence(1, 0) DESCENDS [1, 0] rather than being empty —
        # guard short docs explicitly
        seq = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)) \
            .otherwise(F.array().cast("array<int>"))
        return F.transform(seq, lambda i: F.struct(
            F.lit(n).alias("n"), i.alias("p"),
            F.xxhash64(F.lit(n), F.slice("wh", i, n)).alias("h"),
            (F.aggregate(F.slice("wl", i, n), F.lit(0),
                         lambda a, x: a + x)
             + F.lit(n - 1)).alias("glen")))

    g_all = warr.select(
        "doc_id",
        F.explode(F.concat(*[gram_structs(n)
                             for n in (2, 3, 4, 5, 10)])).alias("t")
    ).select("doc_id", "t.n", "t.p", "t.h", "t.glen")
    # Tops AND coverage ride ONE aggregation chain off gc (round-15
    # opt): the former separate tops/covers branches diverged after
    # Catalyst pruned the collect_list column from the tops side, so
    # the 21-structs-per-word construction executed TWICE and coverage
    # paid an explode+distinct exchange plus a per-word join.  One
    # groupBy(doc_id) now carries the three top maxima and the n=5/10
    # dup-gram position lists; coverage char sums are computed AFTER
    # the single doc-keyed join, from the row's own word-length array
    # (positions -> sequence -> flatten -> array_distinct -> sum of
    # element_at), bounded per doc by its word count.
    gc = g_all.groupBy("doc_id", "n", "h", "glen").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.collect_list(F.when(F.col("n").isin(5, 10), F.col("p")))
        .alias("ps"))
    # a gram seen ONCE is not repetition: without this floor every
    # short document trivially fails the top-gram bounds.  The
    # published tie-break (lexicographically smallest gram among those
    # with max cnt*length) never changes the VALUE cnt*length, so a
    # plain max replaces the former row_number window.
    tc = (F.col("cnt") * F.col("glen")).cast("long")
    dup2 = F.col("cnt") >= 2
    gagg = gc.groupBy("doc_id").agg(
        F.max(F.when(dup2 & (F.col("n") == 2), tc)).alias("_top2"),
        F.max(F.when(dup2 & (F.col("n") == 3), tc)).alias("_top3"),
        F.max(F.when(dup2 & (F.col("n") == 4), tc)).alias("_top4"),
        F.flatten(F.collect_list(
            F.when(dup2 & (F.col("n") == 5), F.col("ps")))).alias("_p5"),
        F.flatten(F.collect_list(
            F.when(dup2 & (F.col("n") == 10), F.col("ps")))).alias("_p10"))

    out = base.select(
        "doc_id", norm_len.alias("_nchars"),
        *seg_cols(r"\n", "line"), *seg_cols(r"\n\n", "para"),
        F.transform(ws, lambda w: F.length(w)).alias("_wl"),
    ).join(gagg, "doc_id", "left")

    # dup coverage: word positions covered by ANY >=2x gram (position
    # union via array_distinct), summed through the in-row lengths
    def cov_chars(parr: str, n: int) -> Column:
        cov = F.array_distinct(F.flatten(F.transform(
            F.col(parr),
            lambda p: F.sequence(p, p + F.lit(n - 1)))))
        return F.aggregate(cov, F.lit(0).cast("long"),
                           lambda a, x: a + F.element_at("_wl", x))

    out = out.withColumn("_dup5", cov_chars("_p5", 5)) \
             .withColumn("_dup10", cov_chars("_p10", 10))

    # ONE integer-ppm rendering: floor(1e6 * num / den), 0 on empty.
    # The numerator is truncated to an exact multiple of den first, so
    # the division is exact (no float-rounding parity risk); all
    # magnitudes stay far under 2^53.
    def ppm_of(num: Column, den: Column) -> Column:
        n2 = F.coalesce(num, F.lit(0)).cast("long") * 1_000_000
        d2 = F.coalesce(den, F.lit(0)).cast("long")
        return (F.when(d2 > 0, (n2 - n2 % d2) / d2)
                .otherwise(F.lit(0)).cast("long"))

    cols = {
        "dup_line_ppm": ppm_of(F.col("line_dup"), F.col("line_n")),
        "dup_para_ppm": ppm_of(F.col("para_dup"), F.col("para_n")),
        "dup_line_char_ppm": ppm_of(F.col("line_dup_chars"),
                                    F.col("line_chars")),
        "dup_para_char_ppm": ppm_of(F.col("para_dup_chars"),
                                    F.col("para_chars")),
        "top2_char_ppm": ppm_of(F.col("_top2"), F.col("_nchars")),
        "top3_char_ppm": ppm_of(F.col("_top3"), F.col("_nchars")),
        "top4_char_ppm": ppm_of(F.col("_top4"), F.col("_nchars")),
        "dup5_char_ppm": ppm_of(F.col("_dup5"), F.col("_nchars")),
        "dup10_char_ppm": ppm_of(F.col("_dup10"), F.col("_nchars")),
    }
    passes = F.lit(True)
    for name, expr in cols.items():
        passes = passes & (expr <= GOPHER_REP_THRESHOLDS_PPM[name])
    return out.select(
        F.col("doc_id").alias(id_col),
        F.coalesce("line_n", F.lit(0)).cast("long").alias("n_lines"),
        *[expr.alias(name) for name, expr in cols.items()],
        passes.cast("int").alias("passes_repetition"))
