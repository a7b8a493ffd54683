"""Text-analysis column expressions over the ``documents`` table — the
training-data-pipeline operators (language-ID, quality scoring, tokenizing,
shingling).  All expressions are built from JVM-side ``pyspark.sql.functions``
(no Python UDFs), so they stay inside whole-stage codegen and shuffle nothing
by themselves.

Cross-engine determinism contract (for the DuckDB oracles): every expression
here has an exact SQL twin — integer counts, ``md5`` hex strings, and
left-to-right double arithmetic only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Static stopword lists for the language-ID heuristic.  The heuristic is a
# stopword-hit vote (the classic cheap n-gram/stopword LID approach); it is
# deterministic and oracle-expressible.  Tie-break: first language in LANGS.
LANGS = ["en", "de", "fr", "es", "zh"]
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "en", "por", "para"],
    "zh": ["de", "shi", "bu", "wo", "ni", "ta", "men", "zai", "you", "le"],
}


def normalized(col: Column | str = "text") -> Column:
    """lower + trim + collapse whitespace (the dedup normal form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def words(col: Column | str = "text") -> Column:
    """Whitespace tokenization of the normalized text."""
    return F.split(normalized(col), " ")


def md5_bucket(col: Column, dim: int) -> Column:
    """THE cross-engine feature hash: first-6-hex-digit md5 fold modulo
    ``dim``.  One rendering shared by every hashing-trick consumer
    (linear_quality_score's buckets and stand-in weights, DSIR's gram
    buckets) — each oracled consumer's DuckDB twin replays the same
    strpos hex fold, so all copies MUST stay byte-identical; hence one
    helper (round-12 review fix: this expression existed inline three
    times)."""
    return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long") % dim


def token_count(col: Column | str = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def stopword_hits(ws: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang`` (with multiplicity)."""
    return F.size(F.filter(ws, lambda w: w.isin(STOPWORDS[lang])))


def language_scores(ws: Column) -> dict[str, Column]:
    return {lang: stopword_hits(ws, lang) for lang in LANGS}


def language_id(ws: Column) -> Column:
    """argmax over per-language stopword hits; ties go to the earlier entry
    in ``LANGS`` (deterministic).

    Per-row higher-order-filter form — interpreted, ~5x slower than the
    codegen :func:`language_id_agg` at sf0.1 (round-15 measurement; the
    _q_language_id comment recorded the same gap in round 4).  Use it
    only where a per-row COLUMN is required (streaming selects); batch
    plans that can afford one id-keyed exchange should use the agg
    twin."""
    scores = language_scores(ws)
    best_lang = F.lit(LANGS[0])
    best_score = scores[LANGS[0]]
    for lang in LANGS[1:]:
        better = scores[lang] > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    return best_lang


def language_id_agg(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    out_col: str = "lang") -> DataFrame:
    """(id_col, out_col) — :func:`language_id` as an explode +
    conditional-sum aggregation: whens over an exploded token column
    stay in whole-stage codegen, where the per-row array-filter lambdas
    are interpreted (5 langs x every row measured 2.6 s for 5000 docs).
    Same scores, same argmax fold, identical values — text is coalesced
    to '' before tokenizing, so ``words`` always yields >= 1 token
    (empty AND NULL text tokenize to [""]) and every input doc keeps a
    row (round-15 advice: the uncoalesced explode dropped NULL-text
    docs, which the inner joins in corpus_datasheet / ccnet_buckets
    then silently lost; the per-row twin returns LANGS[0] for NULL and
    so does this).  ONE exchange keyed on id_col."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    tok = df.select(
        F.col(id_col),
        F.explode(words(F.coalesce(c, F.lit("")))).alias("w"))
    agg = tok.groupBy(id_col).agg(*[
        F.sum(F.when(F.col("w").isin(STOPWORDS[lang]), 1).otherwise(0))
        .alias(f"s_{lang}")
        for lang in LANGS
    ])
    best_lang = F.lit(LANGS[0])
    best_score = F.col(f"s_{LANGS[0]}")
    for lang in LANGS[1:]:
        better = F.col(f"s_{lang}") > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, F.col(f"s_{lang}")).otherwise(best_score)
    return agg.select(F.col(id_col), best_lang.alias(out_col))


def quality_score(text_col: Column | str = "text") -> Column:
    """Heuristic quality in [0,1]: mixes length, punctuation density and
    stopword density — the standard cheap pretraining-corpus filters.

    score = 0.4 * min(n_tokens/100, 1)
          + 0.3 * (1 - min(punct_ratio * 10, 1))
          + 0.3 * min(stop_ratio * 5, 1)
    computed in doubles with the same literal ops on the oracle side.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    ws = words(c)
    n_tok = token_count(c).cast("double")
    n_chars = F.length(c).cast("double")
    n_punct = (
        F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))
    ).cast("double")
    n_stop = stopword_hits(ws, "en").cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    return F.round(
        0.4 * F.least(n_tok / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0)))
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0)),
        6,
    )


def winnow_fingerprints(df: DataFrame, n: int = 3, window: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every word ``n``-gram, slide a ``window`` over the hash sequence, keep
    each window's minimum — the distinct minima are the doc's fingerprint
    set.  Robust to local edits (an edit perturbs only nearby windows),
    which whole-document hashing is not; two docs sharing fingerprints share
    verbatim runs.

    Hashes compare as md5 hex STRINGS (lexicographic min — the same
    cross-engine determinism trick as MinHash).  The sliding min is a
    per-document window, so the heavy operator partitions on the
    high-cardinality doc id — scale-safe.  Docs with fewer than ``window``
    shingles emit no fingerprints (winnowing needs at least one full
    window).  Output: (id_col, fp) distinct rows.
    """
    from pyspark.sql import Window as W

    ws = words(text_col)
    k = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(ws, i + 1, k).alias(f"w{i}") for i in range(n)]
    )
    sh = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{i}"] for i in range(n)])
    )
    pos_sh = df.select(
        F.col(id_col), F.posexplode(sh).alias("pos", "shingle")
    ).withColumn("h", F.md5("shingle"))
    per_doc = W.partitionBy(id_col)
    win = per_doc.orderBy("pos").rowsBetween(W.currentRow, window - 1)
    return (
        pos_sh.withColumn("n_sh", F.count(F.lit(1)).over(per_doc))
        .withColumn("fp", F.min("h").over(win))
        .where(F.col("pos") <= F.col("n_sh") - window)  # full windows only
        .select(id_col, "fp")
        .distinct()
    )


def shingle_array(text_col: Column | str = "text", n: int = 3) -> Column:
    """Array of word ``n``-gram shingles for one document.

    Fewer than ``n`` words yields an empty array — matching DuckDB's
    ``generate_series(1, 0) -> []`` (Spark's ``sequence(1, 0)`` would count
    *down* — a real divergence trap).

    Built as n whole-array slices zipped, not one slice per shingle index —
    the per-index formulation (transform over sequence + slice) costs
    O(L·n) interpreted lambda calls per doc and dominated the dedup
    pipeline (4.7 s for 5000 docs at sf0.1; this shape is ~5x faster).
    """
    ws = words(text_col)
    k = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(ws, i + 1, k).alias(f"w{i}") for i in range(n)]
    )
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{i}"] for i in range(n)])
    )


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text",
             distinct_within_doc: bool = False) -> DataFrame:
    """Explode each document into its word ``n``-gram shingles.

    Output: (id_col, shingle).  Documents with fewer than ``n`` words emit
    no rows (see :func:`shingle_array`).

    ``distinct_within_doc=True`` dedups the shingles INSIDE each doc's
    array before exploding (``array_distinct`` — row-local, zero shuffle):
    the map-side partial dedup for consumers that only care about the
    per-doc shingle SET.  On repetitive docs this shrinks the exploded
    stream without ever exchanging the corpus — the middle ground between
    the raw multiset (cheapest to produce, largest downstream) and a
    corpus-wide ``.distinct()`` (smallest downstream, but a full
    exchange).  Order within the array is first-occurrence order.
    """
    arr = shingle_array(text_col, n)
    if distinct_within_doc:
        arr = F.array_distinct(arr)
    return df.select(
        F.col(id_col), F.explode(arr).alias("shingle")
    )


def repetition_stats(df: DataFrame, n: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Within-document repetition: fraction of word ``n``-grams that are
    repeats of an earlier ``n``-gram in the same doc — the standard cheap
    filter for looping/boilerplate text in a pretraining corpus (a high
    ratio means the doc is mostly self-copies).

    Pure per-row column expressions (size / array_distinct on the shingle
    array) — whole-stage codegen, zero shuffles, trivially scale-safe.
    Output: (id_col, n_shingles, n_distinct, rep_ratio) with
    rep_ratio = round(1 - distinct/total, 6), 0.0 for docs too short to
    shingle.
    """
    sh = shingle_array(text_col, n)
    n_sh = F.size(sh).cast("long")
    n_d = F.size(F.array_distinct(sh)).cast("long")
    return df.select(
        F.col(id_col),
        n_sh.alias("n_shingles"),
        n_d.alias("n_distinct"),
        F.round(
            F.when(n_sh > 0, 1.0 - n_d.cast("double") / n_sh.cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("rep_ratio"),
    )


def contaminated_docs(df: DataFrame, n: int = 8, bench_mod: int = 10,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      corpus_side: str = "doc_distinct") -> DataFrame:
    """Benchmark-contamination check: corpus documents sharing any verbatim
    word ``n``-gram with a held-out benchmark set — the pre-training hygiene
    scan that keeps eval data out of the corpus.  The benchmark here is the
    deterministic slice ``id % bench_mod == 0`` (in production: the actual
    eval suites, typically a few MB).

    Scale shape: the corpus side is NEVER shuffled.  Round 7 default
    (``corpus_side="doc_distinct"``): each doc's gram array is deduped
    row-locally (``array_distinct``) before exploding — map-side partial
    dedup with zero exchange — so the broadcast-filtered hit stream into
    the final per-doc agg carries no within-doc repeats and the agg is a
    plain ``count``.  ``corpus_side="multiset"`` keeps the round-6 shape
    (raw stream, dedup rides a final countDistinct) for the recorded A/B
    (PLANS.md round 7; the multiset's un-deduped hit stream cost +73%
    cold on the repetitive synthetic corpus).  Only the benchmark side (a
    1/bench_mod subset; in production the actual eval suites, a few MB)
    pays a distinct before broadcasting into the equi-join.
    Output: (id_col, n_contaminated) — contaminated corpus docs only, with
    the number of distinct overlapping ``n``-grams.
    """
    doc_distinct = corpus_side == "doc_distinct"
    sh = shingles(df, n=n, id_col=id_col, text_col=text_col,
                  distinct_within_doc=doc_distinct)
    bench = (
        sh.where(F.col(id_col) % bench_mod == 0).select("shingle").distinct()
    )
    hits = (
        sh.where(F.col(id_col) % bench_mod != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
    )
    if doc_distinct:
        # (id, shingle) already unique -> count == countDistinct, minus
        # the Expand the distinct-agg would add
        return hits.agg(
            F.count(F.lit(1)).cast("long").alias("n_contaminated"))
    return hits.agg(
        F.countDistinct("shingle").cast("long").alias("n_contaminated"))


def contamination_overlap(df: DataFrame, n: int = 8, bench_mod: int = 10,
                          min_ratio: float = 0.2,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Fuzzy decontamination — the n-gram OVERLAP-RATIO refinement of
    :func:`contaminated_docs` (the GPT-3 appendix-C style scan): for every
    (corpus doc, benchmark doc) pair sharing at least one verbatim word
    ``n``-gram, the contamination score is

        overlap_ratio = |shared distinct n-grams| /
                        |benchmark doc's distinct n-grams|

    and pairs at or above ``min_ratio`` are flagged.  A single shared
    boilerplate gram no longer condemns a doc (the binary check's false-
    positive mode); a doc that reproduces most of an eval item is caught
    even when phrasing shifts around the overlap.

    Scale shape: the corpus side is never shuffled, and (round 7, same
    move as :func:`contaminated_docs`) each doc's gram array is deduped
    row-locally before exploding (``array_distinct`` — zero exchange), so
    (doc, gram) rows are unique by construction on BOTH sides: the bench
    slice needs no distinct before broadcasting and the per-pair overlap
    agg is a plain ``count``.  Exact integer counts with ONE final
    division rounded to 6 — deterministic across engines, no float
    aggregation.
    Output: (id_col, bench_id, n_shared, overlap_ratio).
    """
    sh = shingles(df, n=n, id_col=id_col, text_col=text_col,
                  distinct_within_doc=True)
    bench = sh.where(F.col(id_col) % bench_mod == 0).select(
        F.col(id_col).alias("bench_id"), "shingle"
    )
    bench_sizes = bench.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("_nb")
    )
    hits = (
        sh.where(F.col(id_col) % bench_mod != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        hits.join(F.broadcast(bench_sizes), "bench_id")
        .withColumn(
            "overlap_ratio",
            F.round(F.col("n_shared") / F.col("_nb").cast("double"), 6),
        )
        .where(F.col("overlap_ratio") >= min_ratio)
        .select(id_col, "bench_id", "n_shared", "overlap_ratio")
    )


def rare_bigram_rate(df: DataFrame, max_count: int = 2,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Corpus-LM novelty signal — the integer-exact stand-in for bigram
    perplexity: the fraction of a doc's word-bigram occurrences whose
    corpus-wide bigram count is at most ``max_count``.  High rate means
    the doc's word transitions are mostly unseen elsewhere (gibberish /
    OCR noise / heavy entity soup); near-zero means boilerplate.  The
    standard perplexity filter needs a float log-prob sum whose
    accumulation ORDER differs between engines (hash-unsafe); rare-mass
    counting keeps the same signal in exact integers with one final
    division.

    Scale shape: one shuffle of the bigram stream for corpus counts, one
    equi-join back on the bigram string (co-partitioned with the agg),
    one per-doc groupBy.  The count table is Zipf-shaped but NOT
    broadcast — it scales with corpus vocabulary, so the join stays a
    shuffle join co-located with the counting exchange.
    Contract: EVERY input doc gets a row — docs with fewer than 2 words
    come back with (0, 0, 0.0) via a left join, the same keep-empty
    convention as ``bpe_segment`` (round-7 contract unification; the
    inner-join form silently dropped them).
    Output: (id_col, n_bigrams, n_rare, rare_rate).
    """
    big = shingles(df, n=2, id_col=id_col, text_col=text_col)
    counts = big.groupBy("shingle").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = (
        big.join(counts, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("_c") <= max_count, 1).otherwise(0))
            .cast("long").alias("n_rare"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("n_rare", F.lit(0)).cast("long").alias("n_rare"),
        F.round(
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.col("n_rare") / F.col("n_bigrams").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rare_rate"),
    )


def vocab_coverage(df: DataFrame, min_df_pct: int = 60,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Vocabulary build + per-document out-of-vocabulary rate.

    The vocabulary is every word whose document frequency is at least
    ``min_df_pct`` percent of the corpus (integer arithmetic —
    ``df * 100 >= pct * n_docs`` — so both engines compare exactly); the
    OOV rate is the token-multiplicity fraction of a doc not covered by it.
    A doc-frequency threshold, not a top-K rank: top-K needs a global sort,
    a threshold is one groupBy + filter at any scale, and the resulting
    vocab (words common to most docs) is small by construction — safely
    broadcast back over the corpus.

    Output: (id_col, n_tokens, n_oov, oov_rate) per document.
    """
    tok = df.select(F.col(id_col), F.explode(words(text_col)).alias("wd"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_nd"))
    vocab = (
        tok.distinct()
        .groupBy("wd")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("_df") * 100 >= F.lit(min_df_pct) * F.col("_nd"))
        .select("wd", F.lit(1).alias("_in"))
    )
    n_tok = F.count(F.lit(1)).cast("long")
    n_oov = F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).cast("long")
    return (
        tok.join(F.broadcast(vocab), "wd", "left")
        .groupBy(id_col)
        .agg(n_tok.alias("n_tokens"), n_oov.alias("n_oov"))
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("n_oov").cast("double")
                    / F.col("n_tokens").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("oov_rate"),
        )
    )


# --- Passage-level dedup, chunking, PII scrub, corpus stats -------------------
# C4/RefinedWeb-style span operators: the unit of dedup/packing drops below
# the document (fixed word blocks stand in for "lines" — the synthetic corpus
# has no newlines, but the plan shape is identical: explode -> hash ->
# groupBy -> join-back).

def doc_blocks(df: DataFrame, w: int = 8, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Explode each doc into non-overlapping ``w``-word blocks.
    Output: (id_col, block_idx, block_hash, block_len) — md5 of the block
    text, so every downstream shuffle keys on a fixed-width hash, not a raw
    string; ``block_len`` is the actual word count (< ``w`` for the
    trailing partial block), so consumers can restrict matching to
    full-width spans — C4-style span dedup only considers those, otherwise
    a 1-word tail fragment shared by chance across docs counts as a
    "duplicate passage".
    """
    base = df.select(F.col(id_col), words(text_col).alias("_t"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_t") - 1, F.lit(0)), F.lit(w)
    )
    return base.select(
        F.col(id_col), F.posexplode(starts).alias("block_idx", "_s"), "_t"
    ).select(
        F.col(id_col),
        "block_idx",
        F.md5(
            F.concat_ws(" ", F.slice("_t", F.col("_s") + 1, w))
        ).alias("block_hash"),
        (F.least(F.size("_t"), F.col("_s") + w) - F.col("_s"))
        .alias("block_len"),
    )


def passage_dup_summary(df: DataFrame, w: int = 8, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-doc passage-duplication profile: how many of a doc's ``w``-word
    blocks also appear (verbatim) in at least one OTHER doc.  The C4-style
    span-dedup signal — docs with high ``n_dup_blocks / n_blocks`` are
    boilerplate or templated near-copies that document-level exact dedup
    misses.

    Scale shape: one groupBy over (block_hash) for cross-doc counts, one
    equi-join back on the same key (co-partitioned after the first
    shuffle), one per-doc agg.  No all-pairs anything.  Only full-``w``
    blocks participate in dup matching (``block_len == w``) — the trailing
    partial block is counted in ``n_blocks`` but can never be a dup, so a
    short tail fragment shared by chance across docs doesn't inflate the
    signal.
    Output: (id_col, n_blocks, n_dup_blocks).
    """
    blocks = doc_blocks(df, w=w, id_col=id_col, text_col=text_col)
    stats = blocks.where(F.col("block_len") == w).groupBy("block_hash").agg(
        F.countDistinct(id_col).alias("_nd")
    )
    return (
        blocks.join(stats, "block_hash", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(
                F.when((F.col("block_len") == w) & (F.col("_nd") > 1), 1)
                .otherwise(0)
            ).cast("long").alias("n_dup_blocks"),
        )
    )


def passage_rewrite(df: DataFrame, w: int = 8, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """C4-style span REMOVAL — the transformation twin of
    :func:`passage_dup_summary`: every full-``w``-word block whose text is
    shared verbatim with at least one OTHER doc is removed, except the
    globally-first occurrence (minimum ``(doc_id, block_idx)``), and the
    doc is reassembled from the surviving blocks in order.  Partial tail
    blocks never participate in matching and are always kept.

    Contract details: "cross-doc duplicated" means the block hash appears
    in > 1 distinct doc; for such a hash exactly ONE occurrence survives
    corpus-wide (the minimum ``(doc_id, block_idx)``) — later repeats
    inside the first doc are removed too.  Within-doc-only repeats are
    untouched.

    Scale shape: identical to the summary — explode -> md5 -> groupBy on
    the fixed-width block hash -> join-back — plus one per-doc ordered
    reassembly agg (``collect_list`` of (idx, text) structs, sorted
    per-group; bounded by doc length, never a corpus-wide sort).  The
    first-occurrence rule rides the same groupBy as the dup count: min
    over the integer key ``doc_id * 1e6 + block_idx`` (block_idx < 1e6 is
    asserted by doc length at any sane ``w``), so no second shuffle.
    Output: (id_col, n_blocks, n_removed, clean_text).
    """
    base = df.select(F.col(id_col), words(text_col).alias("_t"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_t") - 1, F.lit(0)), F.lit(w)
    )
    blocks = (
        base.select(
            F.col(id_col), F.posexplode(starts).alias("block_idx", "_s"), "_t"
        )
        .select(
            F.col(id_col),
            "block_idx",
            F.concat_ws(" ", F.slice("_t", F.col("_s") + 1, w)).alias("_bt"),
            (F.least(F.size("_t"), F.col("_s") + w) - F.col("_s"))
            .alias("_len"),
        )
        .withColumn("_bh", F.md5("_bt"))
        .withColumn(
            "_key",
            F.col(id_col).cast("long") * F.lit(1_000_000) + F.col("block_idx"),
        )
    )
    stats = (
        blocks.where(F.col("_len") == w)
        .groupBy("_bh")
        .agg(
            F.countDistinct(id_col).alias("_nd"),
            F.min("_key").alias("_first"),
        )
    )
    # left join: partial-block hashes may be absent from stats; for those
    # (_len == w) is false so the AND short-circuits to false, never null
    flagged = blocks.join(stats, "_bh", "left").withColumn(
        "_rm",
        (F.col("_len") == w)
        & (F.col("_nd") > 1)
        & (F.col("_key") != F.col("_first")),
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("_rm").cast("int")).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(~F.col("_rm"),
                               F.struct("block_idx", "_bt"))
                    )
                ),
                lambda s: s["_bt"],
            ),
            " ",
        ).alias("clean_text"),
    )


def chunk_documents(df: DataFrame, window: int = 64, stride: int = 48,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split every doc into fixed ``window``-token chunks every ``stride``
    tokens (overlap = window - stride) — the standard long-document
    chunking step before tokenization/embedding.  Pure codegen exprs
    (split / sequence / posexplode / slice); output rows ~ corpus_tokens /
    stride, partitioned like the input — no shuffle at all.
    Output: (id_col, chunk_idx, n_tokens, chunk_hash).
    """
    base = df.select(F.col(id_col), words(text_col).alias("_t"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_t") - 1, F.lit(0)), F.lit(stride)
    )
    chunk = F.slice("_t", F.col("_s") + 1, window)
    return base.select(
        F.col(id_col), F.posexplode(starts).alias("chunk_idx", "_s"), "_t"
    ).select(
        F.col(id_col),
        "chunk_idx",
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


def _substr_gram(L: int) -> Column:
    """Fixed-width shuffle key for the L-gram at char position ``p`` of
    ``_t``: the raw gram for L <= 64 (free to compute, collision-free —
    exact semantics), md5 above so the shuffled key stays fixed-width."""
    g = F.col("_t").substr(F.col("p") + 1, F.lit(L))
    return g if L <= 64 else F.md5(g)


def _substr_positions(base: DataFrame, L: int, id_col: str) -> DataFrame:
    """(id_col, p, g): every L-gram start of every doc — the full
    position stream (~40 bytes x corpus chars)."""
    return (
        base.where(F.col("doc_len") >= L)
        .select(
            F.col(id_col),
            F.posexplode(
                F.sequence(F.lit(0), F.col("doc_len") - L)
            ).alias("_i", "p"),
            "_t",
        )
        .select(F.col(id_col), "p", _substr_gram(L).alias("g"))
    )


def _anchor_candidates(base: DataFrame, L: int, id_col: str,
                       L0: int = 24) -> DataFrame:
    """Winnowing-anchored candidate intervals — the exact stride
    mitigation for the position stream.  Content-defined selection is the
    only sampling that preserves exactness (a position grid picks
    DIFFERENT substrings of a shared span in its two occurrences, so the
    equality join can never see the pair).

    Per doc, entirely local (no shuffle; an Arrow-batched numpy
    winnower): hash every ``L0``-char gram (vectorized polynomial hash
    over the codepoint stream), then winnow with window
    ``w = L - L0 + 1`` — for each of the ``doc_len - L + 1`` windows of
    ``w`` consecutive gram starts, select the leftmost-minimum position.
    Guarantee (the winnowing argument, Schleimer et al. 2003, "Winnowing:
    Local Algorithms for Document Fingerprinting"): a cross-doc
    duplicated L-gram occurrence at position ``p`` spans exactly one
    full window of ``w`` L0-gram starts, whose content is identical in
    both docs, so BOTH docs select the same content-relative anchor —
    the anchor's L0-gram therefore appears in >= 2 distinct docs, within
    ``w-1`` chars of ``p``.  Hash collisions cannot break this: both
    occurrences hash identically, so selection stays content-relative.
    Only anchors are shuffled (keyed on the raw fixed-width L0-char
    gram, one window exchange for the cross-doc test), ~2/(w+1) of the
    position stream; shared-anchor neighborhoods merge into per-doc
    candidate intervals with slop ``R = L + w`` (> the w-1 coverage
    bound).

    Returns (id_col, _iv: array<struct<lo,hi>>) for docs that have at
    least one shared anchor — docs with no cross-doc duplication produce
    NO candidate rows and are never rescanned.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    if not (1 < L0 <= L):
        raise ValueError(f"anchor gram length {L0} must be in (1, {L}]")
    # the mapInPandas seam carries the doc id as int64; a non-integral id
    # would silently null out under the cast (dropping docs from the
    # candidate set), so reject it up front — methods "full"/"window"
    # accept any orderable id type
    id_type = base.schema[id_col].dataType
    if not isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType,
                                T.LongType)):
        raise ValueError(
            f"method='anchor' requires an integral {id_col!r} column "
            f"(got {id_type.simpleString()}); use method='window' for "
            "non-numeric doc ids"
        )
    w = L - L0 + 1
    R = L + w
    out_schema = T.StructType([
        T.StructField("_aid", T.LongType(), False),
        T.StructField("a", T.IntegerType(), False),
        T.StructField("ag", T.StringType(), False),
    ])

    def winnow(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-doc local compute, vectorized (sliding-window argmin over a
        # polynomial L0-gram hash of the codepoint stream); Spark-side
        # higher-order functions evaluate interpreted and O(doc_len * w)
        # per-window slices made the pure-expression form pathologically
        # slow — this is the "Python is the point" Arrow seam, same
        # policy as the codec mapInPandas paths.  Hash collisions cannot
        # break exactness: both occurrences of identical content hash
        # identically, so anchor selection stays content-relative.
        powers = (np.uint64(1_000_003) **
                  np.arange(L0, dtype=np.uint64))
        for pdf in batches:
            ids: list[np.ndarray] = []
            anchors: list[np.ndarray] = []
            grams_out: list[str] = []
            for doc_id, t in zip(pdf["_aid"], pdf["_t"]):
                c = np.frombuffer(t.encode("utf-32-le"), dtype="<u4")
                c = c.astype(np.uint64)
                grams = np.lib.stride_tricks.sliding_window_view(c, L0)
                with np.errstate(over="ignore"):
                    h = (grams * powers).sum(axis=1)      # uint64 wraparound
                sel = np.lib.stride_tricks.sliding_window_view(h, w)
                pos = np.unique(np.arange(sel.shape[0]) + sel.argmin(axis=1))
                ids.append(np.full(pos.size, doc_id, dtype=np.int64))
                anchors.append(pos.astype(np.int32))
                grams_out.extend(t[p:p + L0] for p in pos)
            yield pd.DataFrame({
                "_aid": np.concatenate(ids) if ids else
                np.empty(0, np.int64),
                "a": np.concatenate(anchors) if anchors else
                np.empty(0, np.int32),
                "ag": grams_out,
            })

    anchor_rows = (
        base.where(F.col("doc_len") >= L)
        .select(F.col(id_col).cast("long").alias("_aid"), "_t")
        .mapInPandas(winnow, out_schema)
        .select(F.col("_aid").alias(id_col), "a", "ag")
    )
    wg = W.partitionBy("ag")
    shared = (
        anchor_rows.withColumn("_lo", F.min(id_col).over(wg))
        .withColumn("_hi", F.max(id_col).over(wg))
        .where(F.col("_lo") != F.col("_hi"))
        .select(F.col(id_col), "a")
    )
    empty_iv = F.array().cast("array<struct<lo:int,hi:int>>")
    merge_iv = F.aggregate(
        F.sort_array(F.collect_list("a")),
        empty_iv,
        lambda acc, a: F.when(
            (F.size(acc) > 0)
            & (a - R <= F.element_at(acc, -1)["hi"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["lo"].alias("lo"),
                        (a + R).alias("hi"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc, F.array(F.struct((a - R).alias("lo"), (a + R).alias("hi")))
            )
        ),
    )
    return shared.groupBy(id_col).agg(merge_iv.alias("_iv"))


def _spans_tail(base: DataFrame, hits: DataFrame, L: int,
                id_col: str) -> DataFrame:
    """Shared profile tail: per-doc gaps-and-islands over duplicated gram
    starts -> maximal spans -> per-doc counts, left-joined onto every doc."""
    from pyspark.sql import Window as W

    w_ord = W.partitionBy(id_col).orderBy("p")
    prev_end = F.max(F.col("p") + L).over(
        w_ord.rowsBetween(W.unboundedPreceding, -1)
    )
    islands = (
        hits.withColumn(
            "_new",
            F.when(prev_end.isNull() | (F.col("p") > prev_end), 1).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(w_ord))
    )
    spans = islands.groupBy(id_col, "_isl").agg(
        F.min("p").alias("_s0"), (F.max("p") + L).alias("_s1")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum(F.col("_s1") - F.col("_s0")).cast("long").alias("dup_chars"),
    )
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.col("doc_len").cast("long").alias("doc_len"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
    )


def exact_substring_spans(df: DataFrame, min_len: int = 30,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          method: str = "window",
                          anchor_gram: int | None = None) -> DataFrame:
    """ExactSubstr-style profile (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): maximal CHARACTER spans of length
    >= ``min_len`` that occur verbatim in >= 2 distinct documents, on the
    normalized text.  Character-level and boundary-free, this catches
    duplication the fixed word-block passage family misses (spans that
    straddle block boundaries, shifted copies).  Within-doc-only repeats
    do NOT count (cross-doc semantics: a gram is duplicated iff
    min(doc_id) != max(doc_id) over its occurrences).

    ``method="full"`` — the round-5 reference plan: posexplode every
    char position into its L-gram, ONE shuffle keyed on the fixed-width
    gram for the cross-doc check (map-side partial agg), equi-join back
    (co-partitioned with the agg), then the gaps-and-islands tail.  The
    position table is ~40 bytes x corpus chars, computed twice (agg +
    join sides) — the honest cost of the direct approach.

    ``method="window"`` (default) — same full position stream, but the
    cross-doc test rides a SINGLE ``Window.partitionBy(gram)`` exchange
    (min/max doc over the partition, filter in place): no join-back, no
    second scan of the position stream.  Measured 2.8x faster cold than
    "full" at sf0.1 (8.4 s -> 3.0 s), identical output, and strictly
    less shuffle at any scale — the new baseline.

    ``method="anchor"`` — the stride+verify mitigation for dup-sparse
    corpora, exactness PRESERVED: content-defined winnowing anchors
    (see :func:`_anchor_candidates` for the guarantee) confine the
    window-detection pass to candidate neighborhoods of cross-doc
    shared anchors.  ``anchor_gram`` (default ``min_len - 2``) sets the
    anchor key length L0: winnowing density is 2/(L - L0 + 2), so
    smaller L0 shrinks the anchor exchange — but anchors shorter than
    the corpus's chance-repeat length mark everything as candidate (the
    31-word synthetic template corpus chance-repeats up to ~24 chars,
    so anchoring cannot beat "window" THERE and it stays non-default;
    real large-vocab corpora select L0 16 or less, shuffle a few
    percent of the stream, and skip clean docs entirely — the 100 TB
    win case, characterized in experiments/substr_scale.py).  Output is
    identical to "window"/"full" by construction (every true hit
    position lies within w-1 chars of a shared anchor; verification
    re-tests candidates with the exact L-gram key, so slop can only add
    work, never spans) — asserted by A/B pytest and the unchanged
    DuckDB gate oracle.

    Output: (id_col, doc_len, n_dup_spans, dup_chars).
    """
    L = min_len
    base = df.select(
        F.col(id_col), normalized(text_col).alias("_t")
    ).select(F.col(id_col), "_t", F.length("_t").alias("doc_len"))
    if method == "full":
        pos = _substr_positions(base, L, id_col)
        # ">= 2 distinct docs" as min != max: a single-level agg (one
        # shuffle with map-side partials) where countDistinct would add a
        # second full exchange of the position stream on (g, doc_id)
        dup = (
            pos.groupBy("g")
            .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
            .where(F.col("_lo") != F.col("_hi"))
            .select("g")
        )
        hits = pos.join(dup, "g").select(F.col(id_col), "p")
    elif method in ("window", "anchor"):
        from pyspark.sql import Window as W

        pos2 = (
            _substr_positions(base, L, id_col)
            if method == "window"
            else _anchored_positions(base, L, id_col, anchor_gram)
        )
        wg = W.partitionBy("g")
        hits = (
            pos2.withColumn("_lo", F.min(id_col).over(wg))
            .withColumn("_hi", F.max(id_col).over(wg))
            .where(F.col("_lo") != F.col("_hi"))
            .select(F.col(id_col), "p")
        )
    else:
        raise ValueError(f"unknown method {method!r} (full | window | anchor)")
    return _spans_tail(base, hits, L, id_col)


def _anchored_positions(base: DataFrame, L: int, id_col: str,
                        anchor_gram: int | None) -> DataFrame:
    """Candidate-restricted position stream: the full stream confined to
    merged neighborhoods of cross-doc shared winnowing anchors (see
    :func:`_anchor_candidates`).  Covers every occurrence of every
    cross-doc duplicated L-gram, so both the dup test (min != max doc)
    and first-occurrence ranks (row_number over (doc_id, p)) computed on
    it agree exactly with the full stream for duplicated grams."""
    L0 = max(2, L - 2) if anchor_gram is None else anchor_gram
    cand = _anchor_candidates(base, L, id_col, L0=L0)
    return (
        base.join(cand, id_col)
        .select(F.col(id_col), "_t", "doc_len", F.explode("_iv").alias("v"))
        .select(
            F.col(id_col),
            "_t",
            F.explode(
                F.sequence(
                    F.greatest(F.col("v.lo"), F.lit(0)),
                    F.least(F.col("v.hi"), F.col("doc_len") - L),
                )
            ).alias("p"),
        )
        .select(F.col(id_col), "p", _substr_gram(L).alias("g"))
    )


def exact_substring_rewrite(df: DataFrame, min_len: int = 30,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            method: str = "window",
                            anchor_gram: int | None = None) -> DataFrame:
    """Char-span REMOVAL — the transformation twin of
    :func:`exact_substring_spans`, completing the dedup family's third
    granularity the way :func:`passage_rewrite` completes the second:
    every maximal character span (length >= ``min_len``) duplicated
    across >= 2 distinct documents is removed from the normalized text,
    keeping the corpus-wide FIRST occurrence.

    Contract: per duplicated ``min_len``-gram the first occurrence is the
    minimum ``(doc_id, position)``; every other occurrence of that gram is
    removable.  Removable gram starts merge into maximal islands per doc
    (same gaps-and-islands rule as the profile operator) and the covered
    character ranges are cut, so a payload shared by N docs survives
    verbatim only in the smallest ``doc_id`` (later repeats inside that
    doc are cut too — the :func:`passage_rewrite` rule at char level).
    Removal is single-pass: stitching cut edges together may create new
    junction substrings; they are NOT re-scanned (standard ExactSubstr
    deployment behavior).

    Plan shape: ONE exchange of the position stream, keyed on the
    fixed-width gram — the cross-doc test (min != max doc), the
    first-occurrence rank (row_number over (doc_id, pos)), and the hit
    filter all ride a single ``Window.partitionBy(gram)`` sort, with no
    join-back and no second scan of the position table (cheaper than the
    profile twin's agg+join, which predates this plan).  With
    ``method="anchor"`` the exchanged stream is additionally confined to
    winnowing-anchor candidate neighborhoods (see
    :func:`_anchored_positions` — ranks and dup tests provably agree
    with the full stream; worth it on dup-sparse large-vocab corpora,
    not on the chance-repeat-heavy synthetic template corpus, same
    tradeoff as the profile twin).  Then per-doc windows merge islands
    and a
    ``sort_array(collect_list)`` + ``aggregate`` fold stitches the kept
    segments — bounded by doc span count, never a corpus-wide sort.

    Output: (id_col, doc_len, n_removed_spans, removed_chars, clean_text)
    where clean_text is over the NORMALIZED text (the coordinate system
    the spans live in — same convention as passage_rewrite's block
    reassembly).
    """
    from pyspark.sql import Window as W

    L = min_len
    base = df.select(
        F.col(id_col), normalized(text_col).alias("_t")
    ).select(F.col(id_col), "_t", F.length("_t").alias("doc_len"))
    if method in ("full", "window"):
        # "full" and "window" coincide here: rewrite always detected via
        # the single window exchange (this plan never had an agg+join form)
        pos = _substr_positions(base, L, id_col)
    elif method == "anchor":
        pos = _anchored_positions(base, L, id_col, anchor_gram)
    else:
        raise ValueError(f"unknown method {method!r} (full | window | anchor)")
    wg = W.partitionBy("g")
    wgo = wg.orderBy(id_col, "p")
    hits = (
        pos.withColumn("_lo", F.min(id_col).over(wg))
        .withColumn("_hi", F.max(id_col).over(wg))
        .withColumn("_rn", F.row_number().over(wgo))
        .where((F.col("_lo") != F.col("_hi")) & (F.col("_rn") > 1))
        .select(F.col(id_col), "p")
    )
    w_ord = W.partitionBy(id_col).orderBy("p")
    prev_end = F.max(F.col("p") + L).over(
        w_ord.rowsBetween(W.unboundedPreceding, -1)
    )
    islands = (
        hits.withColumn(
            "_new",
            F.when(prev_end.isNull() | (F.col("p") > prev_end), 1).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(w_ord))
    )
    spans = islands.groupBy(id_col, "_isl").agg(
        F.min("p").alias("_s0"), (F.max("p") + L).alias("_s1")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("_s0", "_s1"))).alias("_sp"),
        F.count(F.lit(1)).cast("long").alias("n_removed_spans"),
        F.sum(F.col("_s1") - F.col("_s0")).cast("long").alias("removed_chars"),
    )
    joined = base.join(per_doc, id_col, "left")
    stitched = F.aggregate(
        "_sp",
        F.struct(F.lit(0).alias("e"), F.lit("").alias("a")),
        lambda acc, s: F.struct(
            s["_s1"].alias("e"),
            F.concat(
                acc["a"],
                F.col("_t").substr(acc["e"] + 1, s["_s0"] - acc["e"]),
            ).alias("a"),
        ),
        lambda acc: F.concat(
            acc["a"],
            F.col("_t").substr(acc["e"] + 1, F.col("doc_len") - acc["e"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.col("doc_len").cast("long").alias("doc_len"),
        F.coalesce("n_removed_spans", F.lit(0)).cast("long")
        .alias("n_removed_spans"),
        F.coalesce("removed_chars", F.lit(0)).cast("long")
        .alias("removed_chars"),
        F.when(F.col("_sp").isNull(), F.col("_t"))
        .otherwise(stitched).alias("clean_text"),
    )


def exact_substring_profile_and_rewrite(
        df: DataFrame, min_len: int = 30, id_col: str = "doc_id",
        text_col: str = "text", method: str = "window",
        anchor_gram: int | None = None) -> DataFrame:
    """FUSED ExactSubstr profile + rewrite — both outputs off ONE gram
    exchange.  :func:`exact_substring_spans` and
    :func:`exact_substring_rewrite` each materialize the same ~40 B/char
    position stream when both run; this operator shares it: a single
    ``Window.partitionBy(gram)`` pass computes the cross-doc test
    (min != max doc) AND the first-occurrence rank (row_number over
    (doc_id, pos)), the surviving hit set — tiny next to the position
    stream, only duplicated-gram positions — is cached, and the two
    per-doc tails (all-hits islands for the PROFILE, rank>1-hits islands
    for the REWRITE) both read it from memory.  Output column semantics
    are identical to the two standalone operators by construction (same
    window, same filters, same island rule) — pinned by pytest equality
    and the combined DuckDB oracle; the A/B lives in
    experiments/substr_scale.py (combined cost well under the sum).

    Output: (id_col, doc_len, n_dup_spans, dup_chars, n_removed_spans,
    removed_chars, clean_text).
    """
    from pyspark.sql import Window as W

    L = min_len
    base = df.select(
        F.col(id_col), normalized(text_col).alias("_t")
    ).select(F.col(id_col), "_t", F.length("_t").alias("doc_len"))
    if method in ("full", "window"):
        pos = _substr_positions(base, L, id_col)
    elif method == "anchor":
        pos = _anchored_positions(base, L, id_col, anchor_gram)
    else:
        raise ValueError(f"unknown method {method!r} (full | window | anchor)")
    wg = W.partitionBy("g")
    wgo = wg.orderBy(id_col, "p")
    from ..cachepin import pin

    hits = pin(
        pos.withColumn("_lo", F.min(id_col).over(wg))
        .withColumn("_hi", F.max(id_col).over(wg))
        .withColumn("_rn", F.row_number().over(wgo))
        .where(F.col("_lo") != F.col("_hi"))
        .select(F.col(id_col), "p", "_rn")
    )

    def _spans(h: DataFrame) -> DataFrame:
        w_ord = W.partitionBy(id_col).orderBy("p")
        prev_end = F.max(F.col("p") + L).over(
            w_ord.rowsBetween(W.unboundedPreceding, -1)
        )
        islands = (
            h.withColumn(
                "_new",
                F.when(prev_end.isNull() | (F.col("p") > prev_end), 1)
                .otherwise(0),
            )
            .withColumn("_isl", F.sum("_new").over(w_ord))
        )
        return islands.groupBy(id_col, "_isl").agg(
            F.min("p").alias("_s0"), (F.max("p") + L).alias("_s1")
        )

    prof = _spans(hits.select(id_col, "p")).groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum(F.col("_s1") - F.col("_s0")).cast("long").alias("dup_chars"),
    )
    rm = _spans(hits.where(F.col("_rn") > 1).select(id_col, "p")).groupBy(
        id_col
    ).agg(
        F.sort_array(F.collect_list(F.struct("_s0", "_s1"))).alias("_sp"),
        F.count(F.lit(1)).cast("long").alias("n_removed_spans"),
        F.sum(F.col("_s1") - F.col("_s0")).cast("long")
        .alias("removed_chars"),
    )
    joined = base.join(prof, id_col, "left").join(rm, id_col, "left")
    stitched = F.aggregate(
        "_sp",
        F.struct(F.lit(0).alias("e"), F.lit("").alias("a")),
        lambda acc, s: F.struct(
            s["_s1"].alias("e"),
            F.concat(
                acc["a"],
                F.col("_t").substr(acc["e"] + 1, s["_s0"] - acc["e"]),
            ).alias("a"),
        ),
        lambda acc: F.concat(
            acc["a"],
            F.col("_t").substr(acc["e"] + 1, F.col("doc_len") - acc["e"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.col("doc_len").cast("long").alias("doc_len"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long")
        .alias("n_dup_spans"),
        F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
        F.coalesce("n_removed_spans", F.lit(0)).cast("long")
        .alias("n_removed_spans"),
        F.coalesce("removed_chars", F.lit(0)).cast("long")
        .alias("removed_chars"),
        F.when(F.col("_sp").isNull(), F.col("_t"))
        .otherwise(stitched).alias("clean_text"),
    )


# (name, regex, replacement) applied IN ORDER — order matters where patterns
# could overlap (an email contains dots + digits an IP regex could bite).
# Regexes stay in the Java/RE2 common subset so the DuckDB oracle runs the
# identical patterns.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # \b on both ends so the pattern can't bite a substring out of longer
    # digit/dash runs (ids, serials like 0123-456-78901); a leading "+" is
    # left unredacted (\b can't sit between two non-word chars) — acceptable
    ("phone", r"\b\+?\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text",
              patterns: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """Redact PII-shaped spans (email / SSN / phone / IPv4 by default) and
    count redactions per doc.  Sequential ``regexp_count`` +
    ``regexp_replace`` per pattern — all JVM codegen, no shuffle, trivially
    row-parallel at any scale.
    Output: (id_col, n_redactions, clean_text).
    """
    pats = PII_PATTERNS if patterns is None else patterns
    cur = F.col(text_col)
    counts = []
    for _, pat, repl in pats:
        counts.append(F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return df.select(
        F.col(id_col),
        total.cast("long").alias("n_redactions"),
        cur.alias("clean_text"),
    )


def source_stats(df: DataFrame) -> DataFrame:
    """Per-source corpus health dashboard: doc/token counts, language
    spread, and the exact-duplicate rate within each source (docs whose
    normalized fingerprint appears more than once in that source).  Two
    aggregations joined on the tiny ``source`` key — the corpus shuffles
    once on (source, fingerprint) and once on source.
    Output: (source, n_docs, n_tokens, n_langs, n_dup_docs).
    """
    per_doc = df.select(
        "source",
        "lang",
        token_count("text").cast("long").alias("n_tokens"),
        F.md5(normalized("text")).alias("_fp"),
    )
    overall = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    fp_groups = per_doc.groupBy("source", "_fp").agg(
        F.count(F.lit(1)).alias("_c")
    )
    dups = fp_groups.groupBy("source").agg(
        F.coalesce(
            F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0)
        ).cast("long").alias("n_dup_docs")
    )
    return overall.join(dups, "source")


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Term -> postings inverted index over the normalized word stream —
    the IR-side artifact a corpus pipeline derives for retrieval /
    contamination lookups: per term its document frequency, total term
    frequency, and an order-canonical fingerprint of the postings list
    ("zero-padded-doc_id:tf" entries, lexicographically sorted so both
    engines hash the identical string; the padding makes lexicographic
    order == numeric doc order).

    Scale shape: two keyed exchanges — (term, doc) partial counts
    combine map-side, then the per-term aggregation; postings lists are
    per-term (bounded by document frequency), never corpus-wide.
    Output: (term, df, total_tf, postings_hash)."""
    tok = df.select(F.col(id_col).alias("doc_id"),
                    F.explode(words(text_col)).alias("term"))
    tf = (tok.where(F.length("term") > 0)
          .groupBy("term", "doc_id")
          .agg(F.count(F.lit(1)).alias("tf")))
    entry = F.concat(F.lpad(F.col("doc_id").cast("string"), 12, "0"),
                     F.lit(":"), F.col("tf").cast("string"))
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.md5(F.array_join(F.array_sort(F.collect_list(entry)), ","))
        .alias("postings_hash"),
    )


def positional_tokens(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """One corpus tokenization shared by the IR operators: (doc_id,
    pos, term) with empty tokens dropped — posexplode of the same
    :func:`words` normalization every text operator uses.  Build it
    once and pass it as ``tok_df`` to :func:`bm25_scores` and
    :func:`phrase_search` (pin it when both consume it — the
    ``shingle_df`` sharing idiom of the dedup family) so a composed
    retrieval plan scans and explodes the corpus once instead of once
    per operator."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words(text_col)).alias("pos", "term"),
    ).where(F.length("term") > 0)


def bm25_scores(df: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75,
                tok_df: DataFrame | None = None) -> DataFrame:
    """BM25 retrieval scoring of every document against a fixed query —
    the ranking the inverted-index artifact exists to serve (Lucene
    idf variant, always positive: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Scale shape: the term filter lands BEFORE the first exchange, so
    only query-term postings shuffle — per-(doc, term) counts combine
    map-side, the df/N/avgdl side is a handful of broadcast-able rows,
    and the final per-doc sum rides the doc-length exchange.  Nothing
    corpus-wide survives past the first stage except one row per
    (matching doc, query term).

    Float posture: idf/score use ln and double division, rounded to 6
    decimals — the latency_percentiles precedent (both engines compute
    the same IEEE expression on the same inputs).
    Output: (id_col, n_hits, score) for docs matching >= 1 term."""
    qlit = [t.lower() for t in query_terms]
    if tok_df is not None:
        tok = tok_df.select("doc_id", "term")
    else:
        tok = df.select(F.col(id_col).alias("doc_id"),
                        F.explode(words(text_col)).alias("term"))
    # applied to BOTH sources: a caller-supplied tok_df without the
    # empty-token filter would silently inflate dl/avgdl (idempotent on
    # positional_tokens, which pre-filters)
    tok = tok.where(F.length("term") > 0)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("total_len"))
    tf = (tok.where(F.col("term").isin(qlit))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn("avgdl", F.col("total_len").cast("double")
                    / F.col("n_docs").cast("double"))
        .withColumn("idf", F.log(
            F.lit(1.0) + (F.col("n_docs").cast("double")
                          - F.col("dft") + F.lit(0.5))
            / (F.col("dft").cast("double") + F.lit(0.5))))
        .withColumn("s", F.col("idf") * (F.col("tf") * (k1 + 1.0)) / (
            F.col("tf") + k1 * (1.0 - b + b * F.col("dl").cast("double")
                                / F.col("avgdl"))))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.round(F.sum("s"), 6).alias("score"),
    ).select(F.col("doc_id").alias(id_col), "n_hits", "score")


def phrase_search(df: DataFrame, phrase: list[str],
                  id_col: str = "doc_id",
                  text_col: str = "text",
                  tok_df: DataFrame | None = None) -> DataFrame:
    """Exact-phrase query over positional postings — the lookup the
    positional half of an inverted index exists for (and the operator a
    contamination scan needs when the benchmark string must match
    *contiguously*, not just as a bag of grams).

    Anchor algebra instead of L-way self-join: token at position ``p``
    matching ``phrase[off]`` votes for anchor ``p - off``; an anchor
    with all ``len(phrase)`` distinct offsets matched is an occurrence.
    One vote row per (matching token, offset) — repeated phrase terms
    ("batch batch stream") fall out naturally because one token votes
    for every offset where it appears in the phrase, and overlapping
    occurrences count separately (positional-index semantics).

    Phrase terms are normalized the way :func:`words` normalizes the
    document side (strip + lowercase); a term that is empty after
    stripping or still contains internal whitespace can never match a
    single token, so it raises ``ValueError`` instead of silently
    returning an empty result — as does an empty phrase.

    Scale shape: the phrase-term filter is a BROADCAST inner join (the
    phrase is a handful of rows), so only matching-term postings ever
    shuffle; the (doc, anchor) vote count combines map-side, and the
    per-doc rollup rides a doc-keyed exchange of occurrence rows (one
    row per hit, never per token).  No L-way join, no arrays collected.
    Output: (id_col, n_occurrences, first_pos) for matching docs.
    """
    if not phrase:
        raise ValueError("phrase_search requires a non-empty phrase")
    terms = [t.strip().lower() for t in phrase]
    bad = [t for t in terms if not t or any(c.isspace() for c in t)]
    if bad:
        raise ValueError(
            "phrase terms must be single non-empty tokens "
            f"(no internal whitespace); got {bad!r}")
    L = len(terms)
    spark = df.sparkSession
    pdf = spark.createDataFrame(
        list(enumerate(terms)), "off INT, pterm STRING")
    tok = (tok_df if tok_df is not None
           else positional_tokens(df, id_col=id_col, text_col=text_col))
    votes = (
        tok.join(F.broadcast(pdf), F.col("term") == F.col("pterm"))
        .select("doc_id", (F.col("pos") - F.col("off")).alias("anchor"),
                "off")
        .where(F.col("anchor") >= 0)
    )
    occ = (
        votes.groupBy("doc_id", "anchor")
        .agg(F.count_distinct("off").alias("k"))
        .where(F.col("k") == L)
    )
    return occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.min("anchor").cast("long").alias("first_pos"),
    ).select(F.col("doc_id").alias(id_col), "n_occurrences", "first_pos")


def nfc_normalize_text(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Unicode NFC text normalization — the canonicalization a
    multilingual crawl needs BEFORE any fingerprint/dedup stage:
    'é' typed as e + COMBINING ACUTE and as the precomposed code point
    are the same text but different md5s, so un-normalized corpora
    under-deduplicate.  Steps, in order: (1) Unicode NFC (canonical
    composition — stdlib unicodedata, Arrow-batched; no JVM-side NFC
    exists in Spark SQL), (2) ASCII control chars folded to spaces,
    (3) trim + collapse ASCII whitespace runs.  Steps 2-3 use EXPLICIT
    ASCII classes (not \\s, whose unicode scope differs between
    Python's re and the oracle's RE2).

    Output: (id_col, norm_text, n_chars long — code points after,
    changed int — 1 when normalization altered the text)."""
    import re
    import unicodedata
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    ctrl = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")
    wsrun = re.compile(r"[ \t\n\r\f\v]+")

    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("norm_text", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("changed", T.IntegerType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def norm(s: str | None) -> tuple[str | None, int | None, int]:
                if s is None:
                    # null text keeps a null row with changed 0 — the
                    # oracle's nfc_normalize(NULL) semantics; crawled
                    # corpora carry null cells and an untyped TypeError
                    # here would kill the whole Arrow task
                    return None, None, 0
                out = unicodedata.normalize("NFC", s)
                out = wsrun.sub(" ", ctrl.sub(" ", out)).strip(" ")
                return out, len(out), int(out != s)

            o = pdf[text_col].map(norm)
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "norm_text": o.map(lambda t: t[0]),
                # nullable Int64: null-text rows carry a null n_chars
                "n_chars": o.map(lambda t: t[1]).astype("Int64"),
                "changed": o.map(lambda t: t[2]).astype("int32"),
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)
