"""Corpus sampling and shard packing — the last mile of a training-data
pipeline: draw a language-stratified mix and pack documents into fixed
token-budget shards.

Scale notes: `stratified_sample` is a per-row deterministic md5-threshold
draw (a codegen CASE + hash expression — no shuffle at all, and
oracle-replayable).  `pack_token_shards` assigns each doc
`shard_id = floor(cumulative_tokens / budget)` over a deterministic doc
order via ``operators/sequences.ranged_prefix_sum`` — a range repartition
plus partition-local cumulative sums with broadcast offsets, so no
single-task global sort anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.sequences import (ranged_prefix_sum,
                                   ranged_row_number)
from .text import token_count


def stratified_sample(docs: DataFrame, lang: DataFrame,
                      fractions: dict[str, float],
                      seed: int = 42) -> DataFrame:
    """Language-stratified corpus draw: keep each doc with its language's
    target fraction (the standard data-mixing knob for pretraining runs).
    ``lang``: (doc_id, lang_pred).

    The draw is a DETERMINISTIC hash threshold, not an RNG (round 15,
    VERDICT r14 task 5 — the :func:`temperature_sample` posture):
    ``u(doc) = first 6 hex digits of md5(doc_id || ':' || seed) / 16^6``,
    keep iff ``u < round(fraction, 6)`` for the doc's stratum — the same
    doc is kept on every engine and every run, so the operator is fully
    oracle-checkable (formerly ``sampleBy``, whose seeded Bernoulli is
    engine-specific and was declared rows-only).  Strata absent from
    ``fractions`` drop, matching ``sampleBy``'s contract.  Scale shape:
    the fractions map folds into one codegen CASE over the already-paid
    lang join — no extra shuffle, no join, no RNG state."""
    # sampleBy validated fraction ranges; the hash-threshold form must
    # too — u < 1.5 would silently keep 100% of a stratum (a mixing
    # config passing 50 for 50% must fail loudly, review find r15)
    bad = {k: v for k, v in fractions.items()
           if not 0.0 <= float(v) <= 1.0}
    if bad:
        raise ValueError(
            f"stratified_sample: fractions must be in [0, 1], got {bad}")
    joined = docs.join(lang, "doc_id")
    p = F.lit(0.0)
    for k in sorted(fractions):
        p = F.when(F.col("lang_pred") == F.lit(k),
                   F.lit(round(float(fractions[k]), 6))).otherwise(p)
    u = (
        F.conv(F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(f":{int(seed)}"))), 1, 6), 16, 10)
        .cast("double") / F.lit(float(16 ** 6))
    )
    return joined.where(u < p)


def temperature_sample(docs: DataFrame, strat_col: str = "lang",
                       alpha: float = 0.5, frac: float = 0.5,
                       id_col: str = "doc_id") -> DataFrame:
    """Temperature-based source mixing: draw a ``frac``-of-corpus sample
    whose per-stratum shares follow ``n_s^alpha`` (alpha < 1 upsamples
    low-resource strata relative to their natural share — the standard
    multilingual/domain rebalancing knob for pretraining mixes).

    Per-stratum keep probability::

        p_s = min(1, frac * N * n_s^alpha / Z / n_s),   Z = sum_t n_t^alpha

    The draw is a DETERMINISTIC hash, not an RNG: u(doc) = first 6 hex
    digits of md5(doc_id) / 16^6, keep iff u < round(p_s, 6) — so the same
    doc is kept on every engine and every run, and the whole operator is
    oracle-checkable (unlike ``sampleBy``'s engine-specific Bernoulli).
    Scale shape: one tiny groupBy for the stratum counts, broadcast back;
    the per-doc draw is a codegen expression — no corpus shuffle at all.
    Output: (id_col, strat_col, keep).
    """
    counts = docs.groupBy(strat_col).agg(F.count(F.lit(1)).alias("_cnt"))
    tot = counts.agg(
        F.sum("_cnt").alias("_tot"),
        F.sum(F.pow("_cnt", F.lit(alpha))).alias("_z"),
    )
    probs = counts.crossJoin(F.broadcast(tot)).select(
        strat_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(frac) * F.col("_tot") * F.pow("_cnt", F.lit(alpha))
                / F.col("_z") / F.col("_cnt"),
            ),
            6,
        ).alias("_p"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("double") / F.lit(float(16 ** 6))
    )
    return docs.join(F.broadcast(probs), strat_col).select(
        id_col, strat_col, (u < F.col("_p")).alias("keep")
    )


def pack_token_shards(docs: DataFrame, budget: int = 10_000) -> DataFrame:
    """Assign docs to fixed token-budget training shards: iterate docs in
    doc_id order, accumulate token counts, cut a new shard every ``budget``
    tokens (shard_id = floor(exclusive-prefix-sum / budget) — a doc whose
    tokens straddle the boundary belongs to the shard it started in).

    Output: (doc_id, n_tokens, shard_id).  The assignment is the
    range-partition + broadcast-offset exclusive prefix sum
    (``operators/sequences.ranged_prefix_sum``) — identical output to a
    global ``sum() OVER (ORDER BY doc_id)`` window, with no single-task
    sort at any scale.
    """
    counted = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    packed = ranged_prefix_sum(counted, ["doc_id"], "n_tokens",
                               out_col="_cum", exclusive=True)
    return packed.select(
        "doc_id",
        "n_tokens",
        (F.col("_cum") / budget).cast("long").alias("shard_id"),
    )


def salted_split(docs: DataFrame, weights: tuple[int, int, int] = (90, 5, 5),
                 salt: str = "split-v1", id_col: str = "doc_id") -> DataFrame:
    """Deterministic salted train/val/test assignment: bucket = first 6 hex
    digits of md5(id ':' salt) mod 100, cut at the cumulative weights.
    Salting (vs hashing the raw id) means a new salt re-deals the split
    without correlating with any other hash of the same ids — the standard
    leakage guard when ids also drive sharding or sampling.  Pure codegen
    expression per row: no shuffle, no RNG, identical assignment on every
    engine and every run.

    Precision note: 16^6 is not divisible by 100, so ``mod 100`` carries a
    modulo bias of ~4e-6 per bucket (buckets 0-15 are hit by one extra
    16^6-range value each) — proportions are "exact" only to that
    tolerance.  If finer or unbiased splits are ever needed, switch to
    ``mod 10000`` with basis-point weights and update ``_SALTED_SPLIT_SQL``
    in lockstep.
    Output: (id_col, bucket, split).
    """
    w_train, w_val, w_test = weights
    if w_train + w_val + w_test != 100:
        raise ValueError("weights must sum to 100")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"),
                               F.lit(":" + salt))), 1, 6),
            16, 10,
        ).cast("long") % 100
    )
    return docs.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.when(bucket < w_train, "train")
        .when(bucket < w_train + w_val, "val")
        .otherwise("test")
        .alias("split"),
    )


def span_corruption(docs: DataFrame, mask_ratio: float = 0.15,
                    mean_span: int = 3, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """T5-style span-corruption planning (Raffel et al. 2020 §3.1.4):
    choose the token spans a denoising objective would mask — span
    STARTS drawn per position with probability ``mask_ratio /
    mean_span``, each start masking ``mean_span`` tokens, overlapping
    spans merging.  The draw is the deterministic md5-hex fold (the
    :func:`temperature_sample` convention), keyed on (doc_id, position),
    so the plan is identical on every engine and run — which makes an
    APPROXIMATELY-15% masking objective exactly oracle-checkable.

    Zero-shuffle: indexed higher-order array expressions per row
    (DuckDB's lambda index is 1-based; the Spark side normalizes to the
    same convention).  Output: (id_col, n_tokens, n_spans, n_masked,
    masked_rate, flags_hash) where flags_hash fingerprints the exact
    0/1 mask vector.
    """
    from .text import words

    ws = words(text_col)
    thr = int(round(mask_ratio / mean_span * 16 ** 6))
    L = mean_span

    def draw(pos1):            # pos1: 1-based position Column
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("sc:"),
                                   F.col(id_col).cast("string"),
                                   F.lit(":"), pos1.cast("string"))),
                    1, 6),
                16, 10,
            ).cast("long")
            < thr
        )

    starts = F.transform(ws, lambda x, i: draw(i + 1))
    masked = F.transform(
        starts,
        lambda s, i: F.exists(
            F.slice(starts,
                    F.greatest(i + 2 - L, F.lit(1)),
                    F.least(F.lit(L), i + 1)),
            lambda b: b,
        ),
    )
    span_starts = F.transform(
        masked,
        lambda m, i: m & ~F.when(i > 0, F.element_at(masked, i))
        .otherwise(F.lit(False)),
    )
    n_tokens = F.size(ws)
    n_masked = F.size(F.filter(masked, lambda b: b))
    n_spans = F.size(F.filter(span_starts, lambda b: b))
    return docs.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        n_spans.cast("long").alias("n_spans"),
        n_masked.cast("long").alias("n_masked"),
        F.round(
            F.when(n_tokens > 0,
                   n_masked.cast("double") / n_tokens.cast("double"))
            .otherwise(F.lit(0.0)), 6).alias("masked_rate"),
        F.md5(
            F.array_join(
                F.transform(masked,
                            lambda b: F.when(b, "1").otherwise("0")),
                "")
        ).alias("flags_hash"),
    )


def pack_sequences(docs: DataFrame, seq_len: int = 256,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Causal-LM sequence packing layout: concatenate the corpus token
    stream in ``id_col`` order and cut it into fixed ``seq_len``
    training sequences, documents crossing sequence boundaries where
    they fall (the standard packed-pretraining layout; the EOS token
    between docs is an off-by-one the caller owns).  Complements
    :func:`pack_token_shards` (budget GROUPS of whole docs) with the
    fixed-length SPLITTING layout.

    Scale shape: the global token offset is the sharded ranged prefix
    sum (operators/sequences.py — no single-task sort), everything else
    is per-row arithmetic.
    Output: (id_col, n_tokens, start_offset, first_seq,
    n_seqs_spanned) — n_seqs_spanned > 1 marks boundary-crossing docs,
    0-token docs span 0 sequences.
    """
    counted = docs.select(
        F.col(id_col), token_count(text_col).cast("long").alias("n_tokens"))
    cum = ranged_prefix_sum(counted, [id_col], "n_tokens",
                            out_col="start_offset", exclusive=True)
    s = F.col("start_offset")
    n = F.col("n_tokens")
    return cum.select(
        F.col(id_col),
        n.alias("n_tokens"),
        s.cast("long").alias("start_offset"),
        F.floor(s / seq_len).cast("long").alias("first_seq"),
        F.when(n > 0,
               F.floor((s + n - 1) / seq_len) - F.floor(s / seq_len) + 1)
        .otherwise(F.lit(0)).cast("long").alias("n_seqs_spanned"),
    )


def leakage_safe_split(docs: DataFrame,
                       weights: tuple[int, int, int] = (90, 5, 5),
                       salt: str = "split-v1",
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Cluster-aware train/val/test split — the leakage guard
    :func:`salted_split` alone cannot give: near-duplicate documents MUST
    land in the same split (a train doc whose near-copy sits in test
    leaks the answer), so the salted draw is keyed on the near-dup
    CLUSTER id, not the doc id.  Clusters come from the oracled LSH ->
    Jaccard-verify -> min-label composition (functions/dedup.py); docs
    in no verified pair are their own singleton cluster.

    Scale shape: the dedup composition's bucketed joins plus ONE salted
    hash expression — no new shuffle beyond the cluster labeling.
    Output: (id_col, cluster_id, bucket, split); every member of a
    cluster shares bucket and split by construction.
    """
    from .dedup import minhash_lsh_pairs, near_dup_clusters, verify_jaccard
    from .text import shingles

    w_train, w_val, w_test = weights
    if w_train + w_val + w_test != 100:
        raise ValueError("weights must sum to 100")
    from ..cachepin import pin

    sh = pin(shingles(docs.select(F.col(id_col).alias("doc_id"),
                                  F.col(text_col).alias("text"))))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"))
    # pin cand AND pairs (round-15): verify_jaccard reads cand twice,
    # and near_dup_clusters materializes two pinned frames off pairs
    # (nodes + edges) — unpinned, the LSH+verify subtree executed four
    # times in this plan
    cand = pin(minhash_lsh_pairs(base, shingle_df=sh))
    pairs = pin(verify_jaccard(
        base, cand, threshold=0.5, shingle_df=sh,
    ).select("doc_a", "doc_b"))
    clusters = near_dup_clusters(pairs)
    full = base.select("doc_id").join(clusters, "doc_id", "left").select(
        F.col("doc_id").alias(id_col),
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("cluster_id").cast("string"),
                               F.lit(":" + salt))), 1, 6),
            16, 10,
        ).cast("long") % 100
    )
    return full.select(
        F.col(id_col),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        bucket.alias("bucket"),
        F.when(bucket < w_train, "train")
        .when(bucket < w_train + w_val, "val")
        .otherwise("test")
        .alias("split"),
    )


def mixture_plan(docs: DataFrame, budget_tokens: int,
                 alpha: float = 0.5,
                 strat_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """Per-source training-mix PLAN — the artifact a data-mixing run
    publishes before any sampling happens: for each source its natural
    token share, the temperature-rebalanced target share
    (``n_tokens^alpha / Z``, the multilingual-rebalancing knob
    ``temperature_sample`` applies per-document), the sampling rate that
    realizes the target inside ``budget_tokens``, and the epoch count
    (``ceil(rate)`` — a rate above 1 means the source repeats; the
    standard upsampling readout for low-resource domains).

    Float posture: shares/rates are double ``pow``/division rounded to
    6 decimals — the temperature_sample/bm25 precedent (both engines
    evaluate the same IEEE expression on the same integers).

    Scale shape: ONE corpus aggregation to the per-source token table
    (map-side combine on the tiny source key), then broadcast-only
    arithmetic — no second corpus pass, no join back to docs.

    A source whose documents are all empty/whitespace has
    ``n_tokens = 0``: it contributes nothing to the mix, so its shares
    and rate are pinned to 0.0 (and epochs to 0) rather than letting
    0/0 produce NULL/NaN that the two engines could disagree on.
    Output: (strat_col, n_docs, n_tokens, natural_share, target_share,
    sample_rate, epochs)."""
    per = docs.groupBy(strat_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(text_col)).cast("long").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_tot"),
        F.sum(F.pow("n_tokens", F.lit(alpha))).alias("_z"),
    )
    nz = F.col("n_tokens") > 0
    rate = F.when(nz, F.lit(float(budget_tokens))
                  * F.pow("n_tokens", F.lit(alpha)) / F.col("_z")
                  / F.col("n_tokens")).otherwise(F.lit(0.0))
    return per.crossJoin(F.broadcast(tot)).select(
        strat_col, "n_docs", "n_tokens",
        F.round(F.when(nz, F.col("n_tokens") / F.col("_tot"))
                .otherwise(F.lit(0.0)), 6)
        .alias("natural_share"),
        F.round(F.when(nz, F.pow("n_tokens", F.lit(alpha)) / F.col("_z"))
                .otherwise(F.lit(0.0)), 6)
        .alias("target_share"),
        F.round(rate, 6).alias("sample_rate"),
        F.ceil(F.round(rate, 6)).cast("long").alias("epochs"),
    )


# DSIR importance resampling --------------------------------------------------

DSIR_DIM = 256           # hashed n-gram feature buckets (paper uses 10^4;
#                          the bucket count is a free parameter of the method)


def _gram_bucket(g: Column, dim: int) -> Column:
    """md5-hex fold of a gram into [0, dim) — the ONE shared rendering
    (functions/text.py:md5_bucket)."""
    from .text import md5_bucket

    return md5_bucket(g, dim)


def dsir_weights(docs: DataFrame, target: Column | None = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 dim: int = DSIR_DIM) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling") —
    the hashed n-gram variant: score every raw document by how much
    more likely its features are under a TARGET domain's hashed
    unigram+bigram distribution than under the raw corpus's own.

    ``target`` is a boolean Column marking the in-domain exemplar docs
    (the paper's "target" sample — e.g. a trusted wiki/books subset);
    default marks documents containing the word 'stream' so the
    operator is self-contained and oracle-checkable on the synthetic
    corpus.  Per bucket b the add-one-smoothed log ratio is
    ``lr_b = ln((p_b+1)/(Np+dim)) - ln((q_b+1)/(Nq+dim))`` (p = target
    feature counts, q = raw feature counts, N* = total gram
    instances); a document's importance weight is the sum of lr over
    its gram multiset.  ``selected`` = (weight > 0): the doc is more
    target-like than raw-average — the paper then resamples
    proportionally; a deterministic threshold keeps the row
    hash-checkable (rank-based top-k selection composes on top via
    operators/sequences ranged ranking, exactly the frontier_rank
    shape).

    Scale shape: grams stay in-row (zip_with bigrams, zero-shuffle)
    until ONE explode; the two distribution tables are dim-sized
    aggregates (map-side combined, broadcast back); the only
    full-width exchange is the final per-doc sum.  The bucketed gram
    frame is pinned so the explode + md5 fold executes once for both
    distribution passes (at 100 TB: persist the tokenized frame once
    and read it for both — the same shape).

    Output: (id_col, n_grams, is_target, log_weight, selected).
    """
    from .text import words

    ws = F.filter(words(text_col), lambda w: F.length(w) > 0)
    n = F.size(ws)
    bigrams = F.when(
        n >= 2,
        F.zip_with(F.slice(ws, 1, n - 1), F.slice(ws, 2, n - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(ws, bigrams)
    if target is None:
        target = F.array_contains(ws, "stream")

    base = docs.select(
        F.col(id_col),
        grams.alias("grams"),
        target.cast("int").alias("is_target"),
    )
    from ..cachepin import pin

    # pinned: the bucketed gram-instance frame feeds BOTH distribution
    # passes (the dim-sized dist aggregate and the per-doc weight sum);
    # unpinned, the explode + per-gram md5 fold executed twice (round-15
    # measurement).  The pinned rows are three small ints per gram —
    # the in-session form of the "persist the tokenized frame once and
    # read it for both passes" posture the 100 TB note below describes.
    exploded = pin(base.select(
        id_col, "is_target",
        F.explode("grams").alias("g"),
    ).select(id_col, "is_target", _gram_bucket(F.col("g"), dim)
             .alias("bucket")))

    dist = exploded.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("q_b"),
        F.sum("is_target").cast("long").alias("p_b"),
    )
    # Np/Nq as a whole-table window over the DIM-SIZED dist frame — a
    # single task bounded by the dim constant at any corpus scale, and
    # it keeps the totals inside dist's lineage (a separate .agg would
    # re-execute the corpus explode for a second scan).
    whole = Window.partitionBy(F.lit(1))
    lr = dist.select(
        "bucket",
        (F.log((F.col("p_b") + 1).cast("double"))
         - F.log((F.sum("p_b").over(whole) + dim).cast("double"))
         - F.log((F.col("q_b") + 1).cast("double"))
         + F.log((F.sum("q_b").over(whole) + dim).cast("double"))
         ).alias("lr"),
    )
    doc_w = (
        exploded.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum("lr").alias("w"))
    )
    return (
        base.select(id_col, "is_target")
        .join(doc_w, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.col("is_target"),
            F.round(F.coalesce("w", F.lit(0.0)), 6).alias("log_weight"),
            # threshold the ROUNDED weight: the raw double sum's sign
            # is engine/order-dependent in the last ulps near zero —
            # exactly the drift the 6-dp rounding posture exists to
            # absorb (round-12 review fix)
            (F.round(F.coalesce("w", F.lit(0.0)), 6) > 0).cast("int")
            .alias("selected"),
        )
    )


def pack_samples(docs: DataFrame, max_len: int = 512,
                 shard_docs: int = 50) -> DataFrame:
    """Boundary-respecting SAMPLE PACKING (round 14) — the third
    packing semantic next to :func:`pack_token_shards` (whole-doc
    budget groups) and :func:`pack_sequences` (docs SPLIT across
    fixed boundaries — the causal-LM concat-and-chunk layout): docs
    in doc_id order pack greedily (NEXT-fit: only the LAST open
    sequence is considered — never an earlier one with room, which
    first-fit would revisit) into fixed-capacity sequences of
    ``max_len`` tokens, and a doc NEVER splits across sequences
    (contrast the token-shard row's straddle rule); a doc longer
    than ``max_len`` opens a fresh sequence
    truncated to capacity (``n_truncated`` counts them — zero-token
    docs that follow may still join that sequence, so ``n_docs`` is
    not pinned to 1 there).

    Scale shape: packing is inherently sequential, so it runs
    sequentially only WITHIN a ranked shard of ``shard_docs`` docs
    and embarrassingly parallel ACROSS shards — the distributed shape
    a real packing job uses (a global greedy would serialize the
    corpus; the cost is that the last sequence of each shard may
    carry avoidable padding, which ``padding_waste`` makes visible).
    Shard ranks come from the scale-safe ranged prefix sum (no global
    sort task); the per-shard greedy runs in one Arrow group.

    Output: one row per packed sequence — (shard_id, seq_idx, n_docs,
    n_truncated, tokens_used, padding_waste, docs_md5) with docs_md5
    the order-canonical md5 of length-prefixed doc ids."""
    import hashlib

    from pyspark.sql import types as T

    # loud contract refusal, matching pack_webdataset_shards' posture
    # (ADVICE r14): the per-shard greedy canonicalizes ids via
    # int(did), so a non-integral doc_id column would otherwise fail
    # deep inside the Arrow worker with an untyped exception
    id_type = docs.schema["doc_id"].dataType
    if not isinstance(id_type, (T.ByteType, T.ShortType,
                                T.IntegerType, T.LongType)):
        raise ValueError(
            f"pack_samples: doc_id must be an integral column, got "
            f"{id_type.simpleString()}")

    counted = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens"))
    # 1-based ranged row_number mirrors the oracle's row_number() - 1
    ranked = ranged_row_number(counted, ["doc_id"], out_col="_rn")
    sharded = ranked.select(
        "doc_id", "n_tokens",
        F.expr(f"(_rn - 1) div {int(shard_docs)}").alias("shard_id"))

    schema = T.StructType([
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("seq_idx", T.LongType(), True),
        T.StructField("n_docs", T.LongType(), True),
        T.StructField("n_truncated", T.LongType(), True),
        T.StructField("tokens_used", T.LongType(), True),
        T.StructField("padding_waste", T.LongType(), True),
        T.StructField("docs_md5", T.StringType(), True),
    ])

    def pack(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        seqs: list[list] = []           # [used, n_trunc, [doc_ids]]
        for did, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            n = int(n)
            trunc = n > max_len
            take = min(n, max_len)
            if not seqs or seqs[-1][0] + take > max_len:
                seqs.append([0, 0, []])
            seqs[-1][0] += take
            seqs[-1][1] += int(trunc)
            seqs[-1][2].append(int(did))
        rows = []
        for i, (used, ntr, ids) in enumerate(seqs):
            canon = "|".join(f"{len(str(d))}:{d}" for d in ids)
            rows.append((int(key[0]), i, len(ids), ntr, used,
                         max_len - used,
                         hashlib.md5(canon.encode()).hexdigest()))
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return sharded.groupBy("shard_id").applyInPandas(pack, schema)
