"""Corpus sampling and shard packing — the last mile of a training-data
pipeline: draw a language-stratified mix and pack documents into fixed
token-budget shards.

Scale notes: `stratified_sample` is `DataFrame.sampleBy` (per-row Bernoulli
on a seeded hash — no shuffle at all).  `pack_token_shards` assigns each doc
`shard_id = floor(cumulative_tokens / budget)` over a deterministic doc
order via ``operators/sequences.ranged_prefix_sum`` — a range repartition
plus partition-local cumulative sums with broadcast offsets, so no
single-task global sort anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sequences import ranged_prefix_sum
from .text import token_count


def stratified_sample(docs: DataFrame, lang: DataFrame,
                      fractions: dict[str, float],
                      seed: int = 42) -> DataFrame:
    """Language-stratified corpus draw: keep each doc with its language's
    target fraction (the standard data-mixing knob for pretraining runs).
    ``lang``: (doc_id, lang_pred).  Declared rows-only — Bernoulli draws are
    engine-specific — with the mix proportions property-tested instead."""
    joined = docs.join(lang, "doc_id")
    return joined.sampleBy("lang_pred", fractions, seed=seed)


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
