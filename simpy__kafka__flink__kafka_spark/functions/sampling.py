"""Corpus sampling and shard packing — the last mile of a training-data
pipeline: draw a language-stratified mix and pack documents into fixed
token-budget shards.

Scale notes: `stratified_sample` is `DataFrame.sampleBy` (per-row Bernoulli
on a seeded hash — no shuffle at all).  `pack_token_shards` assigns each doc
`shard_id = floor(cumulative_tokens / budget)` over a deterministic doc
order; the declared form uses a global window (fixed-oracle-scale twin, same
caveat as `counter_ids`) and the scale path reuses
``operators/sequences.ranged_prefix`` machinery — a range repartition plus
partition-local cumulative sums with broadcast offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

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


def pack_token_shards(docs: DataFrame, budget: int = 10_000) -> DataFrame:
    """Assign docs to fixed token-budget training shards: iterate docs in
    doc_id order, accumulate token counts, cut a new shard every ``budget``
    tokens (shard_id = floor(exclusive-prefix-sum / budget) — a doc whose
    tokens straddle the boundary belongs to the shard it started in).

    Output: (doc_id, n_tokens, shard_id).  The global window here is the
    fixed-oracle-scale twin; at 100 TB the identical assignment comes from
    the range-partition + broadcast-offset prefix sum
    (operators/sequences.py pattern).
    """
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    counted = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    return counted.select(
        "doc_id",
        "n_tokens",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget)
        .cast("long")
        .alias("shard_id"),
    )
