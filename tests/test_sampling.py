"""Shard packing and stratified sampling semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.functions.sampling import (
    pack_token_shards, stratified_sample)
from simpy__kafka__flink__kafka_spark.plans.dataprep import _q_language_id


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_pack_token_shards_budget_respected(spark, sf_dir):
    budget = 2_000
    packed = pack_token_shards(_docs(spark, sf_dir), budget=budget)
    per_shard = packed.groupBy("shard_id").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("max_doc")
    ).collect()
    assert len(per_shard) > 1  # the corpus actually splits
    for r in per_shard:
        # a shard only exceeds the budget by (at most) its straddling doc
        assert r.tok < budget + r.max_doc
    # every doc assigned exactly once
    assert packed.count() == packed.select("doc_id").distinct().count()


def test_pack_token_shards_is_contiguous(spark, sf_dir):
    """Docs are packed in doc_id order: shard_id is monotone in doc_id."""
    rows = pack_token_shards(_docs(spark, sf_dir), budget=2_000) \
        .orderBy("doc_id").select("shard_id").collect()
    ids = [r.shard_id for r in rows]
    assert ids == sorted(ids)


def test_stratified_sample_hits_target_fractions(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    lang = _q_language_id(spark, sf_dir)
    base = docs.join(lang, "doc_id").groupBy("lang_pred").count().collect()
    base_counts = {r.lang_pred: r["count"] for r in base}
    fractions = {k: 0.5 for k in base_counts}
    sampled = stratified_sample(docs, lang, fractions)
    got = sampled.groupBy("lang_pred").count().collect()
    for r in got:
        frac = r["count"] / base_counts[r.lang_pred]
        assert 0.25 <= frac <= 0.75, (r.lang_pred, frac)  # Bernoulli tolerance
    # deterministic under the fixed seed
    again = stratified_sample(docs, lang, fractions).count()
    assert again == sampled.count()
