"""The blocked-matmul near-dup scale path must agree with the oracle-checked
expression-fold form."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.similarity import (
    embedding_near_dup_blocked, embedding_near_dup_pairs)


def _pairs(df):
    return {(r.vec_a, r.vec_b): r.cos_sim for r in df.collect()}


def test_blocked_matches_fold(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    thr = 0.05  # low threshold so plenty of pairs exercise both paths
    fold = _pairs(embedding_near_dup_pairs(emb, threshold=thr))
    blocked = _pairs(embedding_near_dup_blocked(emb, threshold=thr, block_size=128))
    assert set(fold) == set(blocked)
    for k in fold:
        assert abs(fold[k] - blocked[k]) < 2e-6, (k, fold[k], blocked[k])
