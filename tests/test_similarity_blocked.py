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


def test_semantic_dedup_keeps_least_central(spark):
    """Two identical vectors in one cell: the one with LOWER centroid
    similarity survives; a lone dissimilar vector is always kept."""
    import pyspark.sql.functions as F

    from simpy__kafka__flink__kafka_spark.functions.similarity import (
        semantic_dedup)

    # centroid universe: vec_id < N_CENTROIDS are centroids (ivf_assign
    # convention); craft 2 clones near centroid 0 and one loner near
    # centroid 1
    rows = [
        (0, [1.0, 0.0, 0.0]),          # centroid 0
        (1, [0.0, 1.0, 0.0]),          # centroid 1
        (2, [0.0, 0.0, 1.0]),          # centroid 2 (unused)
        (3, [0.0, 0.0, 0.9]),
        (10, [0.9, 0.1, 0.0]),         # clone A, closer to centroid 0
        (11, [0.8, 0.2, 0.0]),         # clone B, less central
        (12, [0.1, 0.9, 0.0]),         # loner in cell 1
    ]
    # make 10 and 11 near-identical in cosine: use same direction
    rows[4] = (10, [0.9, 0.1, 0.0])
    rows[5] = (11, [0.9000001, 0.1, 0.0])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, 0.99).collect()}
    assert len(out) == len(rows)
    # 10 and 11 share a cell and cos ~ 1.0 -> exactly one survives
    assert out[10]["kept"] + out[11]["kept"] == 1
    # survivor is the LESS central one (lower cell_sim; ties by id)
    kept_id = 10 if out[10]["kept"] else 11
    dropped_id = 21 - kept_id
    assert (out[kept_id]["cell_sim"], kept_id) <= (
        out[dropped_id]["cell_sim"], dropped_id)
    assert out[12]["kept"] == 1


def test_semantic_dedup_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["semantic_dedup"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "semantic_dedup")


def test_salsa_rejects_zero_iterations(spark):
    import pytest

    from simpy__kafka__flink__kafka_spark.operators.graph import salsa

    df = spark.createDataFrame([(0, 1, 1)], "src long, dst long, weight long")
    with pytest.raises(ValueError):
        salsa(df, iterations=0)


def test_semantic_dedup_row_fires_both_arms(spark, sf_dir):
    """The gate row must produce BOTH kept=1 and kept=0 rows at every
    SF (the empty-but-green guard, applied to the CASE arm): the twin
    augmentation guarantees drop-side coverage."""
    from simpy__kafka__flink__kafka_spark.plans import registry

    out = registry()["semantic_dedup"].build(spark, sf_dir)
    kept = {r["kept"] for r in out.select("kept").distinct().collect()}
    assert kept == {0, 1}
