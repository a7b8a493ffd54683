"""int8 quantization must preserve retrieval quality: top-10 over the
dequantized corpus recalls >= 0.9 of the exact float top-10."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.similarity import (
    brute_force_topk, quantized_topk)


def test_quantized_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = brute_force_topk(emb).select("query_id", "vec_id")
    quant = quantized_topk(emb).select("query_id", "vec_id")
    n = exact.count()
    hits = quant.join(exact, ["query_id", "vec_id"]).count()
    assert n > 0
    assert hits / n >= 0.9, f"recall {hits}/{n}"


def test_pq_rerank_recall_and_determinism(spark, sf_dir):
    from simpy__kafka__flink__kafka_spark.functions.similarity import (
        brute_force_topk, pq_topk_rerank)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {}
    for r in brute_force_topk(emb, 5, 10).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    rows1 = sorted(map(tuple, pq_topk_rerank(emb, 5, 10).collect()))
    for t in rows1:
        got.setdefault(t[0], set()).add(t[1])
    rec = sum(len(got[q] & exact[q]) / len(exact[q]) for q in exact) / len(exact)
    assert rec >= 0.9, rec
    # sample-trained codebooks + fixed inits: fully deterministic
    rows2 = sorted(map(tuple, pq_topk_rerank(emb, 5, 10).collect()))
    assert rows1 == rows2


def test_pq_codes_shape_and_range(spark, sf_dir):
    from simpy__kafka__flink__kafka_spark.functions.similarity import (
        pq_encode, pq_train)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_train(emb, m=8, k=16)
    assert cb.shape == (8, 16, 8)
    codes = pq_encode(emb, cb).collect()
    assert len(codes) == emb.count()
    for r in codes[:50]:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)
