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
