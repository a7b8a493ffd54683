"""Recall@k curve for the IVF ANN paths vs exact brute force (VERDICT r04
task #6): sweep n_probe for both the deterministic-centroid ivf_topk and
the KMeans-trained ivf_topk_trained, against cosine ground truth.

    python experiments/ivf_recall.py [--sf /root/testdata/sf0.1] \
        [--queries 20] [--k 10]

Prints one JSON line per (path, nprobe): recall = |ivf ∩ exact| / |exact|
over all queries.  tests/test_kmeans_ivf.py pins >= 0.8 at nprobe=4 for
the trained path; tests/test_quantized_recall.py pins >= 0.9 for int8
quantization — this script publishes the full curve behind those floors.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpy__kafka__flink__kafka_spark.functions.similarity import (  # noqa: E402
    brute_force_topk, ivf_topk, ivf_topk_trained)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def pairs(df) -> set:
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("ivf-recall")
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet").cache()
    n_vecs = emb.count()

    exact = pairs(brute_force_topk(emb, n_queries=args.queries, k=args.k))
    out = {"experiment": "ivf_recall", "sf": args.sf, "vectors": n_vecs,
           "queries": args.queries, "k": args.k, "recall": {}}
    for nprobe in (1, 2, 4, 8):
        got = pairs(ivf_topk(emb, n_queries=args.queries, k=args.k,
                             nprobe=nprobe))
        out["recall"][f"ivf_nprobe{nprobe}"] = round(
            len(got & exact) / len(exact), 3)
        got_t = pairs(ivf_topk_trained(emb, n_queries=args.queries,
                                       k=args.k, nprobe=nprobe))
        out["recall"][f"ivf_trained_nprobe{nprobe}"] = round(
            len(got_t & exact) / len(exact), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
