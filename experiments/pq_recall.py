"""Product-quantization recall characterization: ADC-only top-k and the
shortlist+exact-rerank pipeline vs the exact brute-force cosine baseline,
over (m, n_centroids, shortlist_mult).

    python experiments/pq_recall.py [--sf /root/testdata/sf0.01] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpy__kafka__flink__kafka_spark.functions.similarity import (  # noqa: E402
    brute_force_topk, pq_topk, pq_topk_rerank)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def _sets(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("pq-recall")
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    exact = _sets(brute_force_topk(emb, args.n_queries, args.k))

    def recall(df):
        a = _sets(df)
        return round(sum(len(a.get(q, set()) & exact[q]) / len(exact[q])
                         for q in exact) / len(exact), 3)

    res = {"experiment": "pq_recall", "sf": args.sf, "k": args.k,
           "adc_only": {}, "rerank": {}}
    for m, kc in ((8, 16), (16, 16), (16, 32)):
        res["adc_only"][f"m{m}_k{kc}"] = recall(
            pq_topk(emb, args.n_queries, args.k, m=m, n_centroids=kc))
    for mult in (3, 5, 10):
        res["rerank"][f"mult{mult}"] = recall(
            pq_topk_rerank(emb, args.n_queries, args.k,
                           shortlist_mult=mult))
    assert res["rerank"]["mult10"] >= 0.9, res
    print(json.dumps(res))


if __name__ == "__main__":
    main()
