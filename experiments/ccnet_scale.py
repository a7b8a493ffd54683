"""ccnet_buckets x100 scale checkpoint (VERDICT r12 task 5).

Round 12 measured ccnet_buckets as the new scale-ladder leader (x10
growth 6.01 — the bigram-LM explode over 10x grams).  This experiment
pins the x100 point and A/Bs the corpus-self-trained LM against the
CCNet posture the API already supports (``counts_df`` = an LM trained
on a FIXED-SIZE reference sample), which caps the training explode at
the sample size regardless of corpus scale.

    python experiments/ccnet_scale.py [--sf /root/testdata/sf0.1] \
        [--copies 100] [--sample-docs 5000]

Prints one JSON line: x1/x10/xN wall times for both variants plus the
growth factors.  The decision rule (recorded in PLANS.md): if the
self-trained growth at x100 exceeds copies^1.25 (super-linear beyond
amortization), the registry row's documented scale guidance flips to
the sampled-counts posture for 100 TB runs.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.functions.quality import (  # noqa: E402
    ccnet_buckets)
from simpy__kafka__flink__kafka_spark.functions.text import words  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

from experiments.scale_run import materialize, shifted_docs  # noqa: E402


def bigram_counts(docs) -> "DataFrame":
    """(w1, w2, c2) bigram counts over a docs frame — the counts_df
    shape bigram_lm_score consumes (same zip_with bigram derivation)."""
    arr = words("text")
    n1 = F.greatest(F.size(arr) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(arr, 1, n1), F.slice(arr, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    return (docs.select(F.explode(pairs).alias("p"))
            .select("p.w1", "p.w2")
            .where((F.length("w1") > 0) & (F.length("w2") > 0))
            .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--sample-docs", type=int, default=5000)
    args = ap.parse_args()

    spark = get_spark("ccnet-scale")
    out: dict = {"experiment": "ccnet_scale", "copies": args.copies}

    # the fixed reference LM: bigram counts over a bounded sample of
    # the BASE corpus — its size does not grow with the corpus
    base = spark.read.parquet(f"{args.sf}/documents.parquet")
    # orderBy before limit: a bare limit is nondeterministic across
    # recomputations (clearCache() drops the pin below), which would
    # quietly train each measurement point's "fixed" LM on different
    # docs (review find)
    sample = (base.where(F.col("doc_id") % 101 < 17)
              .orderBy("doc_id").limit(args.sample_docs))
    ref_counts = bigram_counts(sample).cache()
    ref_counts.count()

    for copies in (1, 10, args.copies):
        docs = shifted_docs(spark, args.sf, copies).cache()
        n = docs.count()
        t_self = materialize(ccnet_buckets(docs))
        spark.catalog.clearCache()
        ref_counts.cache().count()           # keep the LM pinned
        docs = shifted_docs(spark, args.sf, copies).cache()
        docs.count()
        t_ref = materialize(ccnet_buckets(docs, counts_df=ref_counts))
        docs.unpersist()
        spark.catalog.clearCache()
        ref_counts.cache().count()
        out[f"x{copies}"] = {"docs": n,
                             "self_trained_sec": round(t_self, 2),
                             "ref_counts_sec": round(t_ref, 2)}

    g_self = out[f"x{args.copies}"]["self_trained_sec"] / max(
        out["x1"]["self_trained_sec"], 0.05)
    g_ref = out[f"x{args.copies}"]["ref_counts_sec"] / max(
        out["x1"]["ref_counts_sec"], 0.05)
    out["growth_self_trained"] = round(g_self, 2)
    out["growth_ref_counts"] = round(g_ref, 2)
    out["bound_1_25"] = round(args.copies ** 1.25, 1)
    out["self_trained_under_bound"] = g_self < args.copies ** 1.25
    print(json.dumps(out))


if __name__ == "__main__":
    main()
