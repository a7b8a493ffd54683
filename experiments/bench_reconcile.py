"""Bench-ledger reconciliation (VERDICT r06 task #2).

(a) contamination_check corpus-side A/B — the round-6 plan change
(multiset corpus stream, no corpus shuffle) was scale-right but cost +73%
cold locally and shipped without a recorded A/B.  This records all three
shapes in the driver-identical cold configuration:
  - r5 "corpus_distinct": corpus-wide .distinct() before the join
    (smallest downstream, but a full corpus exchange — the scale defect)
  - r6 "multiset": raw stream + final countDistinct (no corpus exchange,
    largest hit stream — the unrecorded local regression)
  - r7 "doc_distinct" (new default): per-doc array_distinct before the
    explode — map-side partial dedup, zero exchange, plain count agg.
All three must agree row-for-row (asserted).

(b) near_dup_verified — BENCH_r06 printed 3.49 s where the builder's own
A/B said 2.5-2.8 s, the second round of wrong-way movement; this
re-measures it with INTERLEAVED cold reps (co-tenant spikes dent single
reps, min() recovers the clean number) in the exact bench.py
configuration (noop sink, clearCache between executions).

    python experiments/bench_reconcile.py [--sf /root/testdata/sf0.1] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.functions.text import (  # noqa: E402
    contaminated_docs, shingles)
from simpy__kafka__flink__kafka_spark.plans import registry  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def _cold(spark, df) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("bench-reconcile")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text")
    res = {"experiment": "bench_reconcile", "sf": args.sf}

    # ---- (a) contamination corpus-side shapes --------------------------
    def corpus_distinct():
        # the r5 shape: corpus-wide distinct before the broadcast join
        sh = shingles(docs, n=8).distinct()
        bench = (sh.where(F.col("doc_id") % 10 == 0)
                 .select("shingle").distinct())
        return (sh.where(F.col("doc_id") % 10 != 0)
                .join(F.broadcast(bench), "shingle")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("long")
                     .alias("n_contaminated")))

    shapes = {
        "corpus_distinct_r5": corpus_distinct,
        "multiset_r6": lambda: contaminated_docs(
            docs, corpus_side="multiset"),
        "doc_distinct_r7": lambda: contaminated_docs(
            docs, corpus_side="doc_distinct"),
    }
    rows = {k: {tuple(r) for r in b().collect()} for k, b in shapes.items()}
    assert rows["corpus_distinct_r5"] == rows["multiset_r6"] == \
        rows["doc_distinct_r7"], "contamination shapes disagree"
    cont = {k: [] for k in shapes}
    for rep in range(args.reps):            # interleaved
        for k, b in shapes.items():
            cont[k].append(_cold(spark, b()))
    res["contamination_ab"] = {
        k: {"cold_secs": ts, "min": min(ts)} for k, ts in cont.items()}
    res["contamination_ab"]["identical_output"] = True

    # ---- (b) near_dup_verified interleaved reconciliation --------------
    reg = registry()
    targets = ["near_dup_verified", "contamination_check"]
    nd = {k: [] for k in targets}
    for rep in range(args.reps):            # interleaved across targets
        for k in targets:
            nd[k].append(_cold(spark, reg[k].build(spark, args.sf)))
    res["driver_config_interleaved"] = {
        k: {"cold_secs": ts, "min": min(ts),
            "median": sorted(ts)[len(ts) // 2]}
        for k, ts in nd.items()}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
