"""Round-16 quiet A/B for soft_dedup_weights' pin posture (VERDICT r15
task 1): the round-15 cand pin made the driver's cold number WORSE at
sf0.1 (5.74 -> 8.70 s; two extra cache materializations per cold rep).
Variants, interleaved best-of-N in ONE session, cold (clearCache +
unpin_all between every execution):

  base      sh pin + cand pin + pairs pin   (shipping r15 form)
  nocand    sh pin + pairs pin              (r14 form + sh pin)
  memonly   sh pin + cand pin MEMORY_ONLY + pairs pin
  nosh      cand pin + pairs pin            (shingles recompute twice)
  lean      pairs pin only

    python experiments/soft_dedup_pin_ab_r16.py [--reps 3] [--sf DIR]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark import StorageLevel  # noqa: E402

from simpy__kafka__flink__kafka_spark.cachepin import pin, unpin_all  # noqa: E402
from simpy__kafka__flink__kafka_spark.functions import dedup  # noqa: E402
from simpy__kafka__flink__kafka_spark.functions.text import shingles  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir, *, pin_sh, pin_cand, cand_level, pin_pairs):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    sh = shingles(docs)
    if pin_sh:
        sh = pin(sh)
    cand = dedup.minhash_lsh_pairs(docs, shingle_df=sh)
    if pin_cand:
        cand = pin(cand, level=cand_level)
    pairs = dedup.verify_jaccard(
        docs, cand, threshold=0.5, shingle_df=sh).select("doc_a", "doc_b")
    if pin_pairs:
        pairs = pin(pairs)
    return dedup.soft_dedup_weights(docs, pairs)


VARIANTS = {
    "base": dict(pin_sh=True, pin_cand=True, cand_level=None,
                 pin_pairs=True),
    "nocand": dict(pin_sh=True, pin_cand=False, cand_level=None,
                   pin_pairs=True),
    "memonly": dict(pin_sh=True, pin_cand=True,
                    cand_level=StorageLevel.MEMORY_ONLY, pin_pairs=True),
    "nosh": dict(pin_sh=False, pin_cand=True, cand_level=None,
                 pin_pairs=True),
    "lean": dict(pin_sh=False, pin_cand=False, cand_level=None,
                 pin_pairs=True),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()
    spark = get_spark("soft-dedup-pin-ab")
    names = args.variants.split(",")
    # warmup (JVM/codegen) outside the timings
    build(spark, args.sf, **VARIANTS[names[0]]).write.format("noop").mode(
        "overwrite").save()
    spark.catalog.clearCache(); unpin_all()
    best: dict[str, float] = {}
    for _ in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"soft_dedup:{name}")
            t0 = time.perf_counter()
            build(spark, args.sf, **VARIANTS[name]).write.format(
                "noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, float("inf")), dt)
            spark.catalog.clearCache(); unpin_all()
    print(json.dumps({"experiment": "soft_dedup_pin_ab_r16",
                      "sf": args.sf, "reps": args.reps,
                      **{k: round(v, 2) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
