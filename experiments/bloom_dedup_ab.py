"""Bloom-prefilter A/B for dedup_against's EXACT stage (VERDICT r08 task
#5): the exact-known check is a fingerprint left-semi join against the
prior profile.  At registry scale the prior side broadcasts, so the
semi-join is already one broadcast exchange; the hypothesized win case is
a prior too large to broadcast, where a compact Bloom of the prior
fingerprints (built once, broadcast as a scalar) lets the scan drop
definitely-fresh docs BEFORE the shuffle semi-join that confirms the
maybes.

Variants, timed cold (caches cleared between reps, best of N):

  A  semi      fp_new LEFT SEMI JOIN prior_fp            (current code)
  B  bloom     might_contain(bloom(prior), xxhash64(fp)) as a prefilter,
               then the SAME semi-join over only the maybes
  A' semi-big  A with broadcast joins disabled (the shuffle-join regime a
               too-big prior forces — the case Bloom is FOR)
  B' bloom-big B with broadcast joins disabled

    python experiments/bloom_dedup_ab.py [--sf /root/testdata/sf0.1]
                                         [--reps 3] [--copies 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.functions.text import normalized  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--copies", type=int, default=1,
                    help="replicate docs N-fold (id-shifted) to grow both sides")
    args = ap.parse_args()

    spark = get_spark("bloom-ab")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text")
    if args.copies > 1:
        n = docs.count()
        docs = docs.crossJoin(
            spark.range(args.copies).select(F.col("id").alias("_c"))
        ).select((F.col("doc_id") + F.col("_c") * (n * 10)).alias("doc_id"),
                 "text")

    # prior = every third doc's fingerprint (the crawl_admission posture)
    fp_all = docs.select("doc_id", F.md5(normalized("text"))
                         .alias("fingerprint"))
    prior_fp = (fp_all.where(F.col("doc_id") % 3 == 0)
                .select("fingerprint").distinct())
    prior_path = "/tmp/bloom_ab_prior"
    fp_path = "/tmp/bloom_ab_new"
    prior_fp.write.mode("overwrite").parquet(prior_path)
    fp_all.write.mode("overwrite").parquet(fp_path)
    n_prior = spark.read.parquet(prior_path).count()
    n_new = spark.read.parquet(fp_path).count()

    def semi(prior, new):
        return new.join(prior, "fingerprint", "left_semi")

    def bloom(prior, new):
        # bloom_filter_agg builds the filter JVM-side in one aggregate;
        # the single-row result broadcasts as a scalar subquery input
        blm = prior.agg(F.expr(
            f"bloom_filter_agg(xxhash64(fingerprint), "
            f"CAST({max(n_prior, 1)} AS BIGINT), "
            f"CAST({max(n_prior, 1) * 10} AS BIGINT))").alias("b"))
        maybes = new.crossJoin(F.broadcast(blm)).where(
            F.expr("might_contain(b, xxhash64(fingerprint))")).drop("b")
        return semi(prior, maybes)

    def run(fn, big: bool) -> float:
        best = float("inf")
        for _ in range(args.reps):
            spark.catalog.clearCache()
            if big:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                prior = spark.read.parquet(prior_path)
                new = spark.read.parquet(fp_path)
                t0 = time.perf_counter()
                out = fn(prior, new).count()
                best = min(best, time.perf_counter() - t0)
            finally:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        return round(best, 3), out

    t_semi, c_semi = run(semi, big=False)
    t_bloom, c_bloom = run(bloom, big=False)
    t_semi_big, c_semi_big = run(semi, big=True)
    t_bloom_big, c_bloom_big = run(bloom, big=True)
    assert c_semi == c_bloom == c_semi_big == c_bloom_big, (
        c_semi, c_bloom, c_semi_big, c_bloom_big)

    print(json.dumps({
        "n_new": n_new, "n_prior": n_prior, "exact_known": c_semi,
        "semi_broadcast_s": t_semi, "bloom_broadcast_s": t_bloom,
        "semi_shuffle_s": t_semi_big, "bloom_shuffle_s": t_bloom_big,
        "bloom_speedup_broadcast": round(t_semi / t_bloom, 2),
        "bloom_speedup_shuffle": round(t_semi_big / t_bloom_big, 2),
    }))


if __name__ == "__main__":
    main()
