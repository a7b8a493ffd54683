"""Bloom-prefilter A/B for dedup_against's EXACT stage (VERDICT r08 task
#5): the exact-known check is a fingerprint left-semi join against the
prior profile.  At registry scale the prior side broadcasts, so the
semi-join is already one broadcast exchange; the hypothesized win case is
a prior too large to broadcast, where a compact Bloom of the prior
fingerprints lets the scan drop definitely-fresh docs BEFORE the shuffle
semi-join that confirms the maybes.

Finding that shaped this file: Spark exposes no `bloom_filter_agg` /
`might_contain` SQL surface (they are internal expressions), BUT
Catalyst's runtime-filter rewrite (spark.sql.optimizer.runtime.
bloomFilter.enabled, default TRUE) injects exactly the hypothesized
Bloom automatically when the creation side is under
creationSideThreshold and the join shuffles — i.e. the optimizer
already implements the VERDICT's suggestion.  So the honest A/B is:

  A  semi-broadcast   the current plan (prior broadcasts)    [baseline]
  B  semi-shuffle     broadcast disabled, runtime Bloom OFF  [big-prior
                                                             regime, no filter]
  C  semi-shuffle+rbf broadcast disabled, runtime Bloom ON   [big-prior
                                                             regime, engine Bloom]
  D  handrolled       k=2 bit-word Bloom built as a groupBy over word
                      slots + broadcast map-side prefilter, then the
                      confirming semi-join — the shape one would wire by
                      hand if the engine didn't have C

Timed cold (best of N, caches cleared).  All variants must return the
same exact-known count (the Bloom is a prefilter, never the verdict).

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

M_BITS_PER_KEY = 10          # hand-rolled filter sizing
K_PROBES = 2


def _positions(col, m_bits: int):
    """K_PROBES deterministic bit positions for a fingerprint."""
    return [
        (F.abs(F.xxhash64(col, F.lit(i))) % m_bits).alias(f"pos{i}")
        for i in range(K_PROBES)
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--copies", type=int, default=1)
    args = ap.parse_args()

    spark = get_spark("bloom-ab")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text")
    prior_src = docs
    if args.copies > 1:
        # copies are SALTED (fresh content): the interesting Bloom regime
        # is a mostly-fresh stream, where the prefilter can drop the
        # definitely-unknown majority before the shuffle.  copy 0 keeps
        # the original text so the prior's exact-known docs still exist.
        n0 = docs.count()
        docs = docs.crossJoin(
            spark.range(args.copies).select(F.col("id").alias("_c"))
        ).select(
            (F.col("doc_id") + F.col("_c") * (n0 * 10)).alias("doc_id"),
            F.when(F.col("_c") == 0, F.col("text"))
            .otherwise(F.concat_ws(" #", "text", F.col("_c").cast("string")))
            .alias("text"))

    fp_all = docs.select("doc_id", F.md5(normalized("text"))
                         .alias("fingerprint"))
    prior_fp = (prior_src.where(F.col("doc_id") % 3 == 0)
                .select(F.md5(normalized("text")).alias("fingerprint"))
                .distinct())
    prior_path = "/tmp/bloom_ab_prior"
    fp_path = "/tmp/bloom_ab_new"
    prior_fp.write.mode("overwrite").parquet(prior_path)
    fp_all.write.mode("overwrite").parquet(fp_path)
    n_prior = spark.read.parquet(prior_path).count()
    n_new = spark.read.parquet(fp_path).count()
    m_bits = max(64, n_prior * M_BITS_PER_KEY)

    def semi(prior, new):
        return new.join(prior, "fingerprint", "left_semi")

    def handrolled(prior, new):
        # build: fingerprint -> K bit positions -> 64-bit word slots,
        # bit_or-folded per word (ONE groupBy over m/64 <= n_prior*10/64
        # slots — filter-sized, broadcastable by construction)
        pos = prior.select(F.explode(F.array(
            *_positions(F.col("fingerprint"), m_bits))).alias("p"))
        words = (pos.select(
                    F.expr("p div 64").alias("w"),
                    F.expr("shiftleft(1L, cast(p % 64 AS INT))").alias("b"))
                 .groupBy("w").agg(F.bit_or("b").alias("bits")))
        # probe: every probe position must hit a set bit
        probed = new
        for i in range(K_PROBES):
            p = F.abs(F.xxhash64(F.col("fingerprint"), F.lit(i))) % m_bits
            probed = (
                probed.withColumn(f"_p{i}", p)
                .withColumn(f"_w{i}", F.expr(f"_p{i} div 64"))
                .withColumn(f"_b{i}", F.expr(
                    f"shiftleft(1L, cast(_p{i} % 64 AS INT))"))
                .join(F.broadcast(words.withColumnRenamed("w", f"_w{i}")
                                  .withColumnRenamed("bits", f"_s{i}")),
                      f"_w{i}", "left")
                .where(F.col(f"_s{i}").isNotNull()
                       & (F.col(f"_s{i}").bitwiseAND(F.col(f"_b{i}")) != 0))
                .drop(f"_p{i}", f"_w{i}", f"_b{i}", f"_s{i}")
            )
        return semi(prior, probed)

    def run(fn, no_broadcast: bool, rbf: bool):
        best = float("inf")
        out = None
        for _ in range(args.reps):
            spark.catalog.clearCache()
            try:
                if no_broadcast:
                    spark.conf.set(
                        "spark.sql.autoBroadcastJoinThreshold", "-1")
                spark.conf.set(
                    "spark.sql.optimizer.runtime.bloomFilter.enabled",
                    str(rbf).lower())
                prior = spark.read.parquet(prior_path)
                new = spark.read.parquet(fp_path)
                t0 = time.perf_counter()
                out = fn(prior, new).count()
                best = min(best, time.perf_counter() - t0)
            finally:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
                spark.conf.unset(
                    "spark.sql.optimizer.runtime.bloomFilter.enabled")
        return round(best, 3), out

    t_a, c_a = run(semi, no_broadcast=False, rbf=False)
    t_b, c_b = run(semi, no_broadcast=True, rbf=False)
    t_c, c_c = run(semi, no_broadcast=True, rbf=True)
    t_d, c_d = run(handrolled, no_broadcast=True, rbf=False)
    assert c_a == c_b == c_c == c_d, (c_a, c_b, c_c, c_d)

    print(json.dumps({
        "n_new": n_new, "n_prior": n_prior, "exact_known": c_a,
        "m_bits": m_bits, "k_probes": K_PROBES,
        "A_semi_broadcast_s": t_a,
        "B_semi_shuffle_s": t_b,
        "C_semi_shuffle_runtime_bloom_s": t_c,
        "D_handrolled_bloom_shuffle_s": t_d,
        "engine_bloom_speedup_vs_B": round(t_b / t_c, 2),
        "handrolled_speedup_vs_B": round(t_b / t_d, 2),
    }))


if __name__ == "__main__":
    main()
