"""SemDeDup blocking A/B (round-12 wave 10).

semantic_dedup enumerates near-neighbor pairs inside IVF cells (an
equi-join on cell_id) instead of all-pairs.  This records both shapes
in the bench-identical cold configuration:

  - "ivf_cells" (shipped): broadcast-centroid assign -> in-cell
    self-join -> EXISTS(earlier near neighbor).  Pair work is bounded
    by cell size; the 100 TB form.
  - "all_pairs": the same keep rule over the unblocked self-join
    (vec_a < vec_b cosine on every pair) — the correctness twin whose
    cost is O(N^2) regardless of selectivity.

Also reports the semantic agreement: the blocked form can only MISS
dups whose nearest earlier neighbor sits in another cell, so
kept(ivf) >= kept(all_pairs) row-wise; the count of disagreeing rows
is the measured blocking miss rate (expected small — near-identical
vectors almost always share a cell).

    python experiments/semdedup_ab.py [--sf /root/testdata/sf0.01] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.similarity import (
        _assigned_cells, dot, semantic_dedup)
    from simpy__kafka__flink__kafka_spark.session import get_spark

    from simpy__kafka__flink__kafka_spark.functions.similarity import (
        near_dup_twin_augment)

    spark = get_spark()
    # the gate row's twin augmentation, via the ONE shared rendering:
    # the raw synthetic embeddings are near-orthogonal, so without
    # twins both shapes would measure an empty duplicate set
    emb = near_dup_twin_augment(
        spark.read.parquet(f"{args.sf}/embeddings.parquet"))

    def all_pairs_kept():
        from simpy__kafka__flink__kafka_spark.functions.similarity import N_CENTROIDS
        cells = _assigned_cells(emb, N_CENTROIDS)
        a = cells.select(F.col("vec_id").alias("vec_a"),
                         F.col("cell_sim").alias("sim_a"),
                         F.col("embedding").alias("emb_a"),
                         F.col("n2").alias("n2_a"))
        b = cells.select(F.col("vec_id").alias("vec_b"),
                         F.col("cell_sim").alias("sim_b"),
                         F.col("embedding").alias("emb_b"),
                         F.col("n2").alias("n2_b"))
        cos = F.round(dot(F.col("emb_a"), F.col("emb_b"))
                      / (F.sqrt(F.col("n2_a")) * F.sqrt(F.col("n2_b"))), 6)
        earlier = (F.col("sim_a") < F.col("sim_b")) | (
            (F.col("sim_a") == F.col("sim_b"))
            & (F.col("vec_a") < F.col("vec_b")))
        dups = (a.crossJoin(b).where(earlier).where(cos >= 0.92)
                .select(F.col("vec_b").alias("vec_id")).distinct()
                .withColumn("_dup", F.lit(1)))
        return (cells.join(dups, "vec_id", "left")
                .select("vec_id",
                        F.when(F.col("_dup").isNull(), 1).otherwise(0)
                        .alias("kept")))

    out = {}
    for name, build in (("ivf_cells", lambda: semantic_dedup(emb)
                         .select("vec_id", "kept")),
                        ("all_pairs", all_pairs_kept)):
        best = float("inf")
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            build().foreach(lambda r: None)
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)

    ivf = {r["vec_id"]: r["kept"]
           for r in semantic_dedup(emb).select("vec_id", "kept").collect()}
    ap_ = {r["vec_id"]: r["kept"] for r in all_pairs_kept().collect()}
    misses = sum(1 for k in ap_ if ivf[k] != ap_[k])
    out["n_vectors"] = len(ap_)
    out["blocking_disagreements"] = misses
    out["dropped_ivf"] = sum(1 for v in ivf.values() if v == 0)
    out["dropped_all_pairs"] = sum(1 for v in ap_.values() if v == 0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
