"""Capstone / dedup x100 scale checkpoints (round 13 — completing the
ladder-leader trilogy after ccnet_scale and substr_scale_x100).

Lays the shifted-copies corpus out as sf_dir-shaped parquet (the
scale_run growth-checkpoint approach) and times the registry builders
for soft_dedup_weights, dedup_survivors, and corpus_prep_full at x1
and x100.  The shifted corpus is the worst-case duplication regime:
every doc has 100 exact copies, so the dedup rows' OUTPUT (cluster
membership, weights) grows 100x and their candidate sets grow
quadratically PER CLUSTER (bounded by the 100-copy cluster size —
the documented output-shaped term, never corpus-quadratic).

    python experiments/capstone_x100.py [--sf /root/testdata/sf0.1]
        [--copies 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpy__kafka__flink__kafka_spark.plans import registry  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

from experiments.scale_run import materialize, shifted_docs  # noqa: E402

QUERIES = ("soft_dedup_weights", "dedup_survivors", "corpus_prep_full")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=100)
    args = ap.parse_args()

    spark = get_spark("capstone-x100")
    reg = registry()
    tmp = tempfile.mkdtemp(prefix="capstone_x100_")
    out: dict = {"experiment": "capstone_x100", "copies": args.copies}
    for copies in (1, args.copies):
        sf_like = os.path.join(tmp, f"x{copies}")
        (shifted_docs(spark, args.sf, copies)
         .write.mode("overwrite")
         .parquet(os.path.join(sf_like, "documents.parquet")))
        point = {}
        for name in QUERIES:
            point[name] = round(
                materialize(reg[name].build(spark, sf_like)), 2)
            spark.catalog.clearCache()
            from simpy__kafka__flink__kafka_spark import cachepin
            cachepin.unpin_all()
        out[f"x{copies}"] = point
    out["growth"] = {
        name: round(out[f"x{args.copies}"][name]
                    / max(out["x1"][name], 0.05), 2)
        for name in QUERIES}
    out["bound_1_25"] = round(args.copies ** 1.25, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
