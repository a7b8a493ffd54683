"""Fixed-round vs fixpoint connected-components A/B on the N-copy corpus
(VERDICT r03 task #8): same verified near-dup pair graph in, both cluster
forms + the downstream survivors anti-join timed head-to-head.

    python experiments/cc_ab.py [--copies 20] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpy__kafka__flink__kafka_spark.functions import dedup  # noqa: E402
from simpy__kafka__flink__kafka_spark.functions.text import shingles  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

from experiments.scale_run import materialize, shifted_docs  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("cc-ab")
    docs = shifted_docs(spark, args.sf, args.copies).cache()
    n_docs = docs.count()

    # build the pair graph ONCE, checkpointed, so the A/B times only the
    # clustering + anti-join stage both variants share everything upstream of
    sh = shingles(docs).cache()
    pairs = dedup.verify_jaccard(
        docs, dedup.minhash_lsh_pairs(docs, shingle_df=sh),
        threshold=0.5, shingle_df=sh,
    ).select("doc_a", "doc_b").localCheckpoint()
    n_pairs = pairs.count()
    sh.unpersist()

    res = {"experiment": "cc_ab", "copies": args.copies,
           "docs": n_docs, "pairs": n_pairs}
    # fixed-round: lazy plan, noop-materialized like the bench
    res["survivors_fixed_sec"] = round(min(
        materialize(dedup.dedup_survivors(docs, pairs, fixpoint=False))
        for _ in range(2)), 2)
    # fixpoint: eager rounds inside (count+checksum per round), so wall-clock
    # the whole call
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        materialize(dedup.dedup_survivors(docs, pairs, fixpoint=True))
        best = min(best, time.perf_counter() - t0)
    res["survivors_fixpoint_sec"] = round(best, 2)
    res["survivors_fixed"] = dedup.dedup_survivors(
        docs, pairs, fixpoint=False).count()
    res["survivors_fixpoint"] = dedup.dedup_survivors(
        docs, pairs, fixpoint=True).count()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
