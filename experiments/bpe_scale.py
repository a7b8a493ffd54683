"""Scale characterization of BPE training: per-round cost is vocab-bound,
not corpus-bound.  An id-shifted N-copy corpus multiplies corpus size by
N while leaving the DISTINCT-word table identical (only frequencies
scale), so after the single corpus-scale word-count shuffle every merge
round should cost the same — and produce the same merges with N-scaled
pair counts.

    python experiments/bpe_scale.py [--copies 10] [--merges 8]
                                    [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.functions.bpe import (  # noqa: E402
    bpe_train, word_frequencies)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--merges", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("bpe-scale")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text")
    stride = 10_000_000
    res = {"experiment": "bpe_scale", "sf": args.sf, "merges": args.merges}
    merges_by_copies = {}
    for copies in (1, args.copies):
        big = docs
        for i in range(1, copies):
            big = big.unionByName(
                docs.select((F.col("doc_id") + i * stride).alias("doc_id"),
                            "text"))
        big = big.cache()
        big.count()
        vocab = word_frequencies(big).count()
        t0 = time.perf_counter()
        merges = bpe_train(big, n_merges=args.merges)
        sec = round(time.perf_counter() - t0, 2)
        merges_by_copies[copies] = merges
        res[f"x{copies}"] = {"vocab": vocab, "sec": sec,
                             "sec_per_round": round(sec / max(1, len(merges)),
                                                    2)}
        big.unpersist()
    m1 = [(l, r) for l, r, _ in merges_by_copies[1]]
    mN = [(l, r) for l, r, _ in merges_by_copies[args.copies]]
    res["same_merges"] = m1 == mN
    res["counts_scale"] = all(
        cN == c1 * args.copies
        for (_, _, c1), (_, _, cN) in zip(merges_by_copies[1],
                                          merges_by_copies[args.copies])
    )
    assert res["same_merges"], "merge sequence changed with duplication"
    assert res["counts_scale"], "pair counts did not scale linearly"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
