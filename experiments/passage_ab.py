"""A/B of the passage-span family at N-fold duplication: the profile
(passage_dup_summary) vs the span-removal transformation (passage_rewrite)
on an id-shifted N-copy corpus — every copied doc shares all its full-width
blocks with its twins, the worst case for cross-doc passage dedup.

    python experiments/passage_ab.py [--copies 20] [--sf /root/testdata/sf0.1]

Also asserts the removal invariant at N copies: for every duplicated block
hash exactly one occurrence survives corpus-wide, so the kept full-block
count equals the number of DISTINCT full-block hashes (plus every partial
tail block, which never participates).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.functions.text import (  # noqa: E402
    doc_blocks, passage_dup_summary, passage_rewrite)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

from experiments.scale_run import materialize  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("passage-ab")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text")
    stride = 10_000_000
    res = {"experiment": "passage_ab", "sf": args.sf}
    for copies in (1, args.copies):
        big = docs
        for i in range(1, copies):
            big = big.unionByName(
                docs.select((F.col("doc_id") + i * stride).alias("doc_id"),
                            "text"))
        big = big.cache()
        n_docs = big.count()
        t_sum = round(min(materialize(passage_dup_summary(big, w=8))
                          for _ in range(2)), 2)
        t_rw = round(min(materialize(passage_rewrite(big, w=8))
                         for _ in range(2)), 2)
        res[f"x{copies}"] = {"docs": n_docs, "summary_sec": t_sum,
                             "rewrite_sec": t_rw}
        if copies > 1:
            # removal invariant: kept full blocks == distinct full hashes
            blocks = doc_blocks(big, w=8)
            n_full = blocks.where("block_len = 8").count()
            n_distinct = (blocks.where("block_len = 8")
                          .select("block_hash").distinct().count())
            n_partial = blocks.where("block_len != 8").count()
            agg = passage_rewrite(big, w=8).agg(
                F.sum("n_blocks").alias("nb"),
                F.sum("n_removed").alias("nr")).collect()[0]
            kept_full = n_full - agg["nr"]
            res[f"x{copies}"].update({
                "full_blocks": n_full,
                "distinct_full_hashes": n_distinct,
                "removed": agg["nr"],
                "kept_full_equals_distinct": bool(kept_full == n_distinct),
                "total_blocks_match": bool(agg["nb"] == n_full + n_partial),
            })
        big.unpersist()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
