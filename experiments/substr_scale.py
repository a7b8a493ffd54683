"""Scale characterization of exact_substring_spans at N-fold duplication:
an id-shifted N-copy corpus makes EVERY >= L-char gram cross-doc
duplicated — the worst case for the island-merge stage (every position of
every doc becomes a hit row) while the gram aggregation keeps one row per
distinct gram regardless of N.

    python experiments/substr_scale.py [--copies 10] [--sf /root/testdata/sf0.1]

Also asserts the saturation invariant at N copies: every doc's dup_chars
equals its full normalized length (the whole doc is one maximal span), so
sum(dup_chars) == sum(doc_len) over docs with doc_len >= L.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.functions.text import (  # noqa: E402
    exact_substring_spans)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

from experiments.scale_run import materialize  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--min-len", type=int, default=30)
    args = ap.parse_args()

    spark = get_spark("substr-scale")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text")
    stride = 10_000_000
    res = {"experiment": "substr_scale", "sf": args.sf,
           "min_len": args.min_len}
    for copies in (1, args.copies):
        big = docs
        for i in range(1, copies):
            big = big.unionByName(
                docs.select((F.col("doc_id") + i * stride).alias("doc_id"),
                            "text"))
        big = big.cache()
        n_docs = big.count()
        t = round(min(materialize(exact_substring_spans(big,
                                                        min_len=args.min_len))
                      for _ in range(2)), 2)
        res[f"x{copies}"] = {"docs": n_docs, "sec": t}
        if copies > 1:
            out = exact_substring_spans(big, min_len=args.min_len)
            sat = out.where(F.col("doc_len") >= args.min_len).agg(
                F.sum("dup_chars").alias("dup"),
                F.sum("doc_len").alias("len"),
                F.sum(F.when(F.col("dup_chars") != F.col("doc_len"), 1)
                      .otherwise(0)).alias("bad"),
            ).collect()[0]
            res[f"x{copies}"]["saturated"] = bool(sat["bad"] == 0)
            assert sat["bad"] == 0, (
                f"{sat['bad']} duplicated docs not fully covered by spans")
        big.unpersist()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
