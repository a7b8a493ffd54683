"""Scale run for the round-3 corpus operators (repetition, contamination,
vocab/OOV, temperature mix) on an id-shifted N-copy corpus.

    python experiments/textprep_scale.py [--copies 20] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.functions.sampling import (  # noqa: E402
    temperature_sample)
from simpy__kafka__flink__kafka_spark.functions.text import (  # noqa: E402
    contaminated_docs, repetition_stats, vocab_coverage)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

from experiments.scale_run import materialize  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("textprep-scale")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    stride = 10_000_000
    parts = [
        docs.select((F.col("doc_id") + i * stride).alias("doc_id"),
                    "text", "lang")
        for i in range(args.copies)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.cache()

    res = {"experiment": "textprep_scale", "copies": args.copies,
           "docs": big.count()}
    for name, build in [
        ("repetition_ratio", lambda: repetition_stats(big, n=3)),
        ("contamination_check", lambda: contaminated_docs(big, n=8,
                                                          bench_mod=10)),
        ("vocab_coverage", lambda: vocab_coverage(big, min_df_pct=60)),
        ("temperature_sample", lambda: temperature_sample(big,
                                                          strat_col="lang")),
    ]:
        res[f"{name}_sec"] = round(min(materialize(build())
                                       for _ in range(2)), 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
