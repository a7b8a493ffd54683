"""Interleaved A/B: global-window running sum vs ranged_prefix_sum on a
20M-row shuffled key column — one session, alternating variants, best-of-N,
per the PLANS.md noise protocol (companion to the round-2 row_number
measurement).

    python experiments/prefix_sum_ab.py [--rows 20000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.operators.sequences import (  # noqa: E402
    ranged_prefix_sum)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def materialize(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("prefix-sum-ab")
    # shuffled key (xxhash64 of id) so the range repartition does real work
    base = (
        spark.range(args.rows)
        .select(
            F.xxhash64("id").alias("k"),
            (F.col("id") % 997).cast("long").alias("v"),
        )
        .cache()
    )
    base.count()

    wg = W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
    best = {"global_window": float("inf"), "ranged_32": float("inf")}
    for _ in range(args.reps):
        best["global_window"] = min(
            best["global_window"],
            materialize(base.select("k", F.sum("v").over(wg).alias("s"))),
        )
        best["ranged_32"] = min(
            best["ranged_32"],
            materialize(
                ranged_prefix_sum(base, ["k"], "v", out_col="s", n_parts=32)
            ),
        )
        spark.catalog.clearCache()
        base.cache().count()

    print(json.dumps({
        "experiment": "prefix_sum_global_vs_ranged",
        "rows": args.rows,
        "global_window_sec": round(best["global_window"], 2),
        "ranged_32_sec": round(best["ranged_32"], 2),
        "ratio": round(best["global_window"] / best["ranged_32"], 2),
    }))


if __name__ == "__main__":
    main()
