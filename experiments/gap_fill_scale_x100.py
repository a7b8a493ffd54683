"""gap_fill_hourly x100 scale checkpoint (round 15 — VERDICT r14
task 4).

The only top-10 headline row without an x100 point.  Blow-up
direction: SHIFTED SERIES (user_id + i*stride per replica, timestamps
untouched) — 100x the series count at identical per-series range and
density, which is how a real event corpus grows (more users, not
longer history per user).  The per-series grid explode is therefore
constant per key and total work should scale ~linearly; the decision
rule is the ladder's standard copies^1.25 bound (= 316).  If it blew
past that, the registry row would gain a per-gap fill cap the oracle
replays — measured first.

    python experiments/gap_fill_scale_x100.py
        [--sf /root/testdata/sf0.1] [--copies 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.operators.timeseries import (  # noqa: E402
    gap_fill)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402
from simpy__kafka__flink__kafka_spark.sources.tables import (  # noqa: E402
    read_events)

from experiments.scale_run import materialize  # noqa: E402

STRIDE = 1 << 40


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("gapfill-x100")
    ev = read_events(spark, args.sf).select("user_id", "ts_ms", "value")
    tmp = tempfile.mkdtemp(prefix="gapfill_x100_")
    out: dict = {"experiment": "gap_fill_scale_x100",
                 "copies": args.copies}
    for copies in (1, args.copies):
        path = os.path.join(tmp, f"x{copies}")
        rep = F.explode(
            F.sequence(F.lit(0), F.lit(copies - 1))).alias("_rep")
        (ev.select("*", rep)
         .withColumn("user_id",
                     F.col("user_id")
                     + F.col("_rep").cast("long") * STRIDE)
         .drop("_rep")
         .write.mode("overwrite").parquet(path))
        df = spark.read.parquet(path)
        # warm the page cache so the x-point measures plan growth, not
        # the first disk touch of a freshly-written blow-up (the bench
        # ladder lesson)
        df.write.format("noop").mode("overwrite").save()
        # row count FIRST (one untimed pass — re-running the 104.8M-row
        # plan after the timed reps doubled the experiment's wall,
        # review find r15), then the timed reps
        out[f"x{copies}_rows"] = gap_fill(df, grid_ms=3_600_000).count()
        best = float("inf")
        for _ in range(args.reps):
            best = min(best,
                       materialize(gap_fill(df, grid_ms=3_600_000)))
        out[f"x{copies}"] = round(best, 2)
    out["growth"] = round(out[f"x{args.copies}"] / out["x1"], 2)
    out["bound"] = round(args.copies ** 1.25, 0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
