"""Reconcile BENCH_r07's minhash_lsh_pairs 2.08 -> 2.58 s (+24%) — the
one shared query outside the recorded +/-15% co-tenant band, on untouched
code, while its superset composite near_dup_verified IMPROVED.  Method is
the round-7 reconciliation discipline (experiments/bench_reconcile.py):
one session, INTERLEAVED cold reps of the suspect and its composite
control in the exact bench.py configuration (noop sink, clearCache
between executions).  Read: rep-1-high-then-stable = JIT warm-up;
uniformly-high = co-tenant load; stable-at-r07-level = a real regression.

    python experiments/minhash_reconcile_r8.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpy__kafka__flink__kafka_spark.plans import registry  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("minhash-reconcile")
    reg = registry()
    names = ["minhash_lsh_pairs", "near_dup_verified"]
    times: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for n in names:
            spark.catalog.clearCache()
            df = reg[n].build(spark, args.sf)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[n].append(round(time.perf_counter() - t0, 2))
    out = {
        "experiment": "minhash_reconcile_r8", "sf": args.sf,
        "reps": times,
        "min": {n: min(v) for n, v in times.items()},
        "median": {n: sorted(v)[len(v) // 2] for n, v in times.items()},
        "r07_bench": {"minhash_lsh_pairs": 2.58, "near_dup_verified": 3.11},
        "r06_bench": {"minhash_lsh_pairs": 2.08, "near_dup_verified": 3.49},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
