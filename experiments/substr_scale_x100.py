"""exact_substring x100 scale checkpoint (round 13 — the ccnet_scale
treatment for the OTHER standing ladder leader).

exact_substring_profile_rewrite has topped the measured x10 ladder
since round 8 (growth 5.9-6.1x — documented as gram-volume growth,
sublinear per gram).  This pins the x100 point: if per-gram cost is
truly flat, x100 growth should land well under 100 (amortization +
linear gram volume), far below the copies^1.25 super-linearity bound.

    python experiments/substr_scale_x100.py [--sf /root/testdata/sf0.1]
        [--copies 100]

Prints one JSON line with x1/x10/xN wall times and growth factors.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpy__kafka__flink__kafka_spark.functions.text import (  # noqa: E402
    exact_substring_profile_and_rewrite)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

from experiments.scale_run import materialize, shifted_docs  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=100)
    args = ap.parse_args()

    spark = get_spark("substr-scale-x100")
    out: dict = {"experiment": "exact_substring_x100",
                 "copies": args.copies}
    for copies in (1, 10, args.copies):
        docs = shifted_docs(spark, args.sf, copies).cache()
        n = docs.count()
        t = materialize(exact_substring_profile_and_rewrite(
            docs, min_len=30))
        docs.unpersist()
        spark.catalog.clearCache()
        out[f"x{copies}"] = {"docs": n, "sec": round(t, 2)}
    g = out[f"x{args.copies}"]["sec"] / max(out["x1"]["sec"], 0.05)
    out["growth"] = round(g, 2)
    out["bound_1_25"] = round(args.copies ** 1.25, 1)
    out["under_bound"] = g < args.copies ** 1.25
    print(json.dumps(out))


if __name__ == "__main__":
    main()
