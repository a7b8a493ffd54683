"""dsir_weights x100 scale checkpoint (round 14).

The round-14 bench ladder shows dsir_weights with x10 growth 6.39 —
the highest growth of any row without a measured x100 point.  This
pins it on the shifted-copies corpus (worst-case 100% duplication; the
hashed-ngram importance weights grow with membership like
soft_dedup's).  The decision rule: growth at x100 must stay under
copies^1.25 (= 316); anything past that flips the registry row's
documented scale guidance to the fixed-reference-sample posture the
DSIR paper itself uses.

    python experiments/dsir_scale_x100.py [--sf /root/testdata/sf0.1]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=100)
    args = ap.parse_args()

    spark = get_spark("dsir-x100")
    reg = registry()
    tmp = tempfile.mkdtemp(prefix="dsir_x100_")
    out: dict = {"experiment": "dsir_scale_x100",
                 "copies": args.copies}
    for copies in (1, args.copies):
        sf_like = os.path.join(tmp, f"x{copies}")
        (shifted_docs(spark, args.sf, copies)
         .write.mode("overwrite")
         .parquet(os.path.join(sf_like, "documents.parquet")))
        out[f"x{copies}"] = round(
            materialize(reg["dsir_weights"].build(spark, sf_like)), 2)
        spark.catalog.clearCache()
        from simpy__kafka__flink__kafka_spark import cachepin
        cachepin.unpin_all()
    out["growth"] = round(out[f"x{args.copies}"] / out["x1"], 2)
    out["bound"] = round(args.copies ** 1.25, 0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
