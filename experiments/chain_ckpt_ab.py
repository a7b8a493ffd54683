"""Interleaved A/B: chain_stats with vs without the lazy frontier
checkpoint, at scale (default 20 copies = ~2M spans) — one session,
alternating variants, best-of-N, per the PLANS.md noise protocol.

    python experiments/chain_ckpt_ab.py [--copies 20] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpy__kafka__flink__kafka_spark.operators.chains import chain_stats  # noqa: E402
from simpy__kafka__flink__kafka_spark.operators.linking import (  # noqa: E402
    link_edges_banded)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

from experiments.scale_run import materialize, shifted_spans  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=20)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("chain-ckpt-ab")
    spans = shifted_spans(spark, args.sf, args.copies).cache()
    n_spans = spans.count()
    edges = link_edges_banded(spans).cache()
    n_edges = edges.count()

    best = {"ckpt4": float("inf"), "no_ckpt": float("inf")}
    for _ in range(args.reps):
        best["ckpt4"] = min(
            best["ckpt4"],
            materialize(chain_stats(spans, edges, checkpoint_every=4)),
        )
        best["no_ckpt"] = min(
            best["no_ckpt"],
            materialize(chain_stats(spans, edges, checkpoint_every=None)),
        )

    print(json.dumps({
        "experiment": "chain_stats_checkpoint_ab",
        "copies": args.copies, "spans": n_spans, "edges": n_edges,
        "ckpt4_sec": round(best["ckpt4"], 2),
        "no_ckpt_sec": round(best["no_ckpt"], 2),
        "ratio": round(best["no_ckpt"] / best["ckpt4"], 2),
    }))


if __name__ == "__main__":
    main()
