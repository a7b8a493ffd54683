"""Capstone scan-sharing A/B (round-7 verdict task #8 / builder note #2):
when corpus_prep_full AND web_prep_full run in one session, is sharing
one cached ingest scan of documents a win over letting each capstone
scan parquet itself?

A (status quo): cold run of both capstones back-to-back, each scanning
documents.parquet independently (bench.py semantics — clearCache before
each pair).
B (shared scan): cache + materialize the documents frame once, patch the
plan builders' ingest hook (_docs) to reuse it, run both capstones; the
cache-population cost is charged to the measurement.

Interleaved reps, min/median reported.

    python experiments/capstone_share_ab.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpy__kafka__flink__kafka_spark.plans import dataprep, registry  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

NAMES = ["corpus_prep_full", "web_prep_full"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("capstone-share-ab")
    reg = registry()
    orig_docs = dataprep._docs

    def run_pair() -> float:
        t0 = time.perf_counter()
        for n in NAMES:
            reg[n].build(spark, args.sf).write.format("noop") \
                .mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    a_times: list[float] = []
    b_times: list[float] = []
    for _ in range(args.reps):
        # A: independent scans
        spark.catalog.clearCache()
        dataprep._docs = orig_docs
        a_times.append(run_pair())

        # B: shared cached ingest scan (population charged)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        shared = orig_docs(spark, args.sf).cache()
        shared.count()
        dataprep._docs = lambda _s, _d: shared
        run_pair()
        b_times.append(round(time.perf_counter() - t0, 2))
        shared.unpersist()
    dataprep._docs = orig_docs

    print(json.dumps({
        "experiment": "capstone_share_ab", "sf": args.sf,
        "a_independent_scans": a_times,
        "b_shared_cached_scan": b_times,
        "min": {"a": min(a_times), "b": min(b_times)},
        "median": {"a": sorted(a_times)[len(a_times) // 2],
                   "b": sorted(b_times)[len(b_times) // 2]},
    }))


if __name__ == "__main__":
    main()
