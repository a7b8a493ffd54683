"""Streaming soak of the round-8 incremental-ingest tie
(streaming/corpus.py:start_incremental_ingest): a rate-source document
stream where a configurable fraction repeats earlier content, admitted
against a prior snapshot's profile.  Records sustained rows/s, batch
cadence, and the accepted/known split — the evidence that the
sink-bounded known-set posture holds up under continuous load.

    python experiments/incremental_soak.py [--rate 2000] [--seconds 60]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.functions.dedup import (  # noqa: E402
    snapshot_profile)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402
from simpy__kafka__flink__kafka_spark.streaming.corpus import (  # noqa: E402
    start_incremental_ingest)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=int, default=2000)
    ap.add_argument("--seconds", type=int, default=60)
    args = ap.parse_args()

    spark = get_spark("incremental-soak")
    tmp = tempfile.mkdtemp(prefix="inc_soak_")

    # prior snapshot: 2,000 docs of deterministic text keyed on an
    # integer column (cast to long FIRST — a double key would stringify
    # as "500.0" and silently miss the prior's "500")
    def synth_text(col):
        key = col.cast("long").cast("string")
        return F.concat_ws(
            " ", *[F.md5(F.concat(F.lit(f"w{k}:"), key))
                   for k in range(12)])

    prior_docs = spark.range(2000).select(
        F.col("id").alias("doc_id"), synth_text(F.col("id")).alias("text"))
    prior_dir = f"{tmp}/prior"
    snapshot_profile(prior_docs).write.parquet(prior_dir)

    # stream: value % 4 == 0 -> exact copy of a prior doc (known via
    # the prior profile); else content keyed on value % 8000 + 10M
    # (6,000 distinct fresh keys; each repeats every 8,000 rows, so
    # later arrivals are known via the SINK profile — the growing
    # known-set path under continuous load)
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", args.rate).load()
        .select(
            F.col("value").alias("doc_id"),
            F.when(F.col("value") % 4 == 0,
                   synth_text((F.col("value") / 4) % 2000))
            .otherwise(synth_text(F.col("value") % 8000 + 10_000_000))
            .alias("text"),
        )
    )
    q = start_incremental_ingest(
        stream, prior_dir, f"{tmp}/accepted", f"{tmp}/ckpt")
    t0 = time.time()
    time.sleep(args.seconds)
    rates, durs = [], []
    for p in q.recentProgress:
        if p["numInputRows"] > 0:
            rates.append(p["processedRowsPerSecond"])
            durs.append(p["batchDuration"])
    q.stop()
    accepted = spark.read.parquet(f"{tmp}/accepted/docs")
    n_acc = accepted.count()
    n_prof = spark.read.parquet(f"{tmp}/accepted/profile").count()
    print(json.dumps({
        "experiment": "incremental_ingest_soak",
        "offered_rows_per_sec": args.rate,
        "soak_seconds": args.seconds,
        "batches": len(rates),
        "sustained_rows_per_sec": round(sorted(rates)[len(rates) // 2], 0)
        if rates else 0,
        "median_batch_ms": sorted(durs)[len(durs) // 2] if durs else None,
        "accepted_docs": n_acc,
        "accepted_profile_rows": n_prof,
        "profile_consistent": n_acc == n_prof,
    }))


if __name__ == "__main__":
    main()
