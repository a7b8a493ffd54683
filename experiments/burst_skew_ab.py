"""Burst-skew characterization of the banded link join (VERDICT r04 #3).

Workload: ``--hot`` spans all on ONE ip with starts inside ONE 20 s window,
so (with band_ms = 60 s) essentially every span lands in one (ip, band)
cell — the flagship's worst case.  In-cell pair enumeration is inherently
quadratic (every pair must be containment-tested; that's the operator's
semantics), so the question is not "can we avoid the work" but "does it
land on one task or many":

  A) banded join, AQE skew-join ON (the session default)
  B) banded join, AQE skew-join OFF
  C) banded join + fragment-replicate salting (``salt=8``)

    python experiments/burst_skew_ab.py [--hot 30000] [--salts 8]

Prints one JSON line; edge counts are asserted identical across variants.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark.operators.linking import (  # noqa: E402
    link_edges_banded)
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402


def burst(spark, n: int):
    """Deterministic hot-cell workload: n spans, one IP, starts uniform in a
    20 s window, latencies 100 ms - 30 s (all intervals mutually overlap
    heavily).  No randomness — xxhash64 of the row id drives both."""
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("b"), F.col("id")).alias("id"),
            F.lit("10.7.7.7").alias("src_ip"),
            F.lit("10.7.7.7").alias("dst_ip"),
            (F.lit(1_000_000_000)
             + F.pmod(F.xxhash64("id"), F.lit(20_000))).alias("start_at_ms"),
            (F.lit(100.0)
             + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(29_900))
             .cast("double")).alias("latency_msec"),
        )
        .withColumn(
            "end_at_ms",
            (F.col("start_at_ms") + F.col("latency_msec")).cast("long"),
        )
    )


def timed(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, default=30_000)
    ap.add_argument("--salts", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark("burst-skew")
    msgs = burst(spark, args.hot).cache()
    msgs.count()

    res = {"experiment": "burst_skew_ab", "hot_spans": args.hot,
           "salts": args.salts}

    # --- regime 1: span side broadcastable (a burst against a small-enough
    # corpus slice).  Catalyst picks BroadcastHashJoin, which parallelizes
    # the quadratic cell over the probe side's partitions — skew never
    # concentrates on one task here.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    res["bhj_sec"], n_a = timed(link_edges_banded(msgs))

    # --- regime 2: the 100 TB shape — span table far too big to broadcast,
    # forced sort-merge join, the hot (ip, band) cell hashes to ONE shuffle
    # partition.  This is where AQE skew split / salting matter.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    res["smj_skew_off_sec"], n_b = timed(link_edges_banded(msgs))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    res["smj_skew_on_sec"], n_c = timed(link_edges_banded(msgs))

    res[f"smj_salt{args.salts}_sec"], n_d = timed(
        link_edges_banded(msgs, salt=args.salts))

    # the adaptive probe end-to-end: cell-count probe + salted join, salt
    # chosen automatically from the pair budget
    from simpy__kafka__flink__kafka_spark.operators.linking import (
        link_edges_banded_adaptive)

    res["smj_adaptive_sec"], n_e = timed(
        link_edges_banded_adaptive(msgs, pair_budget=50_000_000))

    res["edges"] = n_a
    res["counts_match"] = bool(n_a == n_b == n_c == n_d == n_e)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
