"""End-of-round smoke drive (VERDICT r03 task #3).

Builds every CHECKED_FIRST plan against the live environment (analysis
only — Catalyst resolves each plan, surfacing AnalysisExceptions like the
round-3 TIMESTAMP_NTZ regression in seconds without executing anything),
then executes ``entry(spark)`` on sf0.001 as a single real run.

Run before every handoff:  python smoke_drive.py
"""

from __future__ import annotations

import sys
import time

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    import __spark_entry__ as entrymod
    from simpy__kafka__flink__kafka_spark.plans import CHECKED_FIRST

    from simpy__kafka__flink__kafka_spark.session import get_spark

    spark = get_spark("smoke_drive", shuffle_partitions=8)

    queries = entrymod.queries()
    failures: list[tuple[str, str]] = []
    t0 = time.time()
    for name in CHECKED_FIRST:
        try:
            df = queries[name](spark, SF_DIR)
            df.schema  # forces full analysis/resolution without executing
        except Exception as exc:  # noqa: BLE001 — report every breakage
            failures.append((name, f"{type(exc).__name__}: {exc}"))
    print(f"analyzed {len(CHECKED_FIRST)} plans in {time.time() - t0:.1f}s")

    if failures:
        for name, err in failures:
            print(f"FAIL {name}: {err.splitlines()[0]}")
        return 1

    t0 = time.time()
    n = entrymod.entry(spark).count()
    print(f"entry(spark) -> {n} rows in {time.time() - t0:.1f}s")
    print("SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
