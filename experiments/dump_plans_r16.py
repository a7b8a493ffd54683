"""Dump .explain('formatted') for named registry queries to plans/r16/.

    python experiments/dump_plans_r16.py <suffix> q1 q2 ...

suffix is 'before' or 'after'."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpy__kafka__flink__kafka_spark.plans import registry  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump-plans")
    reg = registry()
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = reg[name].build(spark, SF)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")
        txt = df._jdf.queryExecution().explainString(mode)
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(name, "->", f"{name}_{suffix}.txt", len(txt), "bytes")
        spark.catalog.clearCache()
        from simpy__kafka__flink__kafka_spark.cachepin import unpin_all
        unpin_all()


if __name__ == "__main__":
    main()
