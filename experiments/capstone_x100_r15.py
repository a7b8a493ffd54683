"""x100 checkpoints for the two remaining top-10 headline rows without
one (round 15): corpus_datasheet and crawl_admission.

Blow-up: the shifted-copies documents corpus (disjoint doc_id worlds,
per-copy-suffixed text — the dsir/soft_dedup ladder standard).  Both
rows are registry builds, so the blow-up lands as a documents.parquet
twin and the query runs unmodified against it.  Decision rule: growth
at x100 under copies^1.25 (= 316).

Note corpus_datasheet's media/seam rows synthesize per-doc fixtures
from doc_id, so the media half of the row scales with the corpus too —
the datasheet point covers the Arrow codec walks, not just the text
folds.

    python experiments/capstone_x100_r15.py [--sf /root/testdata/sf0.1]
        [--copies 100]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from simpy__kafka__flink__kafka_spark import cachepin  # noqa: E402
from simpy__kafka__flink__kafka_spark.plans import registry  # noqa: E402
from simpy__kafka__flink__kafka_spark.session import get_spark  # noqa: E402

from experiments.scale_run import materialize  # noqa: E402

QUERIES = ("corpus_datasheet", "crawl_admission")


def shifted_docs_full(spark, sf_dir: str, copies: int):
    """Full-SCHEMA shifted-copies documents (scale_run.shifted_docs
    keeps only doc_id/text; the datasheet needs source too): disjoint
    doc_id worlds, per-copy-suffixed text, all other columns carried."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = F.explode(
        F.sequence(F.lit(0), F.lit(copies - 1))).alias("_rep")
    return (docs.select("*", rep)
            .withColumn("doc_id",
                        F.col("doc_id")
                        + F.col("_rep").cast("long") * (1 << 40))
            .withColumn("text", F.concat("text", F.lit(" r"),
                                         F.col("_rep").cast("string")))
            .drop("_rep"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=100)
    args = ap.parse_args()

    spark = get_spark("capstone-x100-r15")
    reg = registry()
    tmp = tempfile.mkdtemp(prefix="capstone_x100_r15_")
    out: dict = {"experiment": "capstone_x100_r15",
                 "copies": args.copies}
    for copies in (1, args.copies):
        sf_like = os.path.join(tmp, f"x{copies}")
        (shifted_docs_full(spark, args.sf, copies)
         .write.mode("overwrite")
         .parquet(os.path.join(sf_like, "documents.parquet")))
        # the datasheet also reads the small pdf-fixture inputs off
        # documents only; both queries touch documents alone
        for name in QUERIES:
            t = materialize(reg[name].build(spark, sf_like))
            out.setdefault(name, {})[f"x{copies}"] = round(t, 2)
            spark.catalog.clearCache()
            cachepin.unpin_all()
    for name in QUERIES:
        d = out[name]
        d["growth"] = round(d[f"x{args.copies}"] / d["x1"], 2)
    out["bound"] = round(args.copies ** 1.25, 0)
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
