"""Count-min sketch (functions/sketches.py): the over-count guarantee
over EVERY item, exactness at generous width, fixed state size, and the
oracled registry row's engine-identical estimates."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpy__kafka__flink__kafka_spark.functions.sketches import (
    CMS_DEPTH, CMS_WIDTH, cms_build, cms_estimate)


def _stream(spark, counts: dict[str, int]):
    rows = [(w,) for w, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "item string").repartition(8)


def test_estimate_never_undercounts_and_is_exact_when_wide(spark):
    import random

    rng = random.Random(5)
    counts = {f"g{i:03d}": rng.randint(1, 40) for i in range(120)}
    stream = _stream(spark, counts)
    sk = cms_build(stream)
    probes = stream.select("item").distinct()
    got = {r["item"]: r["cms_estimate"]
           for r in cms_estimate(sk, probes).collect()}
    assert set(got) == set(counts)
    # CM guarantee: counters only over-count
    assert all(got[w] >= c for w, c in counts.items())
    # 120 items in 4x1024 cells: collisions are rare; the large majority
    # of estimates must be exact and the mean overestimate tiny
    exact = sum(1 for w, c in counts.items() if got[w] == c)
    assert exact >= 110
    n_total = sum(counts.values())
    mean_over = sum(got[w] - c for w, c in counts.items()) / len(counts)
    assert mean_over <= 0.05 * n_total


def test_sketch_state_is_fixed_size(spark):
    counts = {f"w{i}": 3 for i in range(500)}
    sk = cms_build(_stream(spark, counts))
    n_cells = sk.count()
    assert n_cells <= CMS_DEPTH * CMS_WIDTH
    # total mass: every occurrence lands in exactly one cell per row
    mass = sk.groupBy("depth").agg(F.sum("cnt").alias("m")).collect()
    assert {int(r["m"]) for r in mass} == {sum(counts.values())}
    assert len(mass) == CMS_DEPTH


def test_unseen_probe_reads_as_nonnegative(spark):
    sk = cms_build(_stream(spark, {"a": 5, "b": 2}))
    got = {r["item"]: r["cms_estimate"] for r in cms_estimate(
        sk, spark.createDataFrame([("zzz-unseen",)], "item string")
    ).collect()}
    assert got["zzz-unseen"] >= 0  # 0 unless it collides with a/b cells


def test_hll_estimate_accuracy(spark):
    from simpy__kafka__flink__kafka_spark.functions.sketches import (
        hll_estimate, hll_registers)

    for n in (40, 500, 5000):
        items = spark.range(n).select(
            F.concat(F.lit("item-"), F.col("id").cast("string"))
            .alias("item"))
        # duplicate the stream 3x: cardinality estimates ignore multiplicity
        stream = items.union(items).union(items)
        regs = [(r["register"], r["max_rho"])
                for r in hll_registers(stream).collect()]
        est = hll_estimate(regs)
        # 256 registers -> standard error ~6.5%; allow 4 sigma
        assert abs(est - n) / n < 0.26, (n, est)


def test_hll_registers_fixed_size_and_integer(spark):
    from simpy__kafka__flink__kafka_spark.functions.sketches import (
        HLL_B, hll_registers)

    items = spark.range(20000).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("item"))
    rows = hll_registers(items).collect()
    assert len(rows) <= 2 ** HLL_B
    assert all(1 <= r["max_rho"] <= 41 for r in rows)


def test_sketch_builds_partial_aggregate_before_exchange(spark):
    # the fixed-size-state claim depends on map-side partial aggregation:
    # each partition must collapse to <= depth*width (CMS) / <= m (HLL)
    # rows BEFORE the wire
    from simpy__kafka__flink__kafka_spark.functions.sketches import (
        hll_registers)

    items = _stream(spark, {"a": 3, "b": 2})
    for df in (cms_build(items), hll_registers(items)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        pre_exchange = plan.split("Exchange", 1)[1]
        assert "partial" in pre_exchange, plan


def test_sketches_are_streaming_native(spark, tmp_path):
    # fixed-register sketches are the canonical bounded-state streaming
    # aggregate: the SAME hll_registers/cms_build plans run as streaming
    # groupBy aggregations (complete mode), and after all batches the
    # register/cell tables equal the batch tables exactly
    import os
    import uuid

    from simpy__kafka__flink__kafka_spark.functions.sketches import (
        hll_registers)

    rows = [(f"item-{i}",) for i in range(300)]
    ind = str(tmp_path / "sk_in")
    os.makedirs(ind, exist_ok=True)
    for chunk in (rows[:120], rows[120:]):      # two deliveries
        spark.createDataFrame(chunk, "item string").coalesce(1) \
            .write.mode("append").parquet(ind)
    stream = spark.readStream.schema("item string").parquet(ind)
    results = {}
    for label, build in (("hll", hll_registers), ("cms", cms_build)):
        q = (build(stream).writeStream.format("memory")
             .queryName(f"sk_{label}_{uuid.uuid4().hex[:8]}")
             .outputMode("complete").start())
        try:
            q.processAllAvailable()
            results[label] = {tuple(r) for r in
                              spark.sql(f"SELECT * FROM {q.name}").collect()}
        finally:
            q.stop()
    batch = spark.createDataFrame(rows, "item string")
    assert results["hll"] == {tuple(r) for r in
                              hll_registers(batch).collect()}
    assert results["cms"] == {tuple(r) for r in cms_build(batch).collect()}


def test_registry_row_top_grams_estimates(spark, sf_dir):
    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["ngram_cms_counts"]
    assert q.oracle is not None
    rows = q.build(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    assert all(r["cms_estimate"] >= r["exact_count"] for r in rows)


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.sketches import (
        BLOOM_K, BLOOM_M, bloom_build, bloom_probe)

    # load the filter to ~n/m = 1/4 (2048 items, m=8192, k=4) — classic
    # FP rate (1 - e^{-kn/m})^k ~= (1 - e^{-1})^4 ~= 0.16
    items = spark.range(2048).select(
        F.concat(F.lit("present-"), F.col("id").cast("string"))
        .alias("item"))
    bits = bloom_build(items)
    assert bits.count() <= BLOOM_M

    # every inserted item MUST report maybe=1 (no false negatives)
    got = {r["item"]: r["maybe"]
           for r in bloom_probe(bits, items).collect()}
    assert all(v == 1 for v in got.values())

    # absent probes: FP rate near the classic formula, never 0-or-1 wild
    absent = spark.range(2000).select(
        F.concat(F.lit("absent-"), F.col("id").cast("string"))
        .alias("item"))
    fps = sum(r["maybe"]
              for r in bloom_probe(bits, absent).collect())
    rate = fps / 2000
    import math
    expect = (1 - math.exp(-BLOOM_K * 2048 / BLOOM_M)) ** BLOOM_K
    assert abs(rate - expect) < 0.06, (rate, expect)


def test_bloom_registry_row_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["ngram_bloom_probe"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "ngram_bloom_probe")
