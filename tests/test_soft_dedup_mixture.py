"""Golden semantics for soft_dedup_weights (duplicate-discounted
weights, never removal) and mixture_plan (temperature mix planning)."""

from __future__ import annotations

import math

from simpy__kafka__flink__kafka_spark.functions.dedup import (
    soft_dedup_weights,
)
from simpy__kafka__flink__kafka_spark.functions.sampling import mixture_plan


def test_soft_dedup_weights_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta"), (2, "alpha beta"),      # exact pair
            (3, "gamma delta one"), (4, "gamma delta two"),
            (5, "gamma delta three"),                   # near-dup triple
            (6, "unique text here"),
        ],
        "doc_id LONG, text STRING",
    )
    pairs = spark.createDataFrame(
        [(3, 4), (4, 5)], "doc_a LONG, doc_b LONG")
    got = {r["doc_id"]: (r["n_exact"], r["n_eff"], r["weight_ppm"])
           for r in soft_dedup_weights(docs, pairs).collect()}
    assert got[1] == (2, 2, 500_000) and got[2] == (2, 2, 500_000)
    # cluster of 3, no exact copies: discounted by cluster size
    for d in (3, 4, 5):
        assert got[d] == (1, 3, 333_333)
    assert got[6] == (1, 1, 1_000_000)
    # every doc survives — soft dedup never drops rows
    assert len(got) == 6


def test_soft_dedup_exact_dominates_cluster(spark):
    # 4 exact copies that are also a near-dup pair cluster of 2:
    # n_eff takes the LARGER multiplicity
    docs = spark.createDataFrame(
        [(i, "same text") for i in range(1, 5)],
        "doc_id LONG, text STRING")
    pairs = spark.createDataFrame([(1, 2)], "doc_a LONG, doc_b LONG")
    got = {r["doc_id"]: r["n_eff"]
           for r in soft_dedup_weights(docs, pairs).collect()}
    assert got == {1: 4, 2: 4, 3: 4, 4: 4}


def test_mixture_plan_golden(spark):
    # two sources, 100 vs 400 tokens; alpha=0.5 -> shares 1/3 vs 2/3
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 100), "small"),
         (2, " ".join(["w"] * 400), "big")],
        "doc_id LONG, text STRING, source STRING",
    )
    got = {r["source"]: r.asDict()
           for r in mixture_plan(docs, budget_tokens=1000).collect()}
    s, b = got["small"], got["big"]
    assert (s["n_tokens"], b["n_tokens"]) == (100, 400)
    assert math.isclose(s["natural_share"], 0.2)
    assert math.isclose(s["target_share"], 1 / 3, abs_tol=1e-6)
    assert math.isclose(b["target_share"], 2 / 3, abs_tol=1e-6)
    # rate = budget * share / tokens: small upsamples past 1 epoch
    assert math.isclose(s["sample_rate"], 1000 / 3 / 100, abs_tol=1e-5)
    assert s["epochs"] == 4 and b["epochs"] == 2
