"""near_dup_clusters_fixpoint (large-star/small-star) must compute TRUE
connected components on any graph shape — including the long chains where
fixed-round min-label propagation (the oracle-matched twin) stalls — and the
two must agree wherever the fixed-round form converges."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.functions.dedup import (
    near_dup_clusters, near_dup_clusters_fixpoint)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a string, doc_b string")


def _clusters(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_fixpoint_on_100_node_path(spark):
    # path d000-d001-...-d099: radius 99 from the min node — min-label
    # propagation would need ~99 rounds; large-star/small-star converges in
    # O(log n)
    edges = [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(99)]
    got = _clusters(near_dup_clusters_fixpoint(_pairs(spark, edges)))
    assert len(got) == 100
    assert set(got.values()) == {"d000"}


def test_fixpoint_two_components_and_clique(spark):
    clique = [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
    chain = [(f"b{i}", f"b{i + 1}") for i in range(6)]
    got = _clusters(near_dup_clusters_fixpoint(_pairs(spark, clique + chain)))
    assert {k: v for k, v in got.items() if k.startswith("a")} == {
        f"a{i}": "a0" for i in range(5)
    }
    assert {k: v for k, v in got.items() if k.startswith("b")} == {
        f"b{i}": "b0" for i in range(7)
    }


def test_fixed_round_twin_agrees_on_shallow_graphs(spark):
    # near-dup groups from LSH are near-cliques (radius <= 2); both forms
    # must produce identical clusters there
    edges = [("x1", "x2"), ("x2", "x3"), ("x1", "x3"), ("y9", "y8"),
             ("z5", "z4"), ("z5", "z6")]
    p = _pairs(spark, edges)
    assert _clusters(near_dup_clusters(p)) == _clusters(
        near_dup_clusters_fixpoint(p)
    )


def test_fixed_round_documented_stall_is_real(spark):
    # documents the contract: a radius-6 path does NOT fully converge in 4
    # rounds of min-label propagation (both engines agree on the stalled
    # labels — the fixpoint form is the correctness escape hatch)
    edges = [(f"p{i}", f"p{i + 1}") for i in range(6)]
    fixed = _clusters(near_dup_clusters(_pairs(spark, edges)))
    assert set(fixed.values()) != {"p0"}
    true = _clusters(near_dup_clusters_fixpoint(_pairs(spark, edges)))
    assert set(true.values()) == {"p0"}

def _docs_df(spark, ids):
    return spark.createDataFrame([(d, f"text {d}") for d in ids],
                                 "doc_id string, text string")


def test_dedup_survivors_modes_agree_on_shallow_graphs(spark):
    from simpy__kafka__flink__kafka_spark.functions.dedup import dedup_survivors

    edges = [("x1", "x2"), ("x2", "x3"), ("x1", "x3"), ("y9", "y8")]
    docs = _docs_df(spark, ["x1", "x2", "x3", "y8", "y9", "solo"])
    p = _pairs(spark, edges)
    fixed = {r["doc_id"] for r in dedup_survivors(docs, p).collect()}
    fp = {r["doc_id"] for r in
          dedup_survivors(docs, p, fixpoint=True).collect()}
    assert fixed == fp == {"x1", "y8", "solo"}


def test_dedup_survivors_fixpoint_beats_fixed_on_chains(spark):
    from simpy__kafka__flink__kafka_spark.functions.dedup import dedup_survivors

    # path a0-z1-z2-z3-z4-b0: after 4 min-label rounds a node's label is the
    # min id within graph distance 4, so b0 (minimal in its radius-4
    # neighborhood, but 5 hops from the true min a0) stays self-labeled and
    # is wrongly KEPT by the fixed-round form; fixpoint resolves it.
    chain = ["a0", "z1", "z2", "z3", "z4", "b0"]
    edges = list(zip(chain, chain[1:]))
    docs = _docs_df(spark, chain)
    p = _pairs(spark, edges)
    fp = {r["doc_id"] for r in
          dedup_survivors(docs, p, fixpoint=True).collect()}
    assert fp == {"a0"}
    fixed = {r["doc_id"] for r in dedup_survivors(docs, p).collect()}
    assert fixed == {"a0", "b0"}
