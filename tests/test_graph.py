"""Integer-exact PageRank (operators/graph.py): structural pins on
hand-built graphs plus the registry row's oracle parity at sf0.001."""

from __future__ import annotations

from simpy__kafka__flink__kafka_spark.operators.graph import SCALE, pagerank


def _ranks(spark, edges, iterations=3):
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    return {r["node"]: r["rank_scaled"]
            for r in pagerank(df, iterations=iterations).collect()}


def test_symmetric_cycle_is_uniform(spark):
    # 4-cycle with equal weights: symmetry forces equal ranks
    got = _ranks(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1)])
    assert len(set(got.values())) == 1
    assert abs(sum(got.values()) - SCALE) < 100   # integer-division dust


def test_star_center_dominates(spark):
    # every spoke points at the hub; hub returns mass to one spoke
    got = _ranks(spark, [(1, 0, 1), (2, 0, 1), (3, 0, 1), (0, 1, 1)])
    assert got[0] > got[1] > got[2] == got[3]


def test_weight_split_proportional(spark):
    # src 0 splits 3:1 between dst 1 and dst 2 -> after ONE iteration
    # node 1 gets ~3x node 2's contribution share
    got = _ranks(spark, [(0, 1, 3), (0, 2, 1), (1, 0, 1), (2, 0, 1)],
                 iterations=1)
    c1 = got[1] - min(got.values())
    assert got[1] > got[2]
    # exact integer expectation: contributions are (r0*3) div 4, (r0*1) div 4
    r0 = SCALE // 3
    tele = ((15 * SCALE) // 100) // 3
    assert got[1] == tele + (85 * ((r0 * 3) // 4)) // 100
    assert got[2] == tele + (85 * ((r0 * 1) // 4)) // 100
    assert c1 >= 0


def test_mass_conserved_no_dangling(spark):
    got = _ranks(spark, [(0, 1, 2), (1, 2, 5), (2, 0, 1), (2, 1, 4)])
    assert abs(sum(got.values()) - SCALE) < 1000


def test_registry_row_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["domain_pagerank"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "domain_pagerank")


def test_checkpointed_deep_unroll_identical(spark):
    # 12 iterations with and without the lineage checkpoint must agree
    # exactly (integer arithmetic — no drift to hide behind)
    edges = [(0, 1, 2), (1, 2, 5), (2, 0, 1), (2, 1, 4), (3, 0, 7),
             (0, 3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    a = {r["node"]: r["rank_scaled"]
         for r in pagerank(df, iterations=12).collect()}
    b = {r["node"]: r["rank_scaled"]
         for r in pagerank(df, iterations=12, checkpoint_every=4).collect()}
    assert a == b
