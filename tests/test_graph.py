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


def test_compliant_pagerank_drops_nofollow_outlinks(spark, sf_dir):
    """The rank INPUT of the robots->links->rank composition must carry
    no edge sourced from a nofollow page, and must differ from the
    ungated graph wherever one was dropped."""
    from pyspark.sql import functions as F

    from simpy__kafka__flink__kafka_spark.functions.quality import (
        robots_flags)
    from simpy__kafka__flink__kafka_spark.plans.dataprep import (
        _doc_domain_links, _docs, _domain_edges, _synth_robots_pages)

    docs = _docs(spark, sf_dir)
    flags = robots_flags(_synth_robots_pages(docs), headers_col="headers")
    nofollow = flags.where(F.col("nofollow") == 1).select("doc_id")
    assert nofollow.count() > 0  # the synthesis plants nofollow pages

    links = _doc_domain_links(docs)
    gated = links.join(flags.where(F.col("nofollow") == 0)
                       .select("doc_id"), "doc_id", "left_semi")
    # provably absent: a nofollow doc contributes NO link
    assert gated.join(nofollow, "doc_id", "left_semi").count() == 0
    # and the domain rollup lost exactly the nofollow docs' weight
    w_all = _domain_edges(links).agg(F.sum("weight")).collect()[0][0]
    w_gated = _domain_edges(gated).agg(F.sum("weight")).collect()[0][0]
    assert w_all - w_gated == nofollow.count()


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    """A graph whose sink node holds growing rank: without
    redistribution that mass leaks every iteration; with it, total rank
    stays ~SCALE (floor losses only) and the dangling node's mass flows
    back uniformly."""
    from simpy__kafka__flink__kafka_spark.operators.graph import (
        SCALE, pagerank)

    # B->A, C->A, A->D; D is dangling and accumulates rank
    edges = spark.createDataFrame(
        [("B", "A", 1), ("C", "A", 1), ("A", "D", 1)],
        "src string, dst string, weight long")
    leak = {r.node: r.rank_scaled
            for r in pagerank(edges, iterations=3).collect()}
    redist = {r.node: r.rank_scaled
              for r in pagerank(edges, iterations=3,
                                redistribute_dangling=True).collect()}
    assert set(leak) == set(redist) == {"A", "B", "C", "D"}
    # leaky: D's mass vanished each round — well under the budget
    assert sum(leak.values()) < 0.75 * SCALE
    # redistributed: conserved up to integer-floor crumbs
    assert sum(redist.values()) > 0.999 * SCALE
    # every node gains from the redistributed mass
    assert all(redist[n] > leak[n] for n in redist)


def _salsa_scores(spark, edges, iterations=2):
    from simpy__kafka__flink__kafka_spark.operators.graph import salsa

    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    return {r["node"]: (r["hub_scaled"], r["auth_scaled"])
            for r in salsa(df, iterations=iterations).collect()}


def test_salsa_star_hub_vs_authority(spark):
    # node 0 links to 1,2,3 and nothing links to 0: 0 is the only hub,
    # 1-3 are pure authorities with equal shares.  One iteration keeps
    # the hand-derivation exact: a(v) = (h0 * 1) div 3, and node 0
    # collects all three authorities' mass back (w_in = 1 each).
    got = _salsa_scores(spark, [(0, 1, 1), (0, 2, 1), (0, 3, 1)],
                        iterations=1)
    h0 = SCALE // 4
    assert got[1] == got[2] == got[3] == (0, (h0 * 1) // 3)
    assert got[0] == (3 * ((h0 // 3) * 1 // 1), 0)


def test_salsa_weight_proportional_authority(spark):
    # one hub splits weight 3:1 -> authority shares split 3:1 exactly
    got = _salsa_scores(spark, [(0, 1, 3), (0, 2, 1)], iterations=1)
    h0 = SCALE // 3
    assert got[1][1] == (h0 * 3) // 4
    assert got[2][1] == (h0 * 1) // 4
    assert got[0][1] == 0


def test_salsa_budget_conserved_when_no_danglers(spark):
    # every node has in- and out-edges: the stochastic splits conserve
    # the budget up to integer-division dust
    got = _salsa_scores(spark, [(0, 1, 2), (1, 2, 5), (2, 0, 1),
                                (2, 1, 4), (0, 2, 7)])
    assert abs(sum(h for h, _ in got.values()) - SCALE) < 100
    assert abs(sum(a for _, a in got.values()) - SCALE) < 100


def test_salsa_registry_row_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["salsa_scores"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir, "salsa_scores")
