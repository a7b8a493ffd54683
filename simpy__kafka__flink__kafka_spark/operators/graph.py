"""Web-graph analytics over the crawl's link structure — the ranking
signal a corpus pipeline derives from ``extract_links`` output (domain
authority feeds quality weighting and crawl scheduling).

PageRank here is INTEGER-EXACT: ranks are scaled to a large integer
budget and every step (teleport share, per-edge contribution split,
damping) is integer division, so the result is bit-identical across
engines and summation orders — which is what makes a fixed-iteration
run DuckDB-oracle-checkable (float PageRank would diverge by engine
reduction order).  Precision loss vs float is bounded by
(edges + nodes) / scale per iteration — at scale=1e12, noise in the
13th digit.

Scale shape: the classic distributed PageRank — per iteration ONE join
of the rank vector onto the out-edge list (both keyed on src) and ONE
aggregation keyed on dst.  The edge list is re-read per iteration (at
cluster scale it is the cached/bucketed relation); iterations are a
fixed unroll (lazy — no driver-side convergence collect), with
``localCheckpoint`` the documented lever past ~8 unrolled rounds (the
chain_stats precedent).

Reference parity note: the reference trace pipeline has no graph-rank
surface; this belongs to the training-data extension operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10 ** 12          # integer rank budget (sum of ranks ~= SCALE)
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(edges: DataFrame, iterations: int = 3,
             scale: int = SCALE,
             checkpoint_every: int = 0,
             redistribute_dangling: bool = False) -> DataFrame:
    """Fixed-iteration integer PageRank over a weighted edge list
    (src, dst, weight).  Every node appearing as src or dst is ranked;
    contributions split proportionally to edge weight with integer
    division; damping 0.85 applied as (85 * x) div 100.

    Dangling nodes (no out-edges): by default their mass leaks (the
    standard simplification — fine on graphs without them).  With
    ``redistribute_dangling=True`` each iteration adds ONE tiny
    aggregate — the summed rank of out-edge-less nodes — broadcast as a
    single row and shared ``dm div n`` to every node INSIDE the damping
    term (the NetworkX/classic uniform-redistribution semantics,
    integer-exact), which is what real web graphs need: they carry
    dangling pages everywhere and the leak otherwise compounds per
    iteration.  Cost: one broadcast-sized agg per iteration, no extra
    keyed shuffle.

    ``checkpoint_every`` > 0 lazily ``localCheckpoint``-s the rank
    vector every that-many iterations — the chain_stats lineage lever
    for deep unrolls (past ~8 rounds the nested plan makes Catalyst
    re-derive every prior level); at cluster scale the same knob maps to
    ``df.checkpoint()`` against the checkpoint dir.
    Output: (node, rank_scaled: long) summing to ~scale."""
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    # broadcast 1-row node count — no eager action in the build path
    nc = nodes.agg(F.count(F.lit(1)).alias("n"))
    out = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    e = edges.join(out, "src")
    dangling = nodes.join(out.select(F.col("src").alias("node")),
                          "node", "left_anti")

    r = (nodes.crossJoin(F.broadcast(nc))
         .select("node", F.expr(f"{scale} div n").alias("rank")))
    for it in range(iterations):
        contrib = (
            e.join(r, e["src"] == r["node"])
            .select(F.col("dst").alias("node"),
                    F.expr("(rank * weight) div w_out").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        base = nodes.join(contrib, "node", "left").crossJoin(F.broadcast(nc))
        if redistribute_dangling:
            dmass = (dangling.join(r, "node")
                     .agg(F.coalesce(F.sum("rank"), F.lit(0))
                          .alias("dm")))
            base = base.crossJoin(F.broadcast(dmass))
            in_term = "coalesce(in_sum, 0) + (dm div n)"
        else:
            in_term = "coalesce(in_sum, 0)"
        r = base.select(
            "node",
            (F.expr(f"(({DAMP_DEN - DAMP_NUM} * {scale}) div "
                    f"{DAMP_DEN}) div n")
             + F.expr(f"({DAMP_NUM} * ({in_term})) div "
                      f"{DAMP_DEN}")).alias("rank"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            r = r.localCheckpoint(eager=False)
    return r.select("node", F.col("rank").cast("long").alias("rank_scaled"))


def salsa(edges: DataFrame, iterations: int = 2,
          scale: int = SCALE) -> DataFrame:
    """Fixed-iteration integer-exact SALSA (Lempel & Moran 2000) hub /
    authority scores over a weighted edge list (src, dst, weight) — the
    complementary ranking signal to :func:`pagerank`: a page that LINKS
    TO many authorities is a hub even if nothing links to it, which is
    exactly the shape of crawl seed lists and link directories.

    SALSA replaces HITS's L2 normalization (float, engine-reduction-
    order-dependent — not oracle-checkable) with row/column-stochastic
    walk steps, which is precisely the :func:`pagerank` integer
    discipline: the authority half-step splits each hub's FULL score
    across its out-edges (``(hub * weight) div w_out``), the hub
    half-step splits each authority's score across its in-edges
    (``(auth * weight) div w_in``).  Normalization is built into the
    split, so no value ever exceeds ``scale`` and every step is int64
    integer division — bit-identical across engines.  (A renormalize-
    after-summing HITS variant needs ``raw * scale`` intermediates that
    overflow int64; the mass-conserving split is the structurally
    correct integer form.)  Like pagerank's default, the mass of
    dangling hubs (no out-edges) / dangling authorities (no in-edges)
    leaks, so totals only sum to ~scale on graphs where every node has
    both directions; per-value products are bounded by scale * weight
    (the pagerank row's identical int64 exposure: weight < 9.2e6 at
    scale 1e12 — pre-bucket edge weights above that).

    Scale shape: per iteration TWO keyed joins (score vector onto the
    edge list, keyed src then dst) and TWO keyed aggregations — the
    one-join-one-agg-per-direction plan distributed SALSA/HITS always
    is; w_out/w_in are computed once outside the loop.
    Output: (node, hub_scaled, auth_scaled).

    Reference parity note: like pagerank, a training-data extension —
    the reference trace pipeline has no graph-rank surface."""
    if iterations < 1:
        # auth is undefined before the first half-step (unlike
        # pagerank, whose 0-iteration result is the uniform vector)
        raise ValueError("salsa needs iterations >= 1")
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    nc = nodes.agg(F.count(F.lit(1)).alias("n"))
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    in_w = edges.groupBy("dst").agg(F.sum("weight").alias("w_in"))
    e = edges.join(out_w, "src").join(in_w, "dst")
    h = (nodes.crossJoin(F.broadcast(nc))
         .select("node", F.expr(f"{scale} div n").alias("hub")))
    a = None
    for _ in range(iterations):
        a_raw = (
            e.join(h, e["src"] == h["node"])
            .select(F.col("dst").alias("node"),
                    F.expr("(hub * weight) div w_out").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("raw"))
        )
        a = (nodes.join(a_raw, "node", "left")
             .select("node",
                     F.expr("coalesce(raw, 0)").alias("auth")))
        h_raw = (
            e.join(a, e["dst"] == a["node"])
            .select(F.col("src").alias("node"),
                    F.expr("(auth * weight) div w_in").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("raw"))
        )
        h = (nodes.join(h_raw, "node", "left")
             .select("node",
                     F.expr("coalesce(raw, 0)").alias("hub")))
    return (h.join(a, "node")
            .select("node", F.col("hub").cast("long").alias("hub_scaled"),
                    F.col("auth").cast("long").alias("auth_scaled")))
