"""Chain-level statistics over the linked trace DAG
(reference ``requirements-v2.md:177`` — 链路统计: per-chain total time,
per-hop latency).

``chain_reach`` computes root-reachability via depth-bounded BFS — one
equi-join per level, unrolled.  Service-call trees are depth-bounded (the
reference topology is 4 levels), so a small constant bound covers real
traces; the bound also terminates the 2-cycles that identical-interval
mutual containment can create.  The DuckDB oracle uses a recursive CTE with
the same depth cap, so both engines enumerate exactly the distinct
(root, node, depth) triples.

At 100 TB each BFS level is a shuffle join on parent_id — the standard
iterative-join pattern (GraphX/GraphFrames motif expansion collapses to the
same plan).  The frontier is ``localCheckpoint(eager=False)``-ed every
``checkpoint_every`` levels: without it level d's plan nests every prior
level, so the unrolled query recomputes the join chain O(depth^2) times and
the plan itself grows superlinearly; the lazy checkpoint truncates lineage
and materializes each checkpointed frontier once, while keeping the builder
action-free (the checkpoint happens at the plan's first materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_DEPTH = 8
CHECKPOINT_EVERY = 4


def chain_roots(msgs: DataFrame, edges: DataFrame) -> DataFrame:
    """Root spans — no incoming edge, >= 1 outgoing edge — straight from the
    span + edge sets via anti/semi joins.  This avoids building the full
    parents/children adjacency aggregation (Generate + collect_set + outer
    join-back) when only root MEMBERSHIP is needed; both joins shuffle on the
    high-cardinality unique id."""
    return (
        msgs.select("id")
        .join(edges.select(F.col("child_id").alias("id")), "id", "left_anti")
        .join(edges.select(F.col("parent_id").alias("id")), "id", "left_semi")
        .select(F.col("id").alias("root_id"))
    )


def chain_reach(msgs: DataFrame, edges: DataFrame,
                max_depth: int = MAX_DEPTH,
                dedup_every: int = 2,
                checkpoint_every: int | None = CHECKPOINT_EVERY) -> DataFrame:
    """Distinct (root_id, node, depth<=max_depth) triples.

    ``dedup_every`` controls how often the frontier is de-duplicated: every
    level is the safest (diamond fan-in and 2-cycles can't grow the frontier
    at all), but each distinct is a full shuffle stage; deduping every K
    levels bounds the transient blow-up at fanout^K while cutting the stage
    count — the right trade for shallow service-call DAGs where diamonds are
    rare.  The final distinct restores exact set semantics either way.
    ``checkpoint_every`` lazily checkpoints the frontier every K levels (see
    module docstring); ``None`` disables.
    """
    roots = chain_roots(msgs, edges)
    level = roots.select(
        "root_id", F.col("root_id").alias("node"), F.lit(0).alias("depth")
    )
    reach = level
    for d in range(1, max_depth + 1):
        level = level.join(edges, level.node == edges.parent_id).select(
            "root_id",
            F.col("child_id").alias("node"),
            F.lit(d).alias("depth"),
        )
        if d % dedup_every == 0:
            level = level.distinct()
        if checkpoint_every and d % checkpoint_every == 0 and d < max_depth:
            level = level.localCheckpoint(eager=False)
        reach = reach.unionByName(level)
    return reach.distinct()


def chain_stats(msgs: DataFrame, edges: DataFrame,
                max_depth: int = MAX_DEPTH,
                checkpoint_every: int | None = CHECKPOINT_EVERY) -> DataFrame:
    """Per-root chain summary: span count, longest path, total duration
    (the root span's latency covers the whole chain by containment).

    Skips chain_reach's final distinct: countDistinct(node) and max(depth)
    are insensitive to duplicate (root, node, depth) triples, so the
    aggregation itself is the dedup — one shuffle fewer.  Frontier lazily
    checkpointed every ``checkpoint_every`` levels (module docstring)."""
    roots = chain_roots(msgs, edges)
    level = roots.select(
        "root_id", F.col("root_id").alias("node"), F.lit(0).alias("depth")
    )
    reach = level
    for d in range(1, max_depth + 1):
        level = level.join(edges, level.node == edges.parent_id).select(
            "root_id",
            F.col("child_id").alias("node"),
            F.lit(d).alias("depth"),
        )
        if d % 2 == 0:
            level = level.distinct()
        if checkpoint_every and d % checkpoint_every == 0 and d < max_depth:
            level = level.localCheckpoint(eager=False)
        reach = reach.unionByName(level)
    stats = reach.groupBy("root_id").agg(
        F.countDistinct("node").alias("n_spans"),
        F.max("depth").alias("max_depth"),
    )
    root_lat = msgs.select(
        F.col("id").alias("root_id"),
        F.col("latency_msec").alias("total_ms"),
    )
    return stats.join(root_lat, "root_id").select(
        "root_id", "n_spans", "max_depth", "total_ms"
    )


def hop_latencies(msgs: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-hop timing: each parent->child edge with the child's own latency
    and its start offset inside the parent (队列/网络 gap).  Needs only raw
    span columns — no adjacency aggregation."""
    p = msgs.select(F.col("id").alias("parent_id"),
                    F.col("start_at_ms").alias("p_start"))
    c = msgs.select(F.col("id").alias("child_id"),
                    F.col("start_at_ms").alias("c_start"),
                    F.col("latency_msec").alias("hop_ms"))
    return (
        edges.join(p, "parent_id")
        .join(c, "child_id")
        .select(
            "parent_id", "child_id", "hop_ms",
            (F.col("c_start") - F.col("p_start")).alias("start_offset_ms"),
        )
    )


def weighted_edges(msgs: DataFrame, edges: DataFrame) -> DataFrame:
    """(parent_id, child_id, _lat) — the edge list with the CHILD's
    integer latency pre-joined, the frame every :func:`critical_path`
    BFS level joins against.  Exposed so callers can cache/pin it once
    (it is referenced ``max_depth`` times)."""
    lat = msgs.select(F.col("id").alias("child_id"),
                      F.col("latency_msec").cast("long").alias("_lat"))
    return edges.join(lat, "child_id")


def critical_path(msgs: DataFrame, edges: DataFrame,
                  max_depth: int = MAX_DEPTH,
                  reduce_every: int = 2,
                  checkpoint_every: int | None = CHECKPOINT_EVERY,
                  edges_weighted: DataFrame | None = None) -> DataFrame:
    """Per-chain critical path — the longest latency-weighted root->node
    path (reference ``requirements-v2.md:177`` 链路统计: the one
    trace-latency question ``chain_stats`` doesn't answer: WHICH chain's
    slowest dependency walk dominates, not just its containment span).
    Path weight = sum of the latencies of every span on the path,
    root and endpoint inclusive; since latencies are non-negative the
    maximum over all reached nodes equals the maximum over leaves.

    Same depth-bounded BFS as :func:`chain_stats`, but the frontier is
    contracted every ``reduce_every`` levels with a MAX-PLUS reduction —
    ``groupBy(root, node, depth).max(path_ms)`` — instead of distinct:
    extending a path adds latencies independent of its history, so the
    best path through a node always extends that node's best prefix
    (Viterbi / tropical-semiring dynamic programming).  Diamond fan-in
    therefore collapses to ONE row per (root, node, depth) carrying the
    max, which is what keeps the frontier output-bounded on DAGs where
    path ENUMERATION would be exponential.

    Integer-exact: latencies are integer-valued (floor-scaled at the
    span view), summed and compared as BIGINT; ties between depths at
    the same weight resolve to the DEEPEST path via a single packed
    ``max(path_ms * 16 + depth)`` (depth <= 8 < 16), so the result is
    engine-independent.  Output: (root_id, critical_ms, critical_depth).
    """
    lat = msgs.select(F.col("id").alias("node"),
                      F.col("latency_msec").cast("long").alias("_lat"))
    # child latency pre-joined onto the edge list ONCE
    # (:func:`weighted_edges`): each BFS level is a single parent-keyed
    # join instead of edge-join + lat-join; pass a pinned
    # ``edges_weighted`` to materialize the shared frame once instead of
    # recomputing it per level
    ew = (edges_weighted if edges_weighted is not None
          else weighted_edges(msgs, edges))
    roots = chain_roots(msgs, edges)
    level = roots.join(lat, roots.root_id == lat.node).select(
        "root_id", "node", F.lit(0).alias("depth"),
        F.col("_lat").alias("path_ms"))
    best = level
    for d in range(1, max_depth + 1):
        level = (
            level.join(ew, level.node == ew.parent_id)
            .select("root_id", F.col("child_id").alias("node"),
                    F.lit(d).alias("depth"),
                    (F.col("path_ms") + F.col("_lat")).alias("path_ms"))
        )
        if d % reduce_every == 0:
            level = level.groupBy("root_id", "node", "depth").agg(
                F.max("path_ms").alias("path_ms"))
        if checkpoint_every and d % checkpoint_every == 0 and d < max_depth:
            level = level.localCheckpoint(eager=False)
        best = best.unionByName(level)
    packed = F.max(F.expr("path_ms * 16 + depth"))
    return best.groupBy("root_id").agg(
        F.expr("max(path_ms * 16 + depth) div 16").alias("critical_ms"),
        (packed % 16).cast("int").alias("critical_depth"),
    )
