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
