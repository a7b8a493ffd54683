"""Scale-safe global sequences: row numbering and prefix aggregation without
a single-partition sort.

An unpartitioned ``Window.orderBy`` collapses the whole dataset onto one task
— fine at oracle scale, a dead end at 100 TB.  The classic fix (zipWithIndex
in DataFrame clothing): range-repartition on the order key so partition *i*
holds a contiguous key range, compute the per-partition window locally, then
add broadcast per-partition offsets (a <n_parts>-row aggregate).  Total cost:
one range shuffle + one tiny agg, and every heavy window runs partition-local.

Determinism note: ``repartitionByRange`` picks boundaries by sampling, so the
row->partition assignment must be computed exactly once — the ranged frame is
``.cache()``-ed so the offsets subtree and the output subtree see the same
partitioning (the OUTPUT is boundary-independent either way; the cache only
guards against the two subtrees sampling different boundaries).

Caching contract: each call pins one ranged frame for the session; long-lived
drivers release plan caches between query generations with
``spark.catalog.clearCache()`` (the bench harness does).

The window-based forms these mirror stay the declared/gate-checked twins
(``plans/scalar.py``); equivalence is asserted in
``tests/test_sequences.py`` at multiple partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _ranged(df: DataFrame, order_cols: list[str], n_parts: int) -> DataFrame:
    from ..cachepin import pin

    return pin(
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )


def _prior_fold(ranged: DataFrame, agg_col, fold, out_name: str) -> DataFrame:
    """Per-partition aggregate folded over strictly-prior partitions.

    Expressed as a broadcast triangle join on the n_parts-row per-partition
    frame (b._pid < a._pid, then fold b's values) rather than a window: an
    unpartitioned window here would be harmless at n_parts rows, but Spark
    4's EliminateWindowPartitions folds any constant partitionBy away and
    WindowExec then WARNs 'No Partition Defined' on every (re)plan — noise
    that masks real single-task sorts elsewhere.  Null fold for _pid=0
    (no prior partitions), which every caller coalesces/greatest-s away."""
    per_part = ranged.groupBy("_pid").agg(agg_col.alias("_v"))
    b = per_part.select(F.col("_pid").alias("_bpid"), F.col("_v").alias("_bv"))
    return (
        per_part.join(F.broadcast(b), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(fold("_bv").alias(out_name))
    )


def ranged_row_number(df: DataFrame, order_cols: list[str],
                      out_col: str = "seq", n_parts: int = 32) -> DataFrame:
    """Global 1-based row_number over ``order_cols`` with no global sort.
    Output = input columns + ``out_col``; exact match with
    ``row_number() OVER (ORDER BY order_cols)`` for unique keys."""
    ranged = _ranged(df, order_cols, n_parts)
    offs = _prior_fold(ranged, F.count(F.lit(1)), F.sum, "_off")
    wp = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offs), "_pid")
        .withColumn(
            out_col,
            F.row_number().over(wp) + F.coalesce(F.col("_off"), F.lit(0)),
        )
        .drop("_pid", "_off")
    )


def ranged_prefix_sum(df: DataFrame, order_cols: list[str], val_col: str,
                      out_col: str = "prefix_sum", n_parts: int = 32,
                      exclusive: bool = False) -> DataFrame:
    """Global running sum of ``val_col`` in ``order_cols`` order, scale-safe.

    ``exclusive=True`` sums strictly-preceding rows (0 for the global first
    row) — the cumulative-tokens-before-me semantic used by token-budget
    shard packing (``functions/sampling.py``)."""
    ranged = _ranged(df, order_cols, n_parts)
    prior = _prior_fold(ranged, F.sum(val_col), F.sum, "_ps")
    end = -1 if exclusive else W.currentRow
    wp = W.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, end
    )
    local = F.coalesce(F.sum(val_col).over(wp), F.lit(0).cast("long"))
    return (
        ranged.join(F.broadcast(prior), "_pid")
        .withColumn(out_col, local + F.coalesce(F.col("_ps"), F.lit(0)))
        .drop("_pid", "_ps")
    )


def ranged_prefix_max(df: DataFrame, order_cols: list[str], val_col: str,
                      out_col: str = "prefix_max", n_parts: int = 32,
                      exclusive: bool = False) -> DataFrame:
    """Global running max of ``val_col`` in ``order_cols`` order, scale-safe.

    ``exclusive=True`` computes the prefix max over strictly-preceding rows
    (null for the global first row) — the watermark-before-me semantic used
    by late-data flagging."""
    ranged = _ranged(df, order_cols, n_parts)
    prior = _prior_fold(ranged, F.max(val_col), F.max, "_pm")
    end = -1 if exclusive else W.currentRow
    wp = W.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, end
    )
    local = F.max(val_col).over(wp)
    return (
        ranged.join(F.broadcast(prior), "_pid")
        .withColumn(out_col, F.greatest(local, F.col("_pm")))
        .drop("_pid", "_pm")
    )
