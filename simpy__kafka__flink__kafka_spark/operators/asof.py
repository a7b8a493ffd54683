"""As-of join — for each left row, the most recent right row at or before
its timestamp (per key).  Spark has no native ASOF JOIN (DuckDB does — the
oracle uses it); the scalable composition is the union-and-carry-forward
trick:

1. tag both sides and union them on (key, ts);
2. one window pass per key ordered by (ts, side-tag) carries the latest
   right-side payload forward (``last(..., ignorenulls=True)``);
3. keep left rows with the carried payload attached.

One shuffle on the key (the window exchange) — no range-condition join at
all, so no O(L*R) per-key blowup and no band tuning.  This is the standard
large-scale formulation for event-to-dimension time alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              payload_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each ``left`` row: columns of the latest ``right`` row with
    ``right.ts <= left.ts`` and equal ``on`` key (nulls when none).

    Ties on ``ts``: the right row counts (it is "at or before"), matching
    DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics — the right side
    sorts before the left at equal timestamps via the side tag.
    """
    lt = left.select(
        F.lit(1).alias("_side"),
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in payload_cols],
    )
    rt = right.select(
        F.lit(0).alias("_side"),
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(None).cast(
            lt.schema["_l"].dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    unioned = lt.unionByName(rt)
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "_side",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )
    out = carried.where(F.col("_side") == 1).select(
        "_l.*", *[f"{c}{suffix}" for c in payload_cols]
    )
    return out
