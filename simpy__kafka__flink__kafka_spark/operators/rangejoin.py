"""Point-in-range lookup join — for each left row, the range row(s)
whose [start, end] interval contains its point value (GeoIP-style
enrichment: IP -> owning CIDR block, timestamp -> maintenance window,
offset -> shard interval).

Spark has no native range join; the naive form is a theta join
(``point BETWEEN start AND END``) that degenerates to
broadcast-nested-loop — O(P * R) comparisons regardless of selectivity.
The scale composition here is interval bucketing, the standard trick:

1. each point maps to bucket ``point div W``;
2. each range replicates to EVERY bucket its interval overlaps (one
   ``explode(sequence(start div W, end div W))`` — a range spanning K
   buckets costs K replicas, so pick W near the typical range span and
   the factor stays ~2);
3. the join is then a plain equi-join on the bucket key (shuffle/
   broadcast chosen by the planner like any other), with the exact
   ``BETWEEN`` as a residual filter.

Reference parity note: the reference trace pipeline's interval
machinery is the span-containment self-join (operators/linking.py,
simpy_kafka_reader.py:233-288); this module is the dimension-lookup
variant a crawl/log pipeline needs for IP->geo and time->window
enrichment — a training-data extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_lookup(points: DataFrame, ranges: DataFrame,
                          point_col: str, start_col: str, end_col: str,
                          bucket_width: int,
                          how: str = "left") -> DataFrame:
    """Join every ``points`` row to the ``ranges`` row(s) whose
    inclusive [start_col, end_col] contains its ``point_col``.

    Emits ALL containing ranges (a membership join — overlapping range
    tables produce one output row per match, identically in any
    engine); with ``how="left"`` points matching no range keep one row
    with null range columns.  Intervals with ``end < start`` are
    treated as empty and never match.

    ``bucket_width`` trades replication for selectivity: a range
    spanning K = span/bucket_width buckets stores K replicas.  Choose
    it near the LARGEST common range span (then K <= 2); a single
    giant catch-all range would replicate domain/width times — split
    such sentinels out and cross-join them instead.

    Output: all ``points`` columns + all ``ranges`` columns (callers
    project; column-name collisions are the caller's to rename).
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    p = points.withColumn(
        "_pbkt", F.expr(f"{point_col} div {bucket_width}"))
    r = ranges.where(F.col(end_col) >= F.col(start_col)).withColumn(
        "_rbkt",
        F.explode(F.expr(
            f"sequence({start_col} div {bucket_width}, "
            f"{end_col} div {bucket_width})")),
    )
    # ONE join: Catalyst extracts the bucket equality as the join key
    # and keeps the containment as residual — a point has exactly one
    # bucket, so a left point with no containing range keeps exactly
    # one null-extended row (no separate anti-join pass).
    cond = ((p["_pbkt"] == r["_rbkt"])
            & (p[point_col] >= r[start_col])
            & (p[point_col] <= r[end_col]))
    return p.join(r, cond, how).drop("_pbkt", "_rbkt")
