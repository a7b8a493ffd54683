"""Time-series regularization over the event stream — the resampling
stage an analytics/feature pipeline runs before windowed models: per
key, project the irregular event series onto a fixed grid with
last-observation-carried-forward and linear interpolation.

Exactness posture: values are floor-scaled to integers once
(``floor(value * scale)`` — the same double on both engines floors to
the same integer), and interpolation is pure integer arithmetic
(``prev + ((next - prev) * dt) div span``), so the output hash-matches
the DuckDB oracle with no float-summation concerns anywhere.  Negative
slopes are safe: Spark's ``div`` and DuckDB's ``//`` BOTH truncate
toward zero on negative integer operands (verified ``-7 div 2 = -3``
on each), so descending series divide identically.

Scale shape: ONE exchange keyed on the series id (the window
partition) carrying events + grid points together; the per-user grid is
generated from a per-key min/max aggregate (map-side combined), never a
driver-side loop.  Both the LOCF and the interpolation ride the same
sort via two window frames (preceding and following) over identical
partitioning/ordering.

Reference parity note: the reference trace pipeline has no resampling
surface; this belongs to the training-data/analytics extension
operators (same family as the as-of join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

VALUE_SCALE = 10 ** 6


def gap_fill(events: DataFrame, grid_ms: int = 3_600_000,
             id_col: str = "user_id", ts_col: str = "ts_ms",
             value_col: str = "value",
             value_scale: int = VALUE_SCALE) -> DataFrame:
    """Resample each key's event series onto a ``grid_ms`` grid between
    that key's first and last event: ``locf_scaled`` carries the latest
    value at-or-before the grid instant forward; ``interp_scaled``
    interpolates linearly (integer arithmetic) between the surrounding
    events, falling back to the available side at the series edge.  A
    grid instant coinciding with an event reproduces that event's value
    exactly in both columns.  Keys whose span contains no grid instant
    emit nothing.
    Output: (id_col, grid_ts, locf_scaled, interp_scaled)."""
    e = events.select(
        F.col(id_col).alias("_id"), F.col(ts_col).alias("t"),
        F.floor(F.col(value_col) * value_scale).cast("long").alias("v"))
    bounds = e.groupBy("_id").agg(F.min("t").alias("t0"),
                                  F.max("t").alias("t1"))
    g = grid_ms
    grid = (
        bounds.select(
            "_id",
            F.expr(f"((t0 + {g - 1}) div {g}) * {g}").alias("gs"),
            F.expr(f"(t1 div {g}) * {g}").alias("ge"))
        .where(F.col("gs") <= F.col("ge"))
        .select("_id", F.explode(
            F.sequence("gs", "ge", F.lit(g))).alias("t"))
    )
    pts = (
        e.select("_id", "t", F.lit(0).alias("kind"), "v")
        .unionByName(grid.select(
            "_id", "t", F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("v")))
    )
    # "v" tiebreaks two events for one key at the same timestamp — without
    # it pv/nv would be engine- and partition-order-dependent (grid rows
    # are unique per (key, t) and kind separates them from events, so the
    # only possible (t, kind) ties are event-event with v NON-null; null
    # ordering therefore never matters and Spark/DuckDB agree).  Mirrored
    # in the DuckDB oracle's WINDOW clauses.
    w = W.partitionBy("_id").orderBy("t", "kind", "v")
    prev = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    nxt = w.rowsBetween(W.currentRow, W.unboundedFollowing)
    ev_t = F.when(F.col("kind") == 0, F.col("t"))
    filled = pts.select(
        "_id", "t", "kind",
        F.last("v", ignorenulls=True).over(prev).alias("pv"),
        F.last(ev_t, ignorenulls=True).over(prev).alias("pt"),
        F.first("v", ignorenulls=True).over(nxt).alias("nv"),
        F.first(ev_t, ignorenulls=True).over(nxt).alias("nt"),
    )
    interp = (
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull()
            & (F.col("nt") > F.col("pt")),
            F.expr("pv + ((nv - pv) * (t - pt)) div (nt - pt)"))
        .otherwise(F.coalesce("pv", "nv"))
    )
    return filled.where(F.col("kind") == 1).select(
        F.col("_id").alias(id_col),
        F.col("t").alias("grid_ts"),
        F.col("pv").cast("long").alias("locf_scaled"),
        interp.cast("long").alias("interp_scaled"),
    )


def rolling_zscore_anomalies(events: DataFrame,
                             grid_ms: int = 3_600_000,
                             window: int = 24,
                             min_history: int = 8,
                             z_threshold: int = 3,
                             id_col: str = "user_id",
                             ts_col: str = "ts_ms") -> DataFrame:
    """Rolling z-score anomaly detection over per-key event RATES — the
    burst/outage detector an ops pipeline runs on an event stream: each
    key's events bucket onto a ``grid_ms`` grid (count per bucket), and
    every bucket with at least ``min_history`` PRIOR observed buckets in
    its trailing ``window`` is scored against that history's mean and
    population variance.

    Exactness posture (the gap_fill discipline): the z-score test is
    algebraically cleared of divisions — with s = sum, q = sum of
    squares, n = history size, the flag ``|x - s/n| / sigma > z`` is
    exactly ``(x*n - s)^2 > z^2 * (n*q - s^2)`` in pure integer
    arithmetic (variance is the population form, times n^2), and the
    reported magnitude ``z2_scaled = ((x*n - s)^2 * 10^4) div
    max(n*q - s^2, 1)`` is integer division — both engines hash-match
    with no float anywhere.  A zero-variance history (all buckets
    equal) flags any deviation, which is the honest reading.

    Overflow bound: counts SATURATE per bucket inside the algebra
    (``n_events`` still reports the true count) at a cap DERIVED from
    ``window`` and ``z_threshold`` (2^20 at the defaults — see
    :func:`score_bucket_counts` for the proof), so a mega-burst can
    never overflow the int64 arithmetic at ANY window (under ANSI mode
    an unclamped burst of ~1.3M events would ERROR the whole query; a
    bucket past the cap is an anomaly by any reading).

    Scale shape: one exchange for the bucket counts (map-side
    combined), then one window pass per key ordered by bucket — the
    trailing frame is ``window``-bounded, and per-key bucket
    cardinality is timeline-hours, never event volume, so a hot key
    costs the same partition as a quiet one.
    Output: (id_col, bucket_ts, n_events, n_hist, z2_scaled,
    is_anomaly)."""
    g = int(grid_ms)
    counts = (
        events.select(F.col(id_col),
                      F.expr(f"({ts_col} div {g}) * {g}").alias("bucket_ts"))
        .groupBy(id_col, "bucket_ts")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    return score_bucket_counts(counts, window=window,
                               min_history=min_history,
                               z_threshold=z_threshold, id_col=id_col)


def derive_count_cap(window: int, z_threshold: int) -> int:
    """The per-bucket saturation cap that keeps the division-free z
    algebra int64-exact: ``min(2^20, isqrt((2^63-1) // max(10^4, z^2))
    // window)`` (2^20 at the defaults).  Shared by
    :func:`score_bucket_counts` and the SQL oracle rendering
    (plans/relational.py:z_anomaly_select) — the saturation value is
    part of the algebra's semantics, so it must not drift between the
    engines."""
    from math import isqrt

    window = int(window)
    z_threshold = int(z_threshold)
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    cap = min(1 << 20,
              isqrt((2 ** 63 - 1) // max(10 ** 4, z_threshold ** 2))
              // window)
    if cap < 1:
        raise ValueError(
            f"window {window} (z {z_threshold}) leaves no int64-exact "
            "headroom for the division-free z algebra")
    return cap


def score_bucket_counts(counts: DataFrame, window: int = 24,
                        min_history: int = 8, z_threshold: int = 3,
                        id_col: str = "user_id") -> DataFrame:
    """The scoring half of :func:`rolling_zscore_anomalies` over
    PRE-BUCKETED counts (``id_col``, bucket_ts, x) — shared verbatim by
    the batch operator and the streaming detector
    (streaming/windows.py:score_anomaly_batch), so their parity is by
    construction, the same split as quality scoring.

    Overflow proof (round 12 — the cap now DERIVES from the
    parameters instead of assuming ``window <= 24``, ADVICE r11): with
    per-bucket counts saturated at ``cap`` and ``n <= window`` history
    rows, ``|nc| <= n*cap`` and ``dc <= n*q <= n^2*cap^2``, so both
    ``nc^2 * 10^4`` and ``z^2 * dc`` stay below 2^63 whenever
    ``(window*cap)^2 * max(10^4, z^2) < 2^63`` — enforced by
    :func:`derive_count_cap`, ONE rendering shared with the DuckDB
    oracle side (plans/relational.py:z_anomaly_select) so the two
    engines can never saturate differently (round-12 review fix),
    raising if the window leaves no headroom rather than silently
    wrapping under non-ANSI Spark."""
    window = int(window)
    z_threshold = int(z_threshold)
    cap = derive_count_cap(window, z_threshold)
    counts = counts.select(F.col(id_col).alias("_id"), "bucket_ts", "x") \
        .withColumn("xc", F.least("x", F.lit(cap)))
    hist = (W.partitionBy("_id").orderBy("bucket_ts")
            .rowsBetween(-int(window), -1))
    scored = counts.select(
        "_id", "bucket_ts", "x", "xc",
        F.coalesce(F.sum("xc").over(hist), F.lit(0)).alias("s"),
        F.coalesce(F.sum(F.col("xc") * F.col("xc")).over(hist),
                   F.lit(0)).alias("q"),
        F.count(F.lit(1)).over(hist).cast("long").alias("n"),
    ).select(
        # nc/dc are the SINGLE source of the z algebra — the magnitude
        # and the flag below both derive from these two columns
        "*",
        (F.col("xc") * F.col("n") - F.col("s")).alias("nc"),
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).alias("dc"),
    )
    return (
        scored.where(F.col("n") >= int(min_history))
        .select(
            F.col("_id").alias(id_col), "bucket_ts",
            F.col("x").alias("n_events"),
            F.col("n").alias("n_hist"),
            F.expr("(nc * nc * 10000) div greatest(dc, 1)")
            .cast("long").alias("z2_scaled"),
            F.when(F.col("nc") * F.col("nc")
                   > F.lit(int(z_threshold) ** 2) * F.col("dc"),
                   F.lit(1)).otherwise(F.lit(0)).alias("is_anomaly"),
        )
    )
