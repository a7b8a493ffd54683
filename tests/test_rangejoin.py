"""Bucketed point-in-range lookup (operators/rangejoin.py): equivalence
with the direct theta join, left/inner semantics, overlap membership,
and the registry row's DuckDB parity."""

from __future__ import annotations

import pyspark.sql.functions as F

from simpy__kafka__flink__kafka_spark.operators.rangejoin import (
    bucketed_range_lookup)


def _frames(spark):
    pts = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 5, 10, 99, 100, 150, 199,
                                       200, 1000, 5000])],
        "pid long, p long")
    rng = spark.createDataFrame(
        [(0, 99, "a"),          # exactly one bucket-boundary-aligned
         (100, 249, "b"),       # spans multiple buckets (w=100)
         (150, 199, "c"),       # OVERLAPS b: membership join emits both
         (300, 250, "d"),       # inverted -> empty, never matches
         (4900, 5100, "e")],    # far range
        "s long, e long, tag string")
    return pts, rng


def test_matches_direct_theta_join(spark):
    pts, rng = _frames(spark)
    for w in (1, 7, 100, 1000):
        got = sorted(
            (r["pid"], r["tag"])
            for r in bucketed_range_lookup(pts, rng, "p", "s", "e", w,
                                           how="inner").collect())
        want = sorted(
            (r["pid"], r["tag"])
            for r in pts.join(
                rng, (F.col("p") >= F.col("s"))
                & (F.col("p") <= F.col("e"))).collect())
        assert got == want, f"bucket_width={w}"


def test_left_keeps_unmatched_points_once(spark):
    pts, rng = _frames(spark)
    out = bucketed_range_lookup(pts, rng, "p", "s", "e", 100).collect()
    rows = {}
    for r in out:
        rows.setdefault(r["pid"], []).append(r["tag"])
    # every point exactly once unless genuinely multi-matched
    assert sorted(rows) == list(range(10))
    assert rows[8] == [None]          # 1000 matches nothing
    assert sorted(rows[5]) == ["b", "c"]   # overlap -> both memberships
    assert rows[0] == ["a"]


def test_bucket_width_validation(spark):
    pts, rng = _frames(spark)
    import pytest

    with pytest.raises(ValueError):
        bucketed_range_lookup(pts, rng, "p", "s", "e", 0)
    with pytest.raises(ValueError):
        bucketed_range_lookup(pts, rng, "p", "s", "e", 10, how="full")


def test_ip_range_lookup_matches_oracle(spark, sf_dir):
    from tests.oracle_utils import assert_match

    from simpy__kafka__flink__kafka_spark.plans import registry

    q = registry()["ip_range_lookup"]
    assert_match(q.build(spark, sf_dir), q.oracle, sf_dir,
                 "ip_range_lookup")
