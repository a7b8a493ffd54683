"""Skew-mitigation utilities for hot keys (SURVEY.md §4's known physical
pitfall: small IP pools make the containment join's equi-key skewed —
``/root/reference/simpy_message_generator.py:89-98``).

Three layers of defense, outermost first:

1. The band join (``operators/linking.py:link_edges_banded``) changes the
   join key itself — preferred when a range bound exists.
2. AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on in
   ``session.py``) — automatic for sort-merge joins.
3. Explicit salting (here) — for aggregations/joins where neither applies:
   append a random salt to the hot key, aggregate partially per salted key,
   then merge.  The two-phase shape is semantics-preserving for any
   commutative-associative aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """groupBy(key).count() resistant to hot keys: partial counts per
    (key, salt) then a cheap merge over ``salt_buckets`` rows per key."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("n"))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 16) -> DataFrame:
    """Hot-key equi-join for when the small side is too big to broadcast and
    AQE's skew split doesn't apply (e.g. the skewed side feeds a bucketed
    scan): salt the big side's rows uniformly, replicate the small side once
    per salt value, join on (key, salt).  Each hot key's rows spread over
    ``salt_buckets`` tasks at the cost of ``salt_buckets``x the small side's
    shuffle volume.  Semantics-preserving for any 1:N equi-join."""
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(replicated, [key, "_salt"]).drop("_salt")


def salted_agg(df: DataFrame, key: str, agg_col: Column, merge_col: Column,
               alias: str, salt_buckets: int = 16) -> DataFrame:
    """General two-phase salted aggregation: ``agg_col`` computes the partial
    per (key, salt); ``merge_col`` (over column name '_partial') merges
    partials per key."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(agg_col.alias("_partial"))
    return partial.groupBy(key).agg(merge_col.alias(alias))
