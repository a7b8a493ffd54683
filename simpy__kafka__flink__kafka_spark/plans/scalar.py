"""Scalar-function and remaining small-operator coverage (SURVEY.md §2.6
F1-F5, R2 serialize, A3 counter, W5 late-data) — each a declared query with a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..schemas import MESSAGES_SQL_DUCKDB, messages_from_events
from . import Query

_MSGS = f"messages AS ({MESSAGES_SQL_DUCKDB})"


# --- R2: JSON serialization of the linked record shape -----------------------
# Safe cross-engine because every double in the view is small-integral
# (Spark prints 1e20 as 1.0E20, DuckDB as 10...0.0 — large magnitudes would
# diverge; latency_msec <= 60000.0 never does).

def _q_serialize_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = messages_from_events(spark, sf_dir)
    empty = F.array().cast("array<string>")
    return msgs.select(
        "id",
        F.to_json(
            F.struct(
                "id", "src_ip", "dst_ip", "start_at_ms", "latency_msec",
                "end_at_ms",
                empty.alias("parents"), empty.alias("children"),
            )
        ).alias("msg_json"),
    )


_SERIALIZE_JSON_SQL = f"""
WITH {_MSGS}
SELECT id,
       to_json(struct_pack(
         id := id, src_ip := src_ip, dst_ip := dst_ip,
         start_at_ms := start_at_ms, latency_msec := latency_msec,
         end_at_ms := end_at_ms,
         parents := CAST([] AS VARCHAR[]),
         children := CAST([] AS VARCHAR[])
       )) AS msg_json
FROM messages
"""


# --- F2: timestamp arithmetic + the end=start+latency invariant --------------

def _q_timestamp_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = messages_from_events(spark, sf_dir)
    return msgs.select(
        "id",
        (F.col("end_at_ms") - F.col("start_at_ms")).alias("duration_ms"),
        (
            F.col("end_at_ms")
            == F.col("start_at_ms") + F.col("latency_msec").cast("long")
        ).alias("invariant_ok"),
    )


_TIMESTAMP_ARITH_SQL = f"""
WITH {_MSGS}
SELECT id,
       end_at_ms - start_at_ms AS duration_ms,
       end_at_ms = start_at_ms + CAST(latency_msec AS BIGINT) AS invariant_ok
FROM messages
"""


# --- F3: string formatting (id/IP synthesis patterns) ------------------------

def _q_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.format_string(
            "%s-%03d", F.col("l_returnflag"), F.col("l_linenumber")
        ).alias("tag"),
        F.concat(F.lit("ord_"), F.col("l_orderkey").cast("string")).alias("okey"),
    ).distinct()


_STRING_FORMAT_SQL = """
SELECT DISTINCT printf('%s-%03d', l_returnflag, l_linenumber) AS tag,
       'ord_' || CAST(l_orderkey AS VARCHAR) AS okey
FROM lineitem
"""


# --- F5: membership / dedup-on-append checks ---------------------------------

def _q_array_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gate-facing projection serializes the array (the driver's canonicalizer
    # cannot hash array cells): flags is array_sort-ed, so concat_ws is a
    # deterministic string twin of the list.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_returnflag")).alias("flags"))
        .select(
            "l_orderkey",
            F.concat_ws(",", "flags").alias("flags"),
            F.array_contains("flags", "R").alias("has_return"),
            F.size("flags").cast("long").alias("n_flags"),
        )
    )


_ARRAY_MEMBERSHIP_SQL = """
SELECT l_orderkey,
       COALESCE(array_to_string(list_sort(list(DISTINCT l_returnflag)), ','), '')
         AS flags,
       list_contains(list_sort(list(DISTINCT l_returnflag)), 'R') AS has_return,
       len(list(DISTINCT l_returnflag)) AS n_flags
FROM lineitem
GROUP BY l_orderkey
"""


# --- A3: monotonically increasing id synthesis (global counter) --------------
# Inherently a global sequence (the reference used one process-wide counter,
# simpy_message_generator.py:192-197); expressed as a window over arrival
# order.  DECLARED AT FIXED ORACLE SCALE ONLY: a global row_number is a
# single-partition sort.  The scale-safe twin is ``counter_ids_sharded``
# below (range-partitioned offsets, operators/sequences.py), same oracle.

def _q_counter_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import read_events

    ev = read_events(spark, sf_dir)
    w = W.orderBy("event_id")
    return ev.select(
        "event_id",
        F.concat(F.lit("msg_"), F.row_number().over(w).cast("string")).alias("seq_id"),
    )


_COUNTER_IDS_SQL = """
SELECT event_id,
       'msg_' || CAST(row_number() OVER (ORDER BY event_id) AS VARCHAR) AS seq_id
FROM events
"""


# --- W5: late-data identification (arrival-order watermark) ------------------
# Fixed-oracle-scale form; scale-safe twin: late_data_sharded below.

def _q_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = messages_from_events(spark, sf_dir)
    seq = F.substring("id", 5, 18).cast("long")
    w = W.orderBy(seq).rowsBetween(W.unboundedPreceding, -1)
    wm = F.max("start_at_ms").over(w) - F.lit(30_000)
    return msgs.select(
        "id",
        F.coalesce(wm > F.col("end_at_ms"), F.lit(False)).alias("is_late"),
    )


_LATE_DATA_SQL = f"""
WITH {_MSGS}
SELECT id,
       COALESCE(max(start_at_ms) OVER (ORDER BY CAST(substr(id, 5) AS BIGINT)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 30000
                > end_at_ms, false) AS is_late
FROM messages
"""


# --- scale-safe twins of the global sequences --------------------------------
# Same semantics and same oracles as counter_ids / watermark_running_max /
# late_data_flag, but no unpartitioned window over the data: range
# repartition + partition-local windows + broadcast partition offsets
# (operators/sequences.py).  These are the forms that survive 100x.

def _q_counter_ids_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequences import ranged_row_number
    from ..sources.tables import read_events

    ev = read_events(spark, sf_dir).select("event_id")
    return ranged_row_number(ev, ["event_id"], out_col="seq").select(
        "event_id",
        F.concat(F.lit("msg_"), F.col("seq").cast("string")).alias("seq_id"),
    )


def _q_watermark_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequences import ranged_prefix_max

    msgs = messages_from_events(spark, sf_dir).select("id", "start_at_ms")
    out = ranged_prefix_max(msgs, ["start_at_ms", "id"], "start_at_ms",
                            out_col="run_max")
    return out.select(
        "id", "start_at_ms",
        (F.col("run_max") - F.lit(30_000)).alias("watermark_ms"),
    )


def _q_late_data_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequences import ranged_prefix_max

    msgs = messages_from_events(spark, sf_dir).select(
        "id", "start_at_ms", "end_at_ms",
        F.substring("id", 5, 18).cast("long").alias("seq"),
    )
    out = ranged_prefix_max(msgs, ["seq"], "start_at_ms",
                            out_col="wm_max", exclusive=True)
    return out.select(
        "id",
        F.coalesce(
            F.col("wm_max") - F.lit(30_000) > F.col("end_at_ms"), F.lit(False)
        ).alias("is_late"),
    )


# same oracle semantics as trace.py's _WATERMARK_SQL (A2)
_WATERMARK_SHARDED_SQL = f"""
WITH {_MSGS}
SELECT id, start_at_ms,
       max(start_at_ms) OVER (ORDER BY start_at_ms, id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       - 30000 AS watermark_ms
FROM messages
"""


# --- cube (grouping sets beyond rollup) --------------------------------------

def _q_cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("l_quantity") * 100).cast("long")) / 100.0).alias("qty"),
    )


_CUBE_QTY_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       sum(CAST(floor(l_quantity * 100) AS BIGINT)) / 100.0 AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- exact + approximate distinct counting -----------------------------------

def _q_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


_DISTINCT_PARTS_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
FROM lineitem
GROUP BY l_returnflag
"""


def _q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HLL sketches differ across engines -> declared rows-only (no oracle);
    # the exact variant above is the hash-checked twin.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


def _q_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # numpy/BLAS summation order differs from the sequential fold at ~1e-15;
    # exact hash-compare at a threshold boundary would be flaky -> rows-only.
    # Equivalence to the oracle-checked fold form is asserted in
    # tests/test_similarity_blocked.py.
    from ..functions.similarity import embedding_near_dup_blocked

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup_blocked(emb, threshold=0.92)


def _q_ml_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only: ml LSH hash tables are seed/impl-specific (see docstring)
    from ..functions.similarity import ml_lsh_neighbors

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ml_lsh_neighbors(emb)


QUERIES: dict[str, Query] = {
    "ml_lsh_neighbors": Query(_q_ml_lsh_neighbors, None,
                              "pyspark.ml BucketedRandomProjectionLSH ANN"),
    "serialize_json": Query(_q_serialize_json, _SERIALIZE_JSON_SQL,
                            "R2 row->JSON serialization"),
    "timestamp_arith": Query(_q_timestamp_arith, _TIMESTAMP_ARITH_SQL,
                             "F2 duration + end=start+latency invariant"),
    "string_format": Query(_q_string_format, _STRING_FORMAT_SQL,
                           "F3 printf-style formatting"),
    "array_membership": Query(_q_array_membership, _ARRAY_MEMBERSHIP_SQL,
                              "F5 membership/dedup checks"),
    "counter_ids": Query(_q_counter_ids, _COUNTER_IDS_SQL,
                         "A3 global monotonically increasing ids"),
    "late_data_flag": Query(_q_late_data, _LATE_DATA_SQL,
                            "W5 late-past-watermark identification"),
    "counter_ids_sharded": Query(_q_counter_ids_sharded, _COUNTER_IDS_SQL,
                                 "A3 scale-safe: range-partitioned offsets"),
    "watermark_sharded": Query(_q_watermark_sharded, _WATERMARK_SHARDED_SQL,
                               "A2 scale-safe: partitioned prefix max"),
    "late_data_sharded": Query(_q_late_data_sharded, _LATE_DATA_SQL,
                               "W5 scale-safe: partitioned exclusive prefix max"),
    "cube_qty": Query(_q_cube_qty, _CUBE_QTY_SQL, "cube grouping sets"),
    "distinct_parts": Query(_q_distinct_parts, _DISTINCT_PARTS_SQL,
                            "exact multi-column distinct counts"),
    "approx_distinct_parts": Query(_q_approx_distinct, None,
                                   "HLL approx distinct (rows-only)"),
    "embedding_near_dup_blocked": Query(_q_near_dup_blocked, None,
                                        "blocked-matmul near-dup scale path"),
}
