"""Relational operator coverage (SURVEY.md §2 "absent in reference, free with
Catalyst" rows) over the TPC-H-ish tables, each with a DuckDB oracle.

Float determinism: money aggregates are computed in integer cents
(``floor(x * 100)`` summed as BIGINT, divided back at the end).  Per-row
double products and ``floor`` are IEEE-identical across engines, and integer
sums are order-independent, so Spark's partial aggregation and DuckDB's
sequential aggregation hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import Query


from ..sources.tables import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _cents(col):
    return F.floor(col * 100).cast("long")


# --- TPC-H Q1-style pricing summary (groupBy/agg; map-side combine) ----------

def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(_cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
            (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base_price"),
            (F.sum(_cents(disc)) / 100.0).alias("sum_disc_price"),
            (F.sum(_cents(charge)) / 100.0).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(floor(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS sum_disc_price,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) / 100.0 AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-style: 3-way join + top-N (broadcast dim, deterministic limit) -------

def _q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg((F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("revenue"))
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


_TOP_REVENUE_ORDERS_SQL = """
SELECT o_orderkey,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# --- Q5-style: 6-way snowflake join ------------------------------------------

def _q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg((F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0).alias("revenue"))
    )


_REGION_REVENUE_SQL = """
SELECT r_name,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name
"""


# --- ranking window function: top part per brand by retail price -------------

def _q_topk_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


_TOPK_PER_BRAND_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rk
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part
)
WHERE rk <= 3
"""


# --- semi/anti join: customers with no orders --------------------------------

def _q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


_CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- rollup (grouping sets) ---------------------------------------------------

def _q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg((F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("revenue"),
             F.count(F.lit(1)).alias("n"))
    )


_ROLLUP_REVENUE_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- set operations -----------------------------------------------------------

def _q_brand_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    big = part.where(F.col("p_size") > 25).select("p_brand")
    cheap = part.where(F.col("p_retailprice") < 1200).select("p_brand")
    return big.intersect(cheap).union(
        big.exceptAll(big).select("p_brand")  # empty, keeps EXCEPT in the plan
    ).distinct()


_BRAND_SET_OPS_SQL = """
SELECT DISTINCT p_brand FROM (
  SELECT p_brand FROM part WHERE p_size > 25
  INTERSECT
  SELECT p_brand FROM part WHERE p_retailprice < 1200
)
"""


# --- manual pivot (conditional aggregation) ----------------------------------

def _q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
    )


_PIVOT_STATUS_SQL = """
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders
GROUP BY o_orderpriority
"""


# --- gap-based sessionization over events (session_window batch analog) ------

def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gap_ms = 30 * 60 * 1000
    with_new = ev.withColumn(
        "new_session",
        F.when((F.col("ts_ms") - F.lag("ts_ms").over(w)) > gap_ms, 1).otherwise(0),
    )
    with_sid = with_new.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return with_sid.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
    )


_SESSIONIZE_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
), flagged AS (
  SELECT user_id, event_id, ts_ms,
         CASE WHEN ts_ms - lag(ts_ms) OVER w > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
), sessions AS (
  SELECT user_id, ts_ms,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts_ms) AS session_start_ms,
       max(ts_ms) AS session_end_ms
FROM sessions
GROUP BY user_id, session_seq
"""


# --- tumbling daily window over events ---------------------------------------

def _q_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = 86_400_000
    return (
        ev.groupBy(((F.col("ts_ms") / day).cast("long") * day).alias("day_ms"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents(F.col("value"))) / 100.0).alias("sum_value"),
        )
    )


_TUMBLING_DAILY_SQL = """
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
       count(*) AS n,
       sum(CAST(floor(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1
"""


# --- outer join ---------------------------------------------------------------

def _q_supplier_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_items"))
    return (
        supp.join(per_supp, supp.s_suppkey == per_supp.l_suppkey, "full_outer")
        .select(
            F.coalesce("s_suppkey", "l_suppkey").alias("suppkey"),
            F.coalesce("s_name", F.lit("<none>")).alias("s_name"),
            F.coalesce("n_items", F.lit(0)).alias("n_items"),
        )
    )


_SUPPLIER_ORDER_COVERAGE_SQL = """
WITH per_supp AS (
  SELECT l_suppkey, count(*) AS n_items FROM lineitem GROUP BY 1
)
SELECT COALESCE(s_suppkey, l_suppkey) AS suppkey,
       COALESCE(s_name, '<none>') AS s_name,
       COALESCE(n_items, 0) AS n_items
FROM supplier
FULL OUTER JOIN per_supp ON s_suppkey = l_suppkey
"""


# --- correlated EXISTS subquery ----------------------------------------------

def _q_parts_with_cheap_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    cheap = li.where(F.col("l_discount") >= 0.09).select("l_partkey").distinct()
    return part.join(cheap, part.p_partkey == cheap.l_partkey, "left_semi").select(
        "p_partkey", "p_brand"
    )


_PARTS_WITH_CHEAP_SUPPLY_SQL = """
SELECT p_partkey, p_brand
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_discount >= 0.09)
"""


# --- scalar subquery ----------------------------------------------------------

def _q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    avg_cents = orders.agg(
        (F.sum(_cents(F.col("o_totalprice"))) / F.count(F.lit(1))).alias("a")
    )
    return (
        orders.crossJoin(F.broadcast(avg_cents))
        .where(_cents(F.col("o_totalprice")) > F.col("a"))
        .select("o_orderkey", "o_totalprice")
    )


_ABOVE_AVG_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE CAST(floor(o_totalprice * 100) AS BIGINT) >
      (SELECT sum(CAST(floor(o_totalprice * 100) AS BIGINT)) / count(*)
       FROM orders)
"""


# --- analytic window functions (lag/lead/ntile/cume_dist) --------------------

def _q_price_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_brand", "p_partkey",
        F.lag("p_partkey").over(w).alias("prev_part"),
        F.lead("p_partkey").over(w).alias("next_part"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_PRICE_ANALYTICS_SQL = """
SELECT p_brand, p_partkey,
       lag(p_partkey) OVER w AS prev_part,
       lead(p_partkey) OVER w AS next_part,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(cume_dist() OVER w, 6) AS cume
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
"""


# --- as-of join (time-aligned event enrichment) ------------------------------

def _q_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_ms"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts_ms").alias("ts_ms"), F.col("ts_ms").alias("click_ms")
    )
    return asof_join(errors, clicks, on="user_id", ts="ts_ms",
                     payload_cols=["click_ms"], suffix="")


_ASOF_LAST_CLICK_SQL = """
WITH ev AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
errors AS (SELECT event_id, user_id, ts_ms FROM ev WHERE event_type = 'error'),
clicks AS (SELECT user_id, ts_ms, ts_ms AS click_ms FROM ev WHERE event_type = 'click')
SELECT e.event_id, e.user_id, e.ts_ms, c.click_ms
FROM errors e
ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts_ms >= c.ts_ms
"""


def _q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style single-pass table profile of ``orders``: per-column
    row/null/distinct counts and min/max (timestamps as epoch ms, so the
    cross-engine comparison never touches date formatting).  See
    functions/profiling.py for the one-aggregation plan shape."""
    from ..functions.profiling import profile_table

    return profile_table(
        _t(spark, sf_dir, "orders"),
        numeric_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        string_cols=["o_orderstatus", "o_orderpriority"],
        ts_cols=["o_orderdate"],
    )


_PROFILE_ORDERS_SQL = """
SELECT 'o_orderkey' AS column, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       round(CAST(min(o_orderkey) AS DOUBLE), 6) AS min_num,
       round(CAST(max(o_orderkey) AS DOUBLE), 6) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       round(CAST(min(o_custkey) AS DOUBLE), 6),
       round(CAST(max(o_custkey) AS DOUBLE), 6), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT CAST(o_totalprice AS DOUBLE)) AS BIGINT),
       round(CAST(min(o_totalprice) AS DOUBLE), 6),
       round(CAST(max(o_totalprice) AS DOUBLE), 6), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT epoch_ms(o_orderdate)) AS BIGINT),
       round(CAST(min(epoch_ms(o_orderdate)) AS DOUBLE), 6),
       round(CAST(max(epoch_ms(o_orderdate)) AS DOUBLE), 6), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       NULL, NULL, min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       NULL, NULL, min(o_orderpriority), max(o_orderpriority)
FROM orders
"""




def _q_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill/resampling of the event series per user
    (operators/timeseries.py:gap_fill): LOCF + integer-exact linear
    interpolation onto the hour grid between each user's first and last
    event.  One window exchange; the DuckDB oracle mirrors the unioned
    two-frame window arithmetic exactly."""
    from ..operators.timeseries import gap_fill

    return gap_fill(_t(spark, sf_dir, "events"), grid_ms=3_600_000)


_GAP_FILL_SQL = """
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS t,
         CAST(floor(value * 1000000) AS BIGINT) AS v
  FROM events
),
b AS (SELECT user_id, min(t) AS t0, max(t) AS t1 FROM e GROUP BY 1),
g AS (
  SELECT user_id,
         unnest(generate_series(((t0 + 3599999) // 3600000) * 3600000,
                                (t1 // 3600000) * 3600000, 3600000)) AS t
  FROM b
  WHERE ((t0 + 3599999) // 3600000) * 3600000 <= (t1 // 3600000) * 3600000
),
pts AS (
  SELECT user_id, t, 0 AS kind, v FROM e
  UNION ALL
  SELECT user_id, t, 1, NULL FROM g
),
wnd AS (
  SELECT user_id, t, kind,
         last_value(v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN kind = 0 THEN t END IGNORE NULLS)
           OVER wp AS pt,
         first_value(v IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN kind = 0 THEN t END IGNORE NULLS)
           OVER wn AS nt
  FROM pts
  WINDOW wp AS (PARTITION BY user_id ORDER BY t, kind, v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY t, kind, v
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, t AS grid_ts,
       CAST(pv AS BIGINT) AS locf_scaled,
       CAST(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
                 THEN pv + ((nv - pv) * (t - pt)) // (nt - pt)
                 ELSE COALESCE(pv, nv) END AS BIGINT) AS interp_scaled
FROM wnd WHERE kind = 1
"""


def _q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over per-user hourly event
    rates (operators/timeseries.py:rolling_zscore_anomalies): each
    bucket scored against its trailing-24-bucket history with the
    division-free integer z-test, so the row is hash-exact against the
    identical DuckDB arithmetic."""
    from ..operators.timeseries import rolling_zscore_anomalies

    return rolling_zscore_anomalies(_t(spark, sf_dir, "events"),
                                    grid_ms=3_600_000, window=24,
                                    min_history=8, z_threshold=3)


def z_anomaly_select(src: str, key: str, window: int = 24,
                     min_history: int = 8, z_threshold: int = 3) -> str:
    """ONE SQL rendering of the division-free integer z algebra
    (operators/timeseries.py:score_bucket_counts) over pre-bucketed
    counts — ``src`` must provide ({key}, bucket_ts, x) rows.  Shared
    by the hourly_anomalies oracle and the crawl_backoff_schedule
    oracle (the one-rendering discipline: a z-algebra change may not
    drift between the two), and the saturation cap comes from the SAME
    derivation the Spark engine uses (derive_count_cap — round-12
    review fix: an independently-defaulted cap diverged for any
    non-default window)."""
    from ..operators.timeseries import derive_count_cap

    cap = derive_count_cap(window, z_threshold)
    return f"""
SELECT {key}, bucket_ts, x AS n_events, n AS n_hist,
       CAST(((xc * n - s) * (xc * n - s) * 10000)
            // greatest(n * q - s * s, 1) AS BIGINT) AS z2_scaled,
       CAST(CASE WHEN (xc * n - s) * (xc * n - s)
                      > {int(z_threshold) ** 2} * (n * q - s * s)
                 THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
FROM (
  SELECT {key}, bucket_ts, x, xc,
         COALESCE(sum(xc) OVER h, 0) AS s,
         COALESCE(sum(xc * xc) OVER h, 0) AS q,
         CAST(count(*) OVER h AS BIGINT) AS n
  FROM (SELECT {key}, bucket_ts, x, least(x, {int(cap)}) AS xc
        FROM {src})
  WINDOW h AS (PARTITION BY {key} ORDER BY bucket_ts
               ROWS BETWEEN {int(window)} PRECEDING AND 1 PRECEDING)
) WHERE n >= {int(min_history)}
"""


_HOURLY_ANOMALIES_SQL = f"""
WITH c AS (
  SELECT user_id, (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ts,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
)
{z_anomaly_select("c", "user_id")}
"""


QUERIES: dict[str, Query] = {
    "price_analytics": Query(_q_price_analytics, _PRICE_ANALYTICS_SQL,
                             "lag/lead/ntile/cume_dist analytic windows"),
    "profile_orders": Query(_q_profile_orders, _PROFILE_ORDERS_SQL,
                            "deequ-style single-pass per-column table audit"),
    "asof_last_click": Query(_q_asof_last_click, _ASOF_LAST_CLICK_SQL,
                             "as-of join: latest click at/before each error"),
    "supplier_order_coverage": Query(_q_supplier_order_coverage,
                                     _SUPPLIER_ORDER_COVERAGE_SQL,
                                     "full outer join with coalesced sides"),
    "parts_with_cheap_supply": Query(_q_parts_with_cheap_supply,
                                     _PARTS_WITH_CHEAP_SUPPLY_SQL,
                                     "correlated EXISTS as left-semi join"),
    "above_avg_orders": Query(_q_above_avg_orders, _ABOVE_AVG_ORDERS_SQL,
                              "scalar subquery (broadcast aggregate)"),
    "pricing_summary": Query(_q_pricing_summary, _PRICING_SUMMARY_SQL,
                             "TPC-H Q1-style grouped aggregation"),
    "top_revenue_orders": Query(_q_top_revenue_orders, _TOP_REVENUE_ORDERS_SQL,
                                "Q3-style join + deterministic top-N"),
    "region_revenue": Query(_q_region_revenue, _REGION_REVENUE_SQL,
                            "Q5-style snowflake join with broadcast dims"),
    "topk_per_brand": Query(_q_topk_per_brand, _TOPK_PER_BRAND_SQL,
                            "ranking window function"),
    "customers_without_orders": Query(_q_customers_without_orders,
                                      _CUSTOMERS_WITHOUT_ORDERS_SQL, "anti join"),
    "rollup_revenue": Query(_q_rollup_revenue, _ROLLUP_REVENUE_SQL, "rollup"),
    "brand_set_ops": Query(_q_brand_set_ops, _BRAND_SET_OPS_SQL, "intersect/except"),
    "pivot_status": Query(_q_pivot_status, _PIVOT_STATUS_SQL, "conditional-agg pivot"),
    "gap_fill_hourly": Query(_q_gap_fill_hourly, _GAP_FILL_SQL,
                             "per-user hourly resampling: LOCF + "
                             "integer-exact linear interpolation"),
    "hourly_anomalies": Query(_q_hourly_anomalies, _HOURLY_ANOMALIES_SQL,
                              "rolling z-score burst detection over "
                              "hourly event rates (division-free "
                              "integer z-test)"),
    "sessionize_events": Query(_q_sessionize, _SESSIONIZE_SQL,
                               "gap-based sessionization (session_window analog)"),
    "tumbling_daily": Query(_q_tumbling_daily, _TUMBLING_DAILY_SQL,
                            "tumbling window aggregation"),
}
