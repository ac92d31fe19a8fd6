"""OLAP-shape catalog entries: multi-level aggregation (ROLLUP / grouping
sets), pivot, correlated scalar subqueries, semi joins and group-filtered
aggregation (HAVING). These widen the relational surface beyond the
reference's own query shapes with classic warehouse plans the engine must
also serve at 100 TB.

Scale notes: rollup/cube are single-shuffle multi-level aggregates (Spark
expands grouping sets map-side); pivot with an explicit value list is one
shuffle with conditional aggregation (never a second scan); the correlated
Q17-style subquery is expressed as a per-key aggregate + equi-join, which is
exactly Catalyst's decorrelation and keeps both sides shuffle-partitioned on
the join key; semi joins never multiply rows, so their output stays small
regardless of match fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from enterprise_warp_spark.queries import _davg, _dec, _dsum, register
from enterprise_warp_spark.tables import table


@register(
    "rollup_order_volume",
    """
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INTEGER) AS gid,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,2))) AS DOUBLE), 2) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP multi-level aggregate: (priority, status) -> priority -> grand "
    "total in ONE shuffle (grouping-set expansion is map-side).",
)
def rollup_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("o_totalprice", 19, 2).alias("total"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n",
            "total",
        )
    )


@register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority AS priority,
           COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (o_orderstatus = 'P') AS n_pending,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,2))) FILTER (o_orderstatus = 'F') AS DOUBLE), 2) AS filled_total
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot with an explicit value list == one-shuffle conditional "
    "aggregation (no per-value scan).",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        F.round(
            F.sum(
                F.when(F.col("o_orderstatus") == "F", _dec("o_totalprice", 19, 2))
            ).cast("double"),
            2,
        ).alias("filled_total"),
    )


@register(
    "q17_small_quantity_parts",
    """
    WITH pa AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           COUNT(*) AS n_small,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,2))) AS DOUBLE), 2) AS small_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.l_partkey = lineitem.l_partkey
    WHERE l_quantity < half_avg
    GROUP BY p_brand
    """,
    doc="Q17 shape — correlated scalar subquery (per-part avg quantity) "
    "decorrelated to aggregate + equi-join on the correlation key.",
)
def q17_small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    pa = l.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(pa.withColumnRenamed("l_partkey", "pa_partkey"),
              F.col("pa_partkey") == l["l_partkey"])
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            _dsum("l_extendedprice", 19, 2).alias("small_revenue"),
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT o_orderkey, o_orderdate,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS total_price,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(l_quantity) > 210
    """,
    doc="Q18 shape — HAVING on a post-join aggregate (large-volume orders).",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        o.join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 210)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("total_price"),
            "sum_qty",
        )
    )


@register(
    "semi_join_returned_orders",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="EXISTS == LEFT SEMI join: match test without row multiplication "
    "(the complement of anti_join_lineitem).",
)
def semi_join_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "cube_status_priority",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE: all 4 grouping combinations in one Expand + one shuffle.",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().cast("int").alias("gid"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n",
        )
    )


@register(
    "distinct_users_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
    doc="Exact COUNT DISTINCT per day (Catalyst expands to a two-phase "
    "partial-distinct aggregate — no driver-side dedup).",
)
def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "running_revenue_by_priority",
    """
    WITH d AS (
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             SUM(CAST(o_totalprice AS DECIMAL(19,2))) AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT priority, month,
           ROUND(CAST(SUM(rev) OVER (PARTITION BY priority ORDER BY month
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2)
             AS cum_revenue
    FROM d
    """,
    doc="Cumulative (running-total) window over a pre-aggregated monthly "
    "series: the window sees #months rows per priority, never the raw fact "
    "table — the scalable shape for running totals.",
)
def running_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
    ).agg(F.sum(_dec("o_totalprice", 19, 2)).alias("rev"))
    w = (
        Window.partitionBy("priority")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "priority",
        "month",
        F.round(F.sum("rev").over(w).cast("double"), 2).alias("cum_revenue"),
    )


@register(
    "q22_idle_high_balance_customers",
    """
    WITH avg_bal AS (
      SELECT AVG(CAST(c_acctbal AS DECIMAL(19,2))) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           COUNT(*) AS n_custs,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(19,2))) AS DOUBLE), 2) AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    doc="Q22 shape — scalar aggregate subquery (global avg balance, computed "
    "once and broadcast as a 1-row cross join) + anti join (customers with "
    "no orders).",
)
def q22_idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg(_dec("c_acctbal", 19, 2)).alias("ab"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            _dsum("c_acctbal", 19, 2).alias("total_bal"),
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,2))
                             * (1 - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE), 2)
               AS total_revenue
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="Q15 shape — aggregate view + MAX-of-aggregate scalar subquery "
    "(tie-safe: every supplier at the max). The 1-row max is a broadcast, "
    "not a driver collect.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.round(
            F.sum(
                _dec("l_extendedprice", 19, 2) * (F.lit(1) - _dec("l_discount", 5, 4))
            ).cast("double"),
            2,
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q13_customer_order_distribution",
    """
    WITH c AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c GROUP BY c_count
    """,
    doc="Q13 shape — left outer join preserving customers with zero orders, "
    "then a distribution over the per-customer counts.",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o["o_custkey"] == c["c_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
