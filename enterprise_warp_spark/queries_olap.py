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
    "grouping_sets_orders",
    """
    SELECT 'rollup' AS op,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INTEGER) AS gid,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,2))) AS DOUBLE), 2) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    UNION ALL
    SELECT 'cube' AS op,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(19,2))) AS DOUBLE), 2) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'set_intersect' AS op, '' AS priority, '' AS status,
           CAST(nationkey AS INTEGER) AS gid, CAST(1 AS BIGINT) AS n,
           CAST(0.0 AS DOUBLE) AS total
    FROM (SELECT c_nationkey AS nationkey FROM customer
          INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'set_union' AS op, '' AS priority, '' AS status,
           CAST(nationkey AS INTEGER) AS gid, CAST(1 AS BIGINT) AS n,
           CAST(0.0 AS DOUBLE) AS total
    FROM (SELECT c_nationkey AS nationkey FROM customer
          UNION SELECT s_nationkey FROM supplier)
    """,
    doc="ROLLUP multi-level aggregate ((priority, status) -> priority -> grand "
    "total) + CUBE (all 4 grouping combinations), each ONE Expand + one "
    "shuffle, tag-discriminated in one gate; plus the former nation_set_ops "
    "branches — X1 set intersection (repeated covm parameter names, "
    "results.py:563-566) and X2 set union with dedup (noise-term list union, "
    "enterprise_warp.py:643) — folded in under the driver artifact's "
    "50-entry cap (r6 verdict Next #1).",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )

    def _set_branch(tag: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(tag).alias("op"),
            F.lit("").alias("priority"),
            F.lit("").alias("status"),
            F.col("nationkey").cast("int").alias("gid"),
            F.lit(1).cast("long").alias("n"),
            F.lit(0.0).alias("total"),
        )

    sets = _set_branch("set_intersect", c.intersect(s)).unionByName(
        _set_branch("set_union", c.union(s).distinct())
    )
    rolled = (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("o_totalprice", 19, 2).alias("total"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select(
            F.lit("rollup").alias("op"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n",
            "total",
        )
    )
    cubed = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("o_totalprice", 19, 2).alias("total"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select(
            F.lit("cube").alias("op"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n",
            "total",
        )
    )
    return rolled.unionByName(cubed).unionByName(sets)


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
    "q14_q17_part_stats",
    """
    WITH pa AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT 'q17_small_qty' AS op, p_brand AS k,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,2))) AS DOUBLE), 2) AS v
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.l_partkey = lineitem.l_partkey
    WHERE l_quantity < half_avg
    GROUP BY p_brand
    UNION ALL
    SELECT 'q14_promo_share' AS op, '' AS k, COUNT(*) AS n,
           ROUND(
      ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice AS DECIMAL(19,2)) * CAST(1-l_discount AS DECIMAL(8,6))
            ELSE CAST(0 AS DECIMAL(19,2)) END) AS DOUBLE), 2) * 100 /
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,2)) * CAST(1-l_discount AS DECIMAL(8,6))) AS DOUBLE), 2),
      6) AS v
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
    doc="Q17 shape (correlated scalar subquery decorrelated to aggregate + "
    "equi-join on the correlation key) + Q14 shape (conditional aggregation "
    "share over a join), tag-discriminated in one gate.",
)
def q14_q17_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    pa = l.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    q17 = (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(pa.withColumnRenamed("l_partkey", "pa_partkey"),
              F.col("pa_partkey") == l["l_partkey"])
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("l_extendedprice", 19, 2).alias("v"),
        )
        .select(
            F.lit("q17_small_qty").alias("op"), F.col("p_brand").alias("k"), "n", "v"
        )
    )
    li14 = l.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast(DecimalType(19, 2)) * (
        F.lit(1.0) - F.col("l_discount")
    ).cast(DecimalType(8, 6))
    zero = F.lit(0).cast(DecimalType(19, 2))
    q14 = (
        li14.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.round(
                    F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                        "double"
                    ),
                    2,
                )
                * 100
                / F.round(F.sum(rev).cast("double"), 2),
                6,
            ).alias("v"),
        )
        .select(F.lit("q14_promo_share").alias("op"), F.lit("").alias("k"), "n", "v")
    )
    return q17.unionByName(q14)


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
    "semi_join_order_priority",
    """
    SELECT 'returned' AS op, o_orderpriority AS priority, COUNT(*) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'q4_late_ship' AS op, o_orderpriority AS priority, COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="EXISTS == LEFT SEMI join without row multiplication, two variants "
    "tag-discriminated: returned-order membership (complement of "
    "anti_join_lineitem) and TPC-H Q4's date-windowed late-shipment test "
    "(non-equi semi-join condition).",
)
def semi_join_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    returned = (
        o.join(
            l.filter(F.col("l_returnflag") == "R"),
            o["o_orderkey"] == l["l_orderkey"],
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("returned").alias("op"),
            F.col("o_orderpriority").alias("priority"),
            "n",
        )
    )
    o4 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = l.select("l_orderkey", "l_shipdate")
    q4 = (
        o4.join(
            li,
            (o4.o_orderkey == li.l_orderkey) & (li.l_shipdate > o4.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("q4_late_ship").alias("op"),
            F.col("o_orderpriority").alias("priority"),
            "n",
        )
    )
    return returned.unionByName(q4)


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


@register(
    "q7_q8_q10_trade_stats",
    """
    WITH rev AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, l_returnflag,
             CAST(l_extendedprice AS DECIMAL(19,2))
               * CAST(1 - l_discount AS DECIMAL(8,6)) AS r
      FROM lineitem
    ),
    q7 AS (
      SELECT sn.n_name AS k1,
             cn.n_name || ':' || CAST(year(l_shipdate) AS VARCHAR) AS k2,
             COUNT(*) AS n, ROUND(CAST(SUM(r) AS DOUBLE), 2) AS v
      FROM rev
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE sn.n_name IN ('NATION_1', 'NATION_2')
        AND cn.n_name IN ('NATION_1', 'NATION_2')
        AND sn.n_name <> cn.n_name
        AND year(l_shipdate) IN (1996, 1997)
      GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    ),
    q8 AS (
      SELECT 'NATION_3_share' AS k1, CAST(year(o_orderdate) AS VARCHAR) AS k2,
             COUNT(*) AS n,
             ROUND(COALESCE(ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                                               THEN r END) AS DOUBLE), 2), 0.0)
                   / ROUND(CAST(SUM(r) AS DOUBLE), 2), 6) AS v
      FROM rev
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE cn.n_regionkey = (SELECT n_regionkey FROM nation
                              WHERE n_name = 'NATION_3')
      GROUP BY year(o_orderdate)
    ),
    q10 AS (
      SELECT c_name AS k1, cn.n_name AS k2,
             COUNT(*) AS n, ROUND(CAST(SUM(r) AS DOUBLE), 2) AS v
      FROM rev
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY c_name, cn.n_name
      ORDER BY v DESC, k1 LIMIT 20
    )
    SELECT 'q7_volume' AS op, * FROM q7
    UNION ALL SELECT 'q8_share' AS op, * FROM q8
    UNION ALL SELECT 'q10_returns' AS op, * FROM q10
    """,
    doc="Q7 shape (cross-nation trade volume: double nation join, year "
    "extraction) + Q8 shape (market share: conditional aggregation over a "
    "region-scoped 6-way join, scalar-subquery region lookup) + Q10 shape "
    "(returned-item revenue, deterministic top-20 via rounded-value + name "
    "ordering), tag-discriminated in one gate.",
)
def q7_q8_q10_trade_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")

    rev = l.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "l_returnflag",
        (
            F.col("l_extendedprice").cast(DecimalType(19, 2))
            * (F.lit(1.0) - F.col("l_discount")).cast(DecimalType(8, 6))
        ).alias("r"),
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("cn_rk"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    # shared 6-way join spine: lineitem revenue -> orders -> customer -> its
    # nation, and lineitem -> supplier -> its nation. Nation (25 rows) and
    # supplier are broadcast; the lineitem-orders join is the only big
    # shuffle and both q7/q8 reuse this one spine.
    spine = (
        rev.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
    )
    dsum = lambda col: F.round(F.sum(col).cast("double"), 2)  # noqa: E731

    q7 = (
        spine.filter(
            F.col("supp_nation").isin("NATION_1", "NATION_2")
            & F.col("cust_nation").isin("NATION_1", "NATION_2")
            & (F.col("supp_nation") != F.col("cust_nation"))
            & F.year("l_shipdate").isin(1996, 1997)
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("r").alias("v"))
        .select(
            F.lit("q7_volume").alias("op"),
            F.col("supp_nation").alias("k1"),
            F.concat_ws(":", "cust_nation", "yr").alias("k2"),
            "n",
            "v",
        )
    )
    target_rk = n.filter(F.col("n_name") == "NATION_3").select(
        F.col("n_regionkey").alias("target_rk")
    )
    q8 = (
        spine.join(F.broadcast(target_rk), F.col("cn_rk") == F.col("target_rk"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.coalesce(
                    dsum(F.when(F.col("supp_nation") == "NATION_3", F.col("r"))),
                    F.lit(0.0),
                )
                / dsum("r"),
                6,
            ).alias("v"),
        )
        .select(
            F.lit("q8_share").alias("op"),
            F.lit("NATION_3_share").alias("k1"),
            F.col("yr").cast("string").alias("k2"),
            "n",
            "v",
        )
    )
    q10 = (
        rev.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .groupBy("c_name", "cust_nation")
        .agg(F.count(F.lit(1)).alias("n"), dsum("r").alias("v"))
        .orderBy(F.col("v").desc(), F.col("c_name"))
        .limit(20)
        .select(
            F.lit("q10_returns").alias("op"),
            F.col("c_name").alias("k1"),
            F.col("cust_nation").alias("k2"),
            "n",
            "v",
        )
    )
    return q7.unionByName(q8).unionByName(q10)
