"""Additional catalog entries completing SURVEY §2 operator-id coverage in
the oracle gate: A10 (per-backend error stats), J3 (lookup with universal
fallback), J4 (dict merge with list union), P4 (substring column selection),
P8/P9 (regex name predicates)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from enterprise_warp_spark.queries import register
from enterprise_warp_spark.tables import table


@register(
    "rms_by_type",
    """
    SELECT event_type,
           ROUND(SQRT(CAST(SUM(CAST(value*value AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*)), 6) AS rms,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(14,6))) AS DOUBLE) / COUNT(*), 6) AS mean
    FROM events GROUP BY event_type
    """,
    doc="A10 per-backend RMS + mean of errors (libstempo_warp.py:93-98).",
)
def rms_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    ev = table(spark, sf_dir, "events")
    v2 = (F.col("value") * F.col("value")).cast(DecimalType(20, 8))
    v = F.col("value").cast(DecimalType(14, 6))
    return ev.groupBy("event_type").agg(
        F.round(
            F.sqrt(F.sum(v2).cast("double") / F.count(F.lit(1))), 6
        ).alias("rms"),
        F.round(F.sum(v).cast("double") / F.count(F.lit(1)), 6).alias("mean"),
    )


@register(
    "coalesce_rate_lookup",
    """
    SELECT n.n_name, COALESCE(r.rate, CAST(0.05 AS DOUBLE)) AS rate, COUNT(*) AS n_customers
    FROM nation n
    LEFT JOIN (VALUES ('NATION_3', CAST(0.1 AS DOUBLE)), ('NATION_7', CAST(0.2 AS DOUBLE))) r(nname, rate)
      ON n.n_name = r.nname
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    doc="J3 per-key lookup with universal fallback (noisemodel[psr] else universal).",
)
def coalesce_rate_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    # Arrow path (LocalTableScan), not RDD-parallelize over 32 slices
    rates = spark.createDataFrame(
        pd.DataFrame({"nname": ["NATION_3", "NATION_7"], "rate": [0.1, 0.2]})
    )
    return (
        nation.join(F.broadcast(rates), nation.n_name == rates.nname, "left")
        .withColumn("rate", F.coalesce(F.col("rate"), F.lit(0.05)))
        .join(cust, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "rate")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "flag_union_merge",
    """
    WITH a AS (
      SELECT user_id, list_sort(list_distinct(list(event_type))) AS s1
      FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY user_id
    ),
    b AS (
      SELECT user_id, list_sort(list_distinct(list(event_type))) AS s2
      FROM events WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY user_id
    )
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           array_to_string(list_sort(list_distinct(
             COALESCE(a.s1, CAST([] AS VARCHAR[])) || COALESCE(b.s2, CAST([] AS VARCHAR[]))
           )), ',') AS merged
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    doc="J4 dict merge with list-union semantics (merge_two_noise_model_dicts).",
)
def flag_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    a = (
        ev.filter(F.col("ts") < cut)
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("s1"))
    )
    b = (
        ev.filter(F.col("ts") >= cut)
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("s2"))
    )
    return (
        a.join(b, "user_id", "full_outer")
        .select(
            "user_id",
            F.array_join(
                F.sort_array(
                    F.array_distinct(
                        F.concat(
                            F.coalesce(F.col("s1"), F.expr("array()")),
                            F.coalesce(F.col("s2"), F.expr("array()")),
                        )
                    )
                ),
                ",",
            ).alias("merged"),
        )
    )


@register(
    "par_substring_select",
    """
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE event_type LIKE '%ck%' OR event_type LIKE '%error%'
    GROUP BY event_type
    """,
    doc="P4 column selection by name-substring patterns (results.py:516-524).",
)
def par_substring_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").like("%ck%") | F.col("event_type").like("%error%"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "regex_source_filter",
    """
    SELECT source, COUNT(*) AS n_docs
    FROM documents
    WHERE regexp_matches(source, '^src1[0-9]?$')
    GROUP BY source
    """,
    doc="P8/P9 regex name predicates (psr-dir / chain-segment matching).",
)
def regex_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source").rlike("^src1[0-9]?$"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_STREAM_COUNTER = [0]


@register(
    "streaming_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(14,6))) AS DOUBLE), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Structured Streaming rollup (availableNow) — must equal the batch oracle.",
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the watermarked streaming rollup to completion (availableNow) and
    returns the materialized result — the stream/batch parity guarantee is
    the correctness claim here."""
    from pyspark.sql.types import DecimalType

    from enterprise_warp_spark.streaming.events import stream_events

    _STREAM_COUNTER[0] += 1
    name = f"ews_stream_rollup_{_STREAM_COUNTER[0]}"
    rolled = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast(DecimalType(14, 6))).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(F.col("w").start.alias("hour"), "event_type", "n", "sum_value")
    )
    q = (
        rolled.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS semi-join + group count.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q14_promo_share",
    """
    SELECT ROUND(
      ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice AS DECIMAL(19,2)) * CAST(1-l_discount AS DECIMAL(8,6))
            ELSE CAST(0 AS DECIMAL(19,2)) END) AS DOUBLE), 2) * 100 /
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,2)) * CAST(1-l_discount AS DECIMAL(8,6))) AS DOUBLE), 2),
      6) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
    doc="TPC-H Q14 shape: conditional aggregation share over a join.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DecimalType(19, 2)) * (
        F.lit(1.0) - F.col("l_discount")
    ).cast(DecimalType(8, 6))
    zero = F.lit(0).cast(DecimalType(19, 2))
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double"), 2
            )
            * 100
            / F.round(F.sum(rev).cast("double"), 2),
            6,
        ).alias("promo_share")
    )


@register(
    "hist_mode_by_type",
    """
    WITH stats AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi FROM events GROUP BY 1),
    b AS (
      SELECT e.event_type,
             LEAST(CAST(FLOOR((e.value - s.lo) / ((s.hi - s.lo)/50)) AS BIGINT), 49) AS bucket,
             s.lo, s.hi
      FROM events e JOIN stats s ON e.event_type = s.event_type
    ),
    c AS (SELECT event_type, bucket, lo, hi, COUNT(*) AS cnt FROM b GROUP BY 1,2,3,4),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cnt DESC, bucket) AS rn FROM c)
    SELECT event_type, bucket, cnt, ROUND(lo + bucket*(hi-lo)/50, 6) AS mode_position
    FROM r WHERE rn = 1
    """,
    doc="A5 grouped: 50-bin histogram mode per group (mode_positions_by_par shape).",
)
def hist_mode_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    w = (F.col("_hi") - F.col("_lo")) / 50
    bucketed = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("_lo")) / w).cast("bigint"), F.lit(49)
        ).alias("bucket"),
        "_lo",
        "_hi",
    )
    counted = bucketed.groupBy("event_type", "bucket", "_lo", "_hi").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    win = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("bucket"))
    return (
        counted.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(
            "event_type",
            "bucket",
            "cnt",
            F.round(
                F.col("_lo") + F.col("bucket") * (F.col("_hi") - F.col("_lo")) / 50, 6
            ).alias("mode_position"),
        )
    )
