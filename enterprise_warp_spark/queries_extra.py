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


# (par_substring_select merged into queries.flag_substring_select;
#  regex_source_filter merged into queries.string_predicate_select;
#  rms_by_type merged into queries.weighted_error_stats;
#  hist_mode_by_type merged into queries.hist_mode;
#  q4_order_priority and q14_promo_share merged into queries_olap entries —
#  all to keep the catalog within the driver's 50-entry CORRECTNESS window.)

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
    # stream_events narrows spark.sql.shuffle.partitions to the input-
    # derived state-partition count for the streaming query; remember the
    # session's setting and restore it after the stream finishes so later
    # batch queries keep their pre-AQE width
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
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
    try:
        q.awaitTermination(300)
    finally:
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


# (q4/q14/hist_mode_by_type bodies now live in their merged catalog entries —
#  see queries_olap.semi_join_order_priority, queries_olap.q14_q17_part_stats,
#  queries.hist_mode.)
