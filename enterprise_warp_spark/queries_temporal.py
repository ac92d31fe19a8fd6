"""Temporal catalog entries: as-of join, interval (range) join, hypertable
time-hierarchy rollup, and lead/lag inter-arrival analysis over `events`.

These are the event-time query shapes a feature-store / training-data
pipeline runs constantly (point-in-time feature lookup, window attribution,
continuous aggregates). The reference itself has no temporal joins (SURVEY
§2.3); scale rationale lives in `operators/temporal.py`.

Timestamps: events.ts is parquet TIMESTAMP(NANOS); everything here computes
on `ts_us` (µs epoch, identical to DuckDB's truncating ns->µs read) and
outputs epoch-µs BIGINTs so no engine-side timezone/rounding can diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from enterprise_warp_spark.operators.temporal import asof_join, interval_join
from enterprise_warp_spark.queries import _dec, _dsum, register
from enterprise_warp_spark.tables import table

WINDOW_US = 5 * 60 * 1_000_000  # 5-minute attribution window


@register(
    "asof_last_view_per_click",
    """
    SELECT l.event_id AS click_id, l.user_id,
           epoch_us(l.ts) AS click_us,
           epoch_us(r.ts) AS view_us,
           r.value AS view_value,
           ROUND((epoch_us(l.ts) - epoch_us(r.ts)) / 1e6, 6) AS delta_s
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="As-of (point-in-time) join: each click matched to the user's most "
    "recent prior view. Implemented as union + carry-forward window: ONE "
    "shuffle, zero row multiplication (vs theta-join blowup).",
)
def asof_last_view_per_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts_us", "value"
    )
    joined = asof_join(clicks, views, on="user_id", ts="ts_us")
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts_us").alias("click_us"),
        F.col("match.ts_us").alias("view_us"),
        F.col("match.value").alias("view_value"),
        F.round((F.col("ts_us") - F.col("match.ts_us")) / F.lit(1e6), 6).alias(
            "delta_s"
        ),
    )


@register(
    "range_join_error_window",
    f"""
    SELECT e.event_id AS window_id, e.user_id,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(x.value AS DECIMAL(14,6))) AS DOUBLE), 2) AS sum_value
    FROM events e JOIN events x
      ON x.user_id = e.user_id
     AND epoch_us(x.ts) >= epoch_us(e.ts)
     AND epoch_us(x.ts) < epoch_us(e.ts) + {WINDOW_US}
    WHERE e.event_type = 'error'
    GROUP BY 1, 2
    """,
    doc="Interval (range) join: activity within 5 minutes after each error, "
    "bucketized to an EQUI-join on (user, time bucket) — no nested-loop "
    "theta join, AQE-friendly.",
)
def range_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        "user_id",
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + WINDOW_US).alias("end_us"),
    )
    points = ev.select("user_id", "ts_us", "value")
    joined = interval_join(
        errors,
        points,
        on="user_id",
        start="start_us",
        end="end_us",
        point_ts="ts_us",
        bucket=WINDOW_US,
    )
    return joined.groupBy("window_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum(F.col("point.value"), 14, 6).alias("sum_value"),
    )


@register(
    "hypertable_rollup_events",
    """
    SELECT COALESCE(epoch_us(date_trunc('day', ts)), -1) AS day_us,
           COALESCE(epoch_us(date_trunc('hour', ts)), -1) AS hour_us,
           CAST(GROUPING(date_trunc('day', ts)) * 2
                + GROUPING(date_trunc('hour', ts)) AS INTEGER) AS gid,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(14,6))) AS DOUBLE), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP(date_trunc('day', ts), date_trunc('hour', ts))
    """,
    doc="Hypertable continuous-aggregate shape: hourly + daily + total in ONE "
    "scan and one shuffle via ROLLUP over the time hierarchy (the batch twin "
    "of a timescaledb multi-resolution rollup).",
)
def hypertable_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.rollup(
            F.date_trunc("day", F.col("ts")).alias("d"),
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("value", 14, 6).alias("sum_value"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .select(
            F.coalesce(F.unix_micros("d"), F.lit(-1)).alias("day_us"),
            F.coalesce(F.unix_micros("h"), F.lit(-1)).alias("hour_us"),
            "gid",
            "n",
            "sum_value",
        )
    )


@register(
    "event_interarrival_stats",
    """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type, COUNT(gap_us) AS n_gaps,
           ROUND(SUM(gap_us) / 1e6 / COUNT(gap_us), 6) AS avg_gap_s,
           ROUND(MAX(gap_us) / 1e6, 6) AS max_gap_s
    FROM g GROUP BY event_type
    """,
    doc="lead/lag window op: per-user inter-arrival gaps (exact integer-µs "
    "arithmetic; one shuffle for the window + map-side partial agg).",
)
def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(
            F.sum("gap_us") / F.lit(1e6) / F.count("gap_us"), 6
        ).alias("avg_gap_s"),
        F.round(F.max("gap_us") / F.lit(1e6), 6).alias("max_gap_s"),
    )
