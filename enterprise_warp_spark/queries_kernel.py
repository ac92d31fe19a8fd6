"""Catalog entries for kernel-backed and stateful operators.

`sessionize_events` has a full SQL oracle (gaps-and-islands reformulation of
session_window). The GP-likelihood and optimal-statistic entries synthesize
deterministic per-pulsar residuals from the events table and run the Arrow
kernels — genuinely non-SQL-expressible, so they are registered WITHOUT an
oracle and the driver records the weaker rows-only check (schema + count).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from enterprise_warp_spark.queries import register
from enterprise_warp_spark.tables import table

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


@register(
    "sessionize_events",
    f"""
    WITH o AS (
      SELECT user_id, ts, epoch_us(ts) AS us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="Gap-based sessionization: session_window vs gaps-and-islands oracle.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("s"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("s").start.alias("session_start"), "n_events"
        )
    )


def _synthetic_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pulsar-shaped residuals derived from the events table:
    psr = user bucket, toa_s from the microsecond timestamp, residual from
    the (centered, scaled) value column."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("J"), (F.col("user_id") % 3).cast("string")).alias("psr"),
        (F.col("ts_us") % 300_000_000_000).cast("double").alias("toa_s"),
        ((F.col("value") - 49.6) * 2e-8).alias("residual_s"),
        F.lit(1e-6).alias("toa_err_s"),
        F.lit(1.0).alias("efac"),
        F.lit(0.0).alias("equad"),
    )


@register(
    "gp_likelihood_scan",
    None,  # non-SQL-expressible: Arrow kernel (rows-only check)
    doc="F10/A13: GP-marginalized likelihood over a fixed sample grid (kernel op).",
)
def gp_likelihood_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from enterprise_warp_spark.likelihood.gp import gp_loglik_per_pulsar, total_loglik

    res = _synthetic_residuals(spark, sf_dir)
    samples = pd.DataFrame(
        {
            "sample_id": range(6),
            "log10_A": [-14.0, -13.5, -13.0, -12.5, -12.0, -11.5],
            "gamma": [3.0, 3.5, 4.0, 4.5, 5.0, 5.5],
        }
    )
    return total_loglik(gp_loglik_per_pulsar(res, samples, nfreqs=8)).orderBy(
        "sample_id"
    )


@register(
    "gwb_hd_likelihood",
    None,  # non-SQL-expressible: Arrow kernel (rows-only check)
    doc="F8/F11: HD-correlated GWB likelihood, JOINT GWB + per-pulsar sampled "
    "red noise (Kronecker-Woodbury kernel over the distributed reduction).",
)
def gwb_hd_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from enterprise_warp_spark.analytics.optimal_statistic import per_pulsar_reduction
    from enterprise_warp_spark.likelihood.gwb import gwb_loglik

    res = _synthetic_residuals(spark, sf_dir)
    tspan = 300_000.0 * 1_000_000
    red = per_pulsar_reduction(res, nfreqs=6, tspan_s=tspan)
    # small local tables go through the Arrow createDataFrame path (one
    # LocalTableScan partition) — the tuple-list path RDD-parallelizes over
    # defaultParallelism slices and costs seconds per mapInPandas stage
    positions = spark.createDataFrame(
        pd.DataFrame(
            {
                "psr": ["J0", "J1", "J2"],
                "pos": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
            }
        )
    )
    cols = {f"J{i}": (f"rn_lga_{i}", f"rn_gam_{i}") for i in range(3)}
    grid = [(-13.5, 13.0 / 3.0), (-14.0, 4.0), (-14.5, 3.0), (-13.0, 3.7)]
    rows = [
        tuple(
            [sid, lga, gam]
            + [v for i in range(3) for v in (-13.8 + 0.1 * i + 0.05 * sid, 3.2 + 0.2 * i)]
        )
        for sid, (lga, gam) in enumerate(grid)
    ]
    names = ["sample_id", "gw_log10_A", "gw_gamma"] + [
        c for i in range(3) for c in cols[f"J{i}"]
    ]
    samples = spark.createDataFrame(pd.DataFrame(rows, columns=names))
    return gwb_loglik(red, positions, samples, tspan, intrinsic_columns=cols).orderBy(
        "sample_id"
    )


@register(
    "os_pair_statistics",
    None,  # non-SQL-expressible: Arrow kernel (rows-only check)
    doc="F12/J6: optimal-statistic per-pair cross-correlations (kernel op).",
)
def os_pair_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from enterprise_warp_spark.analytics.optimal_statistic import (
        pair_statistics,
        per_pulsar_reduction,
    )

    res = _synthetic_residuals(spark, sf_dir)
    red = per_pulsar_reduction(res, nfreqs=6, tspan_s=300_000.0 * 1_000_000)
    positions = spark.createDataFrame(
        pd.DataFrame(
            {
                "psr": ["J0", "J1", "J2"],
                "pos": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
            }
        )
    )
    return pair_statistics(red, positions, tspan_s=300_000.0 * 1_000_000)
