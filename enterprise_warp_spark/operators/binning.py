"""Binning aggregations.

Reference semantics:
  - histogram_mode  A5: 50-bin histogram, left edge of argmax bin
                    (results.py:154-170 dist_mode_position)
  - ntile_bins      A8: sort by x, fixed-count bins of n/k rows, per-bin stats
                    (results.py:305-346 avg_ostat_bins)
  - range_bins      A9: fixed-width bins [z, z+w) (results.py:286-303)

Scale notes: histogram_mode computes (min,max) in one pass and broadcasts the
1-row stats to the bucketing pass — two scans, no wide shuffle (bucket
cardinality == bins). ntile_bins needs a total order; at cluster scale a
global window is a single-partition sort, so for >~10^8 rows replace with
range-partitioned approx quantile cuts. Fine at chain/pair cardinalities.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram_mode(df: DataFrame, value: str, bins: int = 50) -> DataFrame:
    """A5 — returns one row: (bucket, cnt, mode_position=left bin edge)."""
    v = F.col(value)
    stats = df.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
    w = (F.col("_hi") - F.col("_lo")) / bins
    # constant column (min == max): zero bin width would DIVIDE_BY_ZERO
    # under ANSI mode — everything belongs in bucket 0 (mode_position = lo)
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0).cast("bigint")).otherwise(
        F.least(F.floor((v - F.col("_lo")) / w).cast("bigint"), F.lit(bins - 1))
    )
    bucketed = (
        df.join(F.broadcast(stats))
        .select(bucket.alias("bucket"), "_lo", "_hi")
    )
    counted = bucketed.groupBy("bucket", "_lo", "_hi").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        counted.orderBy(F.desc("cnt"), F.asc("bucket"))
        .limit(1)
        .select(
            "bucket",
            "cnt",
            F.round(
                F.col("_lo") + F.col("bucket") * (F.col("_hi") - F.col("_lo")) / bins, 6
            ).alias("mode_position"),
        )
    )


def grouped_histogram(
    df: DataFrame, keys: Sequence[str], value: str, bins: int = 50
) -> DataFrame:
    """A5 grouped form — (keys..., bucket, cnt, lo, hi): per-group 50-bin
    histogram counts, the K7 plot-sink feeding aggregation. Two passes like
    histogram_mode (per-group min/max, then bucket+count); the stats join is
    broadcast (one row per group) and output is bounded by groups x bins,
    never by sample count — the property that makes the plot sink safe at
    100 TB."""
    keys = list(keys)
    v = F.col(value)
    stats = df.groupBy(*keys).agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
    w = (F.col("_hi") - F.col("_lo")) / bins
    bucket = F.when(
        F.col("_hi") == F.col("_lo"), F.lit(0).cast("bigint")
    ).otherwise(
        F.least(F.floor((v - F.col("_lo")) / w).cast("bigint"), F.lit(bins - 1))
    )
    return (
        df.join(F.broadcast(stats), keys)
        .select(*keys, bucket.alias("bucket"), "_lo", "_hi")
        .groupBy(*keys, "bucket", "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *keys,
            "bucket",
            "cnt",
            F.col("_lo").alias("lo"),
            F.col("_hi").alias("hi"),
        )
    )


def ntile_bins(
    df: DataFrame,
    order_by: Sequence[str],
    n_bins: int = 8,
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """A8 — ntile(n) over a tie-free total order, then per-bin aggregates.

    ``order_by`` must end with a unique key so the tiling is deterministic.
    """
    w = Window.orderBy(*order_by)
    tiled = df.withColumn("bin", F.ntile(n_bins).over(w))
    default_aggs = [F.count(F.lit(1)).alias("n")]
    return tiled.groupBy("bin").agg(*(list(aggs) or default_aggs))


def range_bins(
    df: DataFrame, value: str, width: float, aggs: Sequence[Column] = ()
) -> DataFrame:
    """A9 — fixed-width bins: bucket = floor(x / width)."""
    bucketed = df.withColumn(
        "bucket", F.floor(F.col(value) / F.lit(width)).cast("bigint")
    )
    default_aggs = [F.count(F.lit(1)).alias("n")]
    return bucketed.groupBy("bucket").agg(*(list(aggs) or default_aggs))
