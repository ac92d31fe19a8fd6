"""Approximate (sketch) aggregates for cardinality/quantile/heavy-hitter
questions at 100 TB, where exactness costs a full shuffle of the key space.

All are single-pass, mergeable sketches built into Spark (JVM-side,
whole-stage codegen; merge happens in partial aggregation, so the driver
only sees one small sketch per group):

    approx_distinct_by   HyperLogLog++ (relativeSD-controlled)
    approx_quantiles_by  Greenwald-Khanna percentile_approx
    heavy_hitters        count-per-key with a minimum support threshold,
                         exact within each partition-merged count

They are deliberately NOT in the oracle catalog: sketch outputs are
engine-specific (HLL register layouts differ across engines), so correctness
is gated by error-bound tests against the exact aggregates instead
(tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group: str, col: str, rsd: float = 0.02
) -> DataFrame:
    """HLL++ distinct count of `col` per `group` (rsd = target relative
    standard deviation). Map-side partial sketches merge in one shuffle of
    sketch bytes, not of the key space."""
    return df.groupBy(group).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    group: str,
    col: str,
    probs: tuple[float, ...] = (0.16, 0.5, 0.84),
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate percentiles per group; error <=
    1/accuracy in rank. The exact twin (`credible_levels`) sorts the whole
    group; this streams it."""
    arr = F.array(*[F.lit(p) for p in probs])
    return df.groupBy(group).agg(
        F.percentile_approx(col, arr, F.lit(accuracy)).alias("approx_q")
    )


def heavy_hitters(
    df: DataFrame, group: str, col: str, min_share: float = 0.01
) -> DataFrame:
    """Values of `col` appearing in at least `min_share` of the rows of their
    `group` — the aggregate-then-filter shape (two shuffles: value counts,
    then group totals as a broadcastable side)."""
    counts = df.groupBy(group, col).agg(F.count(F.lit(1)).alias("n"))
    totals = df.groupBy(group).agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.join(F.broadcast(totals), group)
        .filter(F.col("n") >= F.col("total") * min_share)
        .select(group, col, "n", F.round(F.col("n") / F.col("total"), 6).alias("share"))
    )
