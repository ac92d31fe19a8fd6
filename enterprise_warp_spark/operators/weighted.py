"""A7 — inverse-variance weighted mean (results.py:276-284 ``weightedavg``).

    avg = sum(r/s^2) / sum(1/s^2)
    err = sqrt(1 / sum(1/s^2))

Pure map-side-combinable aggregate: one shuffle on the group key, no window.
Rounding is OPT-IN (used by the oracle-parity catalog queries to absorb
cross-engine summation-order noise); library callers get full precision —
OS-scale sigmas are ~1e-13 and would round to zero.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def weighted_mean_aggs(
    r: Column | str,
    s: Column | str,
    round_avg: int | None = None,
    round_err: int | None = None,
) -> list[Column]:
    r = F.col(r) if isinstance(r, str) else r
    s = F.col(s) if isinstance(s, str) else s
    # sigma == 0 rows carry no usable weight: NULL them out (skipped by the
    # sums — the pre-ANSI behavior) instead of DIVIDE_BY_ZERO killing the
    # whole aggregation under Spark's ANSI default
    inv_var = F.when(s != 0.0, 1.0 / (s * s))
    wavg = F.sum(r * inv_var) / F.sum(inv_var)
    werr = F.sqrt(1.0 / F.sum(inv_var))
    if round_avg is not None:
        wavg = F.round(wavg, round_avg)
    if round_err is not None:
        werr = F.round(werr, round_err)
    return [wavg.alias("wavg"), werr.alias("werr")]


def weighted_mean(
    df: DataFrame,
    r: str,
    s: str,
    group_cols: Sequence[str] = (),
    round_avg: int | None = None,
    round_err: int | None = None,
) -> DataFrame:
    aggs = weighted_mean_aggs(r, s, round_avg, round_err)
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)


def weighted_median(
    df: DataFrame,
    value: str,
    weight: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Distributed weighted median: the smallest value whose cumulative
    weight reaches half the group's total (lower weighted median — the
    standard discrete definition) -> (group_cols..., wmedian).

    Shape: one window cumulative sum over (group, value) order + one total
    per group + a min over the qualifying values. The window partitions by
    the GROUP key, so a hot group serializes only its own rows — same
    contract as any grouped quantile; for a single colossal group use the
    GK sketch in operators/sketches.py instead. Zero/negative weights and
    NULL values are excluded (neither can carry mass; NULLs sort first
    and would silently bias the median low)."""
    gc = list(group_cols)
    rows = df.filter(
        (F.col(weight) > 0) & F.col(value).isNotNull()
    ).select(
        *gc, F.col(value).alias("__v"), F.col(weight).cast("double").alias("__w")
    )
    # Window.partitionBy(*[]) and groupBy(*[]) both mean "one global group"
    w_cum = (
        Window.partitionBy(*gc)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*gc)
    cum = rows.withColumn("__cw", F.sum("__w").over(w_cum)).withColumn(
        "__tot", F.sum("__w").over(w_tot)
    )
    qualifying = cum.filter(F.col("__cw") >= F.col("__tot") / 2.0)
    return qualifying.groupBy(*gc).agg(F.min("__v").alias("wmedian"))
