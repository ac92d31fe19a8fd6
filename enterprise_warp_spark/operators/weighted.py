"""A7 — inverse-variance weighted mean (results.py:276-284 ``weightedavg``).

    avg = sum(r/s^2) / sum(1/s^2)
    err = sqrt(1 / sum(1/s^2))

Pure map-side-combinable aggregate: one shuffle on the group key, no window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def weighted_mean_aggs(r: Column | str, s: Column | str) -> list[Column]:
    r = F.col(r) if isinstance(r, str) else r
    s = F.col(s) if isinstance(s, str) else s
    inv_var = 1.0 / (s * s)
    return [
        F.round(F.sum(r * inv_var) / F.sum(inv_var), 3).alias("wavg"),
        F.round(F.sqrt(1.0 / F.sum(inv_var)), 9).alias("werr"),
    ]


def weighted_mean(
    df: DataFrame, r: str, s: str, group_cols: Sequence[str] = ()
) -> DataFrame:
    aggs = weighted_mean_aggs(r, s)
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
