"""Local replica of the driver's oracle compare: row count + schema shape +
order-insensitive value comparison with columns sorted by name.

Stricter than a tolerance check on purpose: values are stringified exactly
(after normalizing dtypes), so any cross-engine nondeterminism shows up here
before the driver sees it.
"""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: "nan" if (v is None or (isinstance(v, float) and math.isnan(v))) else repr(float(v)))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64").astype(str)
        else:
            df[c] = s.map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, duck_rel) -> None:
    left = _normalize(spark_df.toPandas())
    right = _normalize(duck_rel.df())
    assert list(left.columns) == list(right.columns), (
        f"column mismatch: {list(left.columns)} vs {list(right.columns)}"
    )
    assert len(left) == len(right), f"row count: {len(left)} vs {len(right)}"
    if not left.equals(right):
        diff = (left != right).any(axis=1)
        bad = diff[diff].index[:5]
        msg = "\n".join(
            f"spark={left.loc[i].to_dict()}\noracle={right.loc[i].to_dict()}" for i in bad
        )
        raise AssertionError(f"value mismatch on {int(diff.sum())} rows:\n{msg}")
