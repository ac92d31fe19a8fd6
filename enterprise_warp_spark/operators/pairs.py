"""J6 — unordered-pair self-join (pulsar pairs for cross-correlations).

Reference: OS cross-correlations over every unordered pulsar pair
(results.py:804-809; n(n-1)/2 pairs at results.py:316).

Scale notes: for small entity tables (pulsars, suppliers) the `a.key < b.key`
theta-join broadcasts one side; at millions of entities, pre-bucket both sides
on a blocking key and join bucket-equi first so the quadratic blowup is
per-bucket, not global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_join(df: DataFrame, key: str, prefix_a: str = "a_", prefix_b: str = "b_") -> DataFrame:
    """All unordered pairs (a.key < b.key); columns prefixed to disambiguate."""
    a = df.select([F.col(c).alias(f"{prefix_a}{c}") for c in df.columns])
    b = df.select([F.col(c).alias(f"{prefix_b}{c}") for c in df.columns])
    return a.join(F.broadcast(b), F.col(f"{prefix_a}{key}") < F.col(f"{prefix_b}{key}"))
