"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on in `session.py`) handles most skew at runtime
by splitting oversized shuffle partitions — but it only works for sort-merge
joins at shuffle time. Salting is the static fallback for the cases AQE
cannot fix: a single hot key that dominates a partition (AQE splits the
partition, but every split still contains the same key on the build side),
stream-side skew into stateful ops, or engines/paths without AQE (Structured
Streaming state ops).

``salted_join``: the skewed (large) side gets a uniform random salt in
[0, n_salt); the other side is replicated n_salt times with every salt value
(`explode(sequence(...))`), and the join key becomes (key, salt). A hot key's
rows now spread over n_salt tasks at the cost of replicating the small side
n_salt times — choose n_salt ~ (hot-key rows / target partition rows).

Deterministic: the salt uses a fixed-seed ``rand`` so plans are reproducible
run-to-run (same task split, same results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enterprise_warp_spark.functions.arrays import explode_nonnull


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salt: int = 8,
    how: str = "inner",
    seed: int = 7,
) -> DataFrame:
    """Equi-join `skewed` with `other` on `on`, spreading each key of the
    skewed side over ``n_salt`` sub-keys. `other` is replicated n_salt times
    (keep it the smaller side). Output columns = plain join output.

    Only join types correct from the skewed side are allowed: for
    right/full-outer joins every unmatched `other` row would be emitted once
    per salt replica (n_salt null-extended copies), so those are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe — unmatched rows of the "
            f"replicated side would appear n_salt times; use one of {sorted(allowed)}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn(
        "__salt", (F.floor(F.rand(seed) * n_salt)).cast("int")
    )
    o = explode_nonnull(
        other,
        F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"),
        "__salt",
        *other.columns,
    )
    return s.join(o, keys + ["__salt"], how).drop("__salt")
