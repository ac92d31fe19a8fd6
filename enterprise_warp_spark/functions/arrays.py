"""Array expression helpers.

``explode_nonnull`` exists because of a Catalyst performance trap:
``explode(expr)`` makes the optimizer infer a pruning predicate
``size(expr) > 0 AND isnotnull(expr)`` (InferFiltersFromGenerate) and then
push it below the Generate, SUBSTITUTING the full array expression into the
Filter. That filter runs interpreted (outside whole-stage codegen) with no
common-subexpression elimination, so an expensive computed array — shingles,
parsed JSON, tokenized text — is re-evaluated once per sub-expression per
row. Measured on the 3-gram shingle explode at sf0.1: 4.7s -> 0.56s (8.5x)
by switching to ``explode_outer`` (no filter inferred) and dropping the null
row afterwards with a cheap column-reference filter.

Only use when array ELEMENTS are known non-null: explode() keeps null
elements, while the post-filter here would drop them (null/empty ARRAYS are
dropped by both, matching explode()).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sql_double(v: float) -> str:
    """Exact SQL double literal: repr() is the shortest round-trip decimal
    for a Python float, and Spark's parser converts `<repr>D` to the same
    IEEE double (bit-equality pinned by test_arrays), so inlining via SQL
    text changes NOTHING about the value the plan carries."""
    v = float(v)
    if not math.isfinite(v):
        raise ValueError(f"non-finite literal {v!r} cannot be inlined")
    return repr(v) + "D"


def double_array_lit(vals) -> Column:
    """array<double> literal built as ONE parsed SQL expression.

    `F.array(*[F.lit(v) for v in vals])` costs 2+ py4j round-trips PER
    ELEMENT (~1-2 ms each): a 64-dim coefficient array is ~100 ms of pure
    driver chatter, a k x dim centroid matrix ~1 s PER REBUILD — driver
    time serialized under the GIL, paid per k-means iteration and per
    concurrently-built gate branch. One F.expr parse is a single round
    trip; the optimizer constant-folds both forms to the identical
    Literal, so plans and values are unchanged."""
    vals = list(vals)
    if not vals:
        return F.expr("cast(array() as array<double>)")
    return F.expr("array(" + ",".join(_sql_double(v) for v in vals) + ")")


def double_matrix_lit(rows) -> Column:
    """array<array<double>> literal as ONE parsed SQL expression (the
    2-D form of double_array_lit; see its rationale)."""
    rows = [list(r) for r in rows]
    if not rows:
        return F.expr("cast(array() as array<array<double>>)")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(v) for v in r) + ")"
            for r in rows
        )
        + ")"
    )


def long_array_lit(vals) -> Column:
    """array<bigint> literal as ONE parsed SQL expression. String-cast
    form so every int64 value (including LONG_MIN, which `<v>L` cannot
    express as a literal-plus-unary-minus) parses exactly."""
    vals = [int(v) for v in vals]
    if not vals:
        return F.expr("cast(array() as array<bigint>)")
    return F.expr(
        "array("
        + ",".join(f"CAST('{v}' AS BIGINT)" for v in vals)
        + ")"
    )


def spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Repartition expression-heavy per-document work when the scan
    under-partitions (e.g. one big parquet file -> one task). The shuffle
    moves only the raw rows; the expensive expressions then run on every
    core. No-op when the input is already at least as parallel as the
    cluster (the 100 TB case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key)
    return df


def explode_nonnull(
    df: DataFrame, array: Column | str, alias: str, *keep: Column | str
) -> DataFrame:
    """``df.select(*keep, explode(array).alias(alias))`` without the inferred
    full-expression Filter. Array elements must be non-null."""
    c = F.expr(array) if isinstance(array, str) else array
    return df.select(*keep, F.explode_outer(c).alias(alias)).filter(
        F.col(alias).isNotNull()
    )
