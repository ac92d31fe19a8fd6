"""Temporal join operators Spark lacks as built-ins: as-of (point-in-time)
join and interval (range) join.

Both are implemented as compositions of existing DataFrame ops chosen for the
100 TB shape of the problem, NOT as theta-joins the planner would execute as
a broadcast-nested-loop or cartesian product:

* ``asof_join`` — union both sides tagged, ONE shuffle on the key, and a
  running ``last(..., ignorenulls)`` carry-forward window. Cost is
  O(n log n) per key partition with zero row multiplication, versus the
  O(n_left * n_right) per key of a naive ``l.ts >= r.ts`` theta join. This
  is the standard scalable point-in-time join (same plan shape Flink's
  temporal join and kdb's aj compile to).
* ``interval_join`` — intervals are exploded onto a coarse bucket grid
  (``ceil(width / bucket)`` rows each, typically 1-2), points hash to one
  bucket, and the join becomes an EQUI-join on (key, bucket) refined by the
  range predicate. Catalyst plans a plain shuffled hash/sort-merge join;
  no nested-loop fallback, skew handled by AQE like any equi-join.

The reference has no temporal joins (its TOA tables are joined per-pulsar by
position, SURVEY §2.3); these serve the training-data/event-analytics surface
(BASELINE.json north_star) where point-in-time correctness (feature lookups)
and window attribution are core query shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    match_col: str = "match",
) -> DataFrame:
    """For every left row, attach the LAST right row (as a struct column
    ``match_col``) with ``right.ts <= left.ts`` for the same ``on`` key;
    null struct when no right row precedes.

    Equal timestamps count as preceding (right sorts before left on ties),
    matching ``ASOF JOIN ... ON l.ts >= r.ts`` inclusive semantics. Among
    several right rows at the SAME (key, ts), the winner is the one whose
    full payload struct sorts last (field-wise struct ordering) — a
    data-deterministic tiebreak, stable run-to-run regardless of
    partitioning.
    """
    l_t = StructType(left.schema.fields)
    r_t = StructType(right.schema.fields)
    l2 = left.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lpay"),
        F.lit(None).cast(r_t).alias("__rpay"),
    )
    r2 = right.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_t).alias("__lpay"),
        F.struct(*[F.col(c) for c in right.columns]).alias("__rpay"),
    )
    # __rpay as final sort key: among right rows tied on (key, ts) the pick
    # is the max payload struct — deterministic; left rows all have null
    # __rpay so their relative order is unaffected (and irrelevant: each
    # left row only reads the running last() at its own position).
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__rpay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l2.unionByName(r2)
        .withColumn("__m", F.last("__rpay", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(F.col("__lpay.*"), F.col("__m").alias(match_col))
    )


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    on: str,
    start: str,
    end: str,
    point_ts: str,
    bucket: int,
) -> DataFrame:
    """Join each interval ``[start, end)`` to the points falling inside it
    (same ``on`` key), as an equi-join on (key, coarse time bucket).

    ``start``/``end``/``point_ts`` are integer epoch columns (e.g. µs);
    ``bucket`` is the grid width in the same unit — choose it >= the typical
    interval width so each interval lands on 1-2 buckets. Output = interval
    columns + matching point row struct ``point``.
    """
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket),
                F.floor((F.col(end) - 1) / bucket),
            )
        ),
    )
    pt = points.withColumn("__b", F.floor(F.col(point_ts) / bucket)).select(
        F.col(on).alias("__pk"),
        "__b",
        F.struct(*[F.col(c) for c in points.columns]).alias("point"),
    )
    return (
        iv.join(
            pt,
            (iv[on] == pt["__pk"])
            & (iv["__b"] == pt["__b"])
            & (pt["point"][point_ts] >= iv[start])
            & (pt["point"][point_ts] < iv[end]),
        )
        .drop("__b", "__pk")
    )


def time_bucket(ts_us: Column | str, width_us: int) -> Column:
    """Hypertable-style time bucket: epoch-µs start of the containing
    fixed-width bucket (timescaledb ``time_bucket`` analogue)."""
    c = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    return (F.floor(c / width_us) * width_us).cast("long")


def gapfill(
    df: DataFrame,
    ts_us: str,
    group_cols: list[str],
    bucket_us: int,
    value_col: str,
    agg: str = "avg",
    method: str = "locf",
) -> DataFrame:
    """Hypertable gap-filling (timescaledb ``time_bucket_gapfill`` +
    ``locf``/``interpolate`` analogue): bucket `ts_us` at `bucket_us`,
    aggregate `value_col` per (group, bucket), then emit ONE ROW PER
    BUCKET of each group's [min, max] range with missing buckets filled:

      method='locf'    last observation carried forward (leading gaps null)
      method='linear'  linear interpolation between the neighboring
                       observed buckets (edges fall back to locf/null)
      method='null'    grid only; gaps stay null

    -> (group_cols..., bucket_us, <value_col>, filled)

    Scale shape: one hash aggregate to the observed buckets, one tiny
    per-group min/max aggregate, grid generation by sequence-explode
    (output-proportional, no driver loop), a left join back on
    (group, bucket), and per-group ordered windows for the fills. Each
    group's grid size is bounded by its time span / bucket_us — the
    hypertable contract (dense-ish series); a sparse series with a vast
    span should use a coarser bucket."""
    if method not in ("locf", "linear", "null"):
        raise ValueError(f"unknown gapfill method {method!r}")
    aggfn = getattr(F, agg)
    b = time_bucket(ts_us, bucket_us).alias("__b")
    observed = (
        df.select(*group_cols, b, F.col(value_col).alias("__v"))
        .groupBy(*group_cols, "__b")
        .agg(aggfn("__v").alias("__v"))
    )
    spans = observed.groupBy(*group_cols).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = spans.select(
        *group_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(int(bucket_us)))
        ).alias("__b"),
    )
    # NULL group keys are legitimate groups (groupBy keeps them); the
    # join-back must be null-SAFE or those groups silently lose every
    # observed value (NULL != NULL under plain equality)
    obs = observed.withColumnRenamed("__b", "__ob")
    cond = F.col("__b") == F.col("__ob")
    for c in group_cols:
        cond = cond & grid[c].eqNullSafe(obs[c])
    joined = (
        grid.join(obs, cond, "left")
        .select(*[grid[c] for c in group_cols], "__b", "__v")
        .withColumn("filled", F.col("__v").isNull())
    )
    w = Window.partitionBy(*group_cols).orderBy("__b")
    if method == "locf":
        filled = joined.withColumn(
            "__v", F.last("__v", ignorenulls=True).over(w)
        )
    elif method == "linear":
        wb = w.rowsBetween(Window.unboundedPreceding, 0)
        wf = w.rowsBetween(0, Window.unboundedFollowing)
        prev_v = F.last("__v", ignorenulls=True).over(wb)
        prev_b = F.last(
            F.when(F.col("__v").isNotNull(), F.col("__b")), ignorenulls=True
        ).over(wb)
        next_v = F.first("__v", ignorenulls=True).over(wf)
        next_b = F.first(
            F.when(F.col("__v").isNotNull(), F.col("__b")), ignorenulls=True
        ).over(wf)
        interp = prev_v + (next_v - prev_v) * (
            (F.col("__b") - prev_b) / (next_b - prev_b)
        )
        filled = joined.withColumn(
            "__v",
            F.when(F.col("__v").isNotNull(), F.col("__v"))
            .when(prev_b.isNull(), next_v)  # leading gap -> first observed
            .when(next_b.isNull(), prev_v)  # trailing gap -> locf
            .otherwise(interp),
        )
    else:
        filled = joined
    return filled.select(
        *group_cols,
        F.col("__b").alias("bucket_us"),
        F.col("__v").alias(value_col),
        "filled",
    )


def rolling_zscore(
    df: DataFrame,
    ts_us: str,
    value: str,
    group_cols: list[str],
    window_rows: int = 50,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling anomaly detection: per group, each point's z-score against
    the mean/stddev of the PRECEDING `window_rows` observations (the point
    itself excluded, so an outlier cannot mask itself) -> input columns +
    (roll_mean, roll_std, zscore, is_anomaly).

    Points with fewer than 3 preceding observations, or a degenerate
    (zero/null) rolling stddev, get zscore NULL / is_anomaly false — a
    constant series reports no anomalies rather than dividing by zero.
    One ordered window per group; the hypertable-shaped cost model
    (per-group serial scan) shared by gapfill."""
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    # deterministic tiebreak for tied timestamps — a rows-frame over a
    # non-total order is partition-layout-dependent (same reason asof_join
    # carries one); the value column makes the order total enough for
    # reproducible frames
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(ts_us).asc(), F.col(value).asc())
        .rowsBetween(-window_rows, -1)
    )
    roll_mean = F.avg(value).over(w)
    roll_std = F.stddev_samp(value).over(w)
    n_prev = F.count(value).over(w)
    # (roll_std > 0) is null-safe inside when(): NULL stddev -> not matched
    z = F.when(
        (n_prev >= 3) & (roll_std > 0),
        (F.col(value) - roll_mean) / roll_std,
    )
    return (
        df.withColumn("roll_mean", roll_mean)
        .withColumn("roll_std", roll_std)
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(z) > F.lit(float(threshold)), F.lit(False)),
        )
    )
