"""exact_rank_select (staged histogram selection — exact order statistics
with no global sort) pinned against full local sorts."""

import math
import random

import pytest

from enterprise_warp_spark.operators.binning import exact_rank_select


def _truth(rows):
    vals: dict = {}
    for g, v in rows:
        vals.setdefault(g, []).append(v)
    for g in vals:
        vals[g].sort()
    return vals


def test_exact_across_levels_and_groups(spark):
    rng = random.Random(7)
    rows = [(f"g{i % 3}", rng.gauss(0.0, 100.0)) for i in range(30000)]
    rows.append(("tiny", 5.0))
    df = spark.createDataFrame(rows, ["g", "v"])
    # collect_cap small enough to force >= 2 histogram levels
    out = exact_rank_select(
        df, "g", "v", probs=(0.0, 0.25, 0.5, 0.9, 1.0),
        buckets=16, collect_cap=50,
    )
    vals = _truth(rows)
    assert len(out) == 4 * 5
    for t in out:
        n = len(vals[t["group"]])
        rank = math.floor((n - 1) * t["p"]) + 1
        assert t["rank"] == rank and t["n"] == n
        assert t["value"] == vals[t["group"]][rank - 1], t


def test_heavy_ties_and_collapsed_ranges(spark):
    df = spark.createDataFrame(
        [("e", 3.0)] * 100 + [("e", 7.0)] * 50 + [("c", 1.0)] * 40,
        ["g", "v"],
    )
    out = {
        (t["group"], t["p"]): t["value"]
        for t in exact_rank_select(
            df, "g", "v", probs=(0.5, 0.9), buckets=8, collect_cap=10
        )
    }
    # ranks 75 and 135 of [3.0 x100, 7.0 x50]; constant group collapses
    assert out[("e", 0.5)] == 3.0 and out[("e", 0.9)] == 7.0
    assert out[("c", 0.5)] == 1.0 and out[("c", 0.9)] == 1.0


def test_matches_duckdb_discrete_quantile(spark, sf_dir):
    """Same selection as a DuckDB ROW_NUMBER order statistic on the real
    orders table."""
    import duckdb

    from enterprise_warp_spark.tables import table

    orders = table(spark, sf_dir, "orders")
    out = {
        (t["group"], t["p"]): t
        for t in exact_rank_select(
            orders, "o_orderpriority", "o_totalprice",
            probs=(0.5, 0.9), collect_cap=200,
        )
    }
    con = duckdb.connect()
    want = con.sql(
        f"""
        WITH q AS (
          SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
          FROM read_parquet('{sf_dir}/orders.parquet')
        )
        SELECT g, p, v FROM q
        JOIN (SELECT UNNEST([0.5, 0.9]) AS p) ON
          rn = CAST(FLOOR((cnt - 1) * p) + 1 AS BIGINT)
        """
    ).fetchall()
    assert len(want) == len(out)
    for g, p, v in want:
        assert out[(g, float(p))]["value"] == v


def test_guards(spark):
    df = spark.createDataFrame([("a", 1.0)], ["g", "v"])
    with pytest.raises(ValueError):
        exact_rank_select(df, "g", "v", probs=(1.5,))
    with pytest.raises(ValueError):
        exact_rank_select(df, "g", "v", buckets=0)
    out = exact_rank_select(df, "g", "v", probs=(0.0, 1.0))
    assert all(t["value"] == 1.0 and t["rank"] == 1 for t in out)


def test_nulls_and_nans_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", float("nan")), ("a", 3.0)],
        ["g", "v"],
    )
    out = exact_rank_select(df, "g", "v", probs=(1.0,))
    assert out[0]["n"] == 2 and out[0]["value"] == 3.0


def test_ulp_adjacent_values_resolve_exactly(spark):
    """Adversarial float case: a cluster of ulp-adjacent doubles makes the
    range width underflow mid-narrowing; the selection must still return
    the exact k-th element, not the range floor."""
    import math as _math

    base = 1.0
    vals = [base]
    for _ in range(6):
        vals.append(_math.nextafter(vals[-1], 2.0))
    rows = [("u", v) for v in vals for _ in range(10)]  # 70 rows, 7 values
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        t["p"]: t["value"]
        for t in exact_rank_select(
            df, "g", "v", probs=(0.0, 0.5, 1.0), buckets=4, collect_cap=5
        )
    }
    svals = sorted(v for _, v in rows)
    assert out[0.0] == svals[0]
    assert out[0.5] == svals[_math.floor(69 * 0.5)]
    assert out[1.0] == svals[-1]


def test_giant_constant_group_needs_no_collect(spark):
    """min == max resolves at the stats pass — a billion-row constant
    group must never reach the collect path (asserted via collect_cap=1
    on a group far larger than it)."""
    df = spark.createDataFrame([("c", 42.0)] * 500, ["g", "v"])
    out = exact_rank_select(df, "g", "v", probs=(0.5,), collect_cap=1)
    assert out[0]["value"] == 42.0 and out[0]["n"] == 500


def test_overcap_ties_resolve_via_value_counts(spark):
    """Tasks that exit the histogram loop with count > collect_cap
    (max_levels exhaustion on heavy ties) must resolve through the
    distinct-value-count path — the driver never pulls the tied rows."""
    rows = [("t", 5.0)] * 1000 + [("t", 6.0)] * 10
    df = spark.createDataFrame(rows, ["g", "v"])
    out = exact_rank_select(
        df, "g", "v", probs=(0.5, 1.0), buckets=2, collect_cap=50,
        max_levels=1,
    )
    got = {t["p"]: t["value"] for t in out}
    assert got[0.5] == 5.0 and got[1.0] == 6.0


def test_overcap_distinct_raises_clear_error(spark):
    """If even the DISTINCT values in the un-narrowed range exceed
    collect_cap, the collect must refuse with a clear error instead of
    pulling unbounded rows (the r11 ADVICE hole)."""
    rows = [("u", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    with pytest.raises(ValueError, match="collect_cap"):
        exact_rank_select(
            df, "g", "v", probs=(0.5,), collect_cap=10, max_levels=0
        )
