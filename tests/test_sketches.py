"""Error-bound gates for the sketch operators (operators/sketches.py):
approximate answers must land within their advertised bounds of the exact
aggregates on the sf0.01 events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from enterprise_warp_spark.operators.sketches import (
    approx_distinct_by,
    approx_quantiles_by,
    heavy_hitters,
)
from enterprise_warp_spark.tables import table


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_by(ev, "event_type", "user_id", rsd=0.02).collect()
    }
    assert set(approx) == set(exact)
    for k, d in exact.items():
        # 5 sigma of the target 2% relative standard deviation
        assert abs(approx[k] - d) <= max(1, 0.1 * d), (k, approx[k], d)


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    probs = (0.16, 0.5, 0.84)
    approx = {
        r["event_type"]: r["approx_q"]
        for r in approx_quantiles_by(ev, "event_type", "value", probs).collect()
    }
    exact = {
        r["event_type"]: r["q"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.16, 0.5, 0.84))").alias("q"))
        .collect()
    }
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) <= 0.05 * max(1.0, abs(e)), (k, a, e)


def test_heavy_hitters_shares(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    hh = heavy_hitters(ev, "event_type", "user_id", min_share=0.005).collect()
    assert len(hh) > 0
    total_by_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for r in hh:
        assert r["n"] / total_by_type[r["event_type"]] >= 0.005
        assert abs(r["share"] - r["n"] / total_by_type[r["event_type"]]) < 1e-4
