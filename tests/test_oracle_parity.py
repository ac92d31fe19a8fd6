"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
a local replica of the driver's t2 correctness gate."""

import pytest

from enterprise_warp_spark.queries import REGISTRY
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    compare(df, duck.sql(spec.oracle))


def test_hostile_timezone_session_still_matches_oracle(spark, duck, sf_dir):
    """The driver uses a VANILLA session; a user session pinned to a
    non-UTC timezone must not change timestamp-bearing query output —
    tables.table() re-pins session.timeZone to UTC on every call."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name in ("sessionize_events", "hypertable_rollup_events",
                     "asof_last_view_per_click"):
            spec = REGISTRY[name]
            compare(spec.spark(spark, sf_dir), duck.sql(spec.oracle))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_registry_within_driver_artifact_capacity():
    """The driver's correctness artifact records at most 50 catalog entries
    (observed round 1: 65 registered -> first 50 alphabetical recorded);
    exceeding it silently drops the alphabetical tail's hash rows. Merge
    same-theme gates (kernel_value_slices precedent) instead."""
    assert len(REGISTRY) <= 50, sorted(REGISTRY)[50:]


def test_learned_sketch_ops_concurrent_sessions_deterministic(spark, sf_dir):
    """VERDICT r9 #5 — the thread-parallel gate build shares checkpointed
    intermediates (one embeddings slim, one events slim) across branches;
    two CONCURRENT evaluations of the whole gate in one Spark session must
    not cross-talk through the cache manager / checkpoint reuse. Runs the
    gate twice in parallel threads and asserts bit-identical sorted rows."""
    from concurrent.futures import ThreadPoolExecutor

    from tests.oracle import _normalize

    spec = REGISTRY["learned_sketch_ops"]

    def run(_):
        return _normalize(spec.spark(spark, sf_dir).toPandas())

    with ThreadPoolExecutor(max_workers=2) as pool:
        a, b = list(pool.map(run, range(2)))
    assert a.equals(b)
