"""Streaming/batch parity: the streaming rollup must equal the batch
hourly_event_rollup on the same data (availableNow trigger + memory sink)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def rolled(spark, sf_dir):
    from enterprise_warp_spark.streaming import stream_events, windowed_rollup

    q = (
        windowed_rollup(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("select * from rollup_test")


def test_stream_rollup_matches_batch(spark, sf_dir, rolled):
    from enterprise_warp_spark.tables import table

    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    b = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch.collect()}
    s = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in rolled.collect()}
    assert set(b) == set(s)
    for k in b:
        assert b[k][0] == s[k][0]
        assert b[k][1] == pytest.approx(s[k][1], rel=1e-9)


def test_streaming_dedup(spark, sf_dir):
    from enterprise_warp_spark.streaming import stream_events, streaming_dedup

    q = (
        streaming_dedup(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n, count(distinct event_id) d from dedup_test").first()
    assert got["n"] == got["d"] > 0


def test_sessionized_activity(spark, sf_dir):
    from enterprise_warp_spark.streaming import sessionized_activity, stream_events

    q = (
        sessionized_activity(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sessions_test").collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] and r["n_events"] > 0 for r in rows)


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream watermarked range join == the equivalent batch join."""
    from enterprise_warp_spark.streaming.events import (
        stream_stream_attribution_join,
    )
    from enterprise_warp_spark.tables import table

    q = (
        stream_stream_attribution_join(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["click_id"], r["view_id"])
        for r in spark.sql("select * from ssj_test").collect()
    }
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    want = {
        (r["click_id"], r["view_id"])
        for r in clicks.join(
            views,
            F.expr(
                "c_user = v_user AND view_ts <= click_ts "
                "AND view_ts > click_ts - INTERVAL 1 HOUR"
            ),
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_incremental_filter_empty_batch_never_poisons_index(spark, tmp_path):
    """An empty batch (or one whose survivors are empty) must not leave a
    data-less parquet directory that crashes every later probe (review
    finding: append of an empty frame creates _SUCCESS-only dirs)."""
    import pandas as pd

    from enterprise_warp_spark.pipeline.dedup import incremental_minhash_filter

    idx = str(tmp_path / "band_index")
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = incremental_minhash_filter(empty, idx, update_index=True)
    assert out.count() == 0
    # second batch with real docs: the probe must work, not crash on a
    # schema-less index directory
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a completely different document about spark")],
        "doc_id long, text string",
    )
    out2 = incremental_minhash_filter(docs, idx, update_index=True)
    assert out2.count() == 2
    # and a third batch re-probing the now-real index sees batch-2's bands
    dup = spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out3 = incremental_minhash_filter(dup, idx, update_index=False)
    assert out3.count() == 0  # near-copy of doc 1 filtered via the index


def test_streaming_ddsketch_equals_batch_sketch(spark, sf_dir):
    """DDSketch under Structured Streaming: because the sketch is a plain
    bucket-count aggregate (mergeable by addition), the streaming build
    over the event stream equals the batch ddsketch_by bit-for-bit — and
    so do the quantile estimates derived from it. Streaming quantiles for
    free, no custom state."""
    import math

    from pyspark.sql import functions as F

    from enterprise_warp_spark.operators.sketches import (
        ddsketch_by,
        ddsketch_quantiles,
    )
    from enterprise_warp_spark.streaming import stream_events
    from enterprise_warp_spark.tables import table

    alpha = 0.02
    gamma = (1 + alpha) / (1 - alpha)
    lg = math.log(gamma)
    sgn = "cast(sign(value) as int)"
    idx = (
        "CASE WHEN value = 0 THEN cast(0 as bigint) "
        f"ELSE cast(ceil(round(ln(abs(value)) / {lg!r}, 6)) as bigint) END"
    )
    q = (
        stream_events(spark, sf_dir)
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.expr(sgn).alias("sign"), F.expr(idx).alias("idx")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .writeStream.format("memory")
        .queryName("dds_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("select * from dds_stream_test")
    batch_sk = ddsketch_by(
        table(spark, sf_dir, "events"), "event_type", "value", alpha=alpha
    )
    key = lambda r: (r["event_type"], r["sign"], r["idx"])  # noqa: E731
    assert {key(r): r["c"] for r in streamed.collect()} == {
        key(r): r["c"] for r in batch_sk.collect()
    }
    # quantiles from the streamed sketch == quantiles from the batch sketch
    sq = ddsketch_quantiles(streamed, "event_type", (0.5, 0.95), alpha=alpha)
    bq = ddsketch_quantiles(batch_sk, "event_type", (0.5, 0.95), alpha=alpha)
    pick = lambda df: {  # noqa: E731
        (r["event_type"], r["p"]): (r["rank"], r["est"]) for r in df.collect()
    }
    assert pick(sq) == pick(bq)


def test_streaming_ams_f2_equals_batch(spark, sf_dir):
    """AMS F2 under Structured Streaming: the sketch is a plain sign-sum
    aggregate (mergeable by addition), so ams_f2_by runs UNCHANGED on the
    event stream in complete mode and equals the batch build bit-for-bit
    — exact integer counters, so the median-of-means estimates match
    exactly too (the DDSketch pattern)."""
    from enterprise_warp_spark.operators.sketches import (
        ams_f2_by,
        ams_f2_estimate,
    )
    from enterprise_warp_spark.streaming import stream_events
    from enterprise_warp_spark.tables import table

    q = (
        ams_f2_by(
            stream_events(spark, sf_dir).select("event_type", "value"),
            "event_type",
            "value",
            r=8,
        )
        .writeStream.format("memory")
        .queryName("ams_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("select * from ams_stream_test")
    batch = ams_f2_by(
        table(spark, sf_dir, "events"), "event_type", "value", r=8
    )
    key = lambda r: (r["event_type"], r["j"])  # noqa: E731
    s_rows = {key(r): r["z"] for r in streamed.collect()}
    assert s_rows == {key(r): r["z"] for r in batch.collect()}
    assert len(s_rows) > 0
    se = ams_f2_estimate(streamed, "event_type")
    be = ams_f2_estimate(batch, "event_type")
    pick = lambda df: {  # noqa: E731
        r["event_type"]: r["f2_est"] for r in df.collect()
    }
    assert pick(se) == pick(be)


def test_streaming_kmv_foreachbatch_merge_equals_batch(spark, sf_dir, tmp_path):
    """KMV under foreachBatch: each micro-batch's kept table (its k
    smallest distinct hashes) merges through kmv_rekept into EXACTLY the
    batch sketch — the global k smallest are each among their own batch's
    k smallest, so the merge is exact, and so is the estimate."""
    from enterprise_warp_spark.operators.sketches import (
        kmv_distinct_by,
        kmv_estimate_from_kept,
        kmv_kept,
        kmv_rekept,
    )
    from enterprise_warp_spark.tables import table

    k = 32
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    src = str(tmp_path / "ev")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    merged_rows: list = []
    n_batches = [0]

    def sink(bdf, _bid):
        n_batches[0] += 1
        merged_rows.extend(
            (r["event_type"], r["__h"])
            for r in kmv_kept(bdf, "event_type", "user_id", k).collect()
        )

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert n_batches[0] >= 2, "merge path needs multiple micro-batches"
    union = spark.createDataFrame(merged_rows, "event_type string, __h long")
    est = kmv_estimate_from_kept(
        kmv_rekept(union, "event_type", k), "event_type", k
    )
    want = kmv_distinct_by(ev, "event_type", "user_id", k=k)
    pick = lambda df: {  # noqa: E731
        r["event_type"]: (r["n_kept"], r["kth_hash"], r["kmv_distinct"])
        for r in df.collect()
    }
    got = pick(est)
    assert got == pick(want) and len(got) > 0


def test_streaming_fd_foreachbatch_merge_keeps_contract(spark, tmp_path):
    """Frequent Directions under foreachBatch: per-micro-batch sketches
    fold through fd_merge (stack + one shrink); FD mergeability (GLPW
    2016) keeps the covariance-error contract over EVERYTHING streamed:
    ||A^T A - B^T B||_2 <= 2 ||A||_F^2 / ell, with A^T A - B^T B PSD."""
    import numpy as np

    from enterprise_warp_spark.pipeline.similarity import (
        fd_merge,
        frequent_directions,
    )

    rng = np.random.default_rng(21)
    A = rng.normal(size=(800, 16))
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(A)],
        "vec_id long, embedding array<double>",
    )
    src = str(tmp_path / "emb")
    df.repartition(4).write.mode("overwrite").parquet(src)

    ell = 10
    state = {"B": None, "batches": 0}

    def sink(bdf, _bid):
        state["batches"] += 1
        state["B"] = fd_merge(
            [state["B"], frequent_directions(bdf, ell=ell)], ell
        )

    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert state["batches"] >= 2
    B = state["B"]
    assert B.shape == (ell, 16)
    err = np.linalg.norm(A.T @ A - B.T @ B, 2)
    assert err <= 2.0 * (np.linalg.norm(A, "fro") ** 2) / ell
    assert np.linalg.eigvalsh(A.T @ A - B.T @ B).min() >= -1e-6


def test_source_bytes_resolves_non_local_uris(spark, sf_dir):
    """r14 verdict #3: streaming state sizing used os.path.getsize, which
    throws OSError on any non-local URI (hdfs://, s3a://, file:) and
    silently floored a 100 TB stream to 8 state partitions. The Hadoop-FS
    helper must resolve a `file:` URI (the non-local-path semantics we can
    exercise without a cluster) to the real byte size, and degrade to 0 —
    not raise — for a missing path."""
    import os

    from enterprise_warp_spark.streaming.events import _source_bytes

    local = os.path.join(sf_dir, "events.parquet")
    want = os.path.getsize(local)
    assert want > 0
    # scheme-qualified URI: os.path.getsize(uri) raises; Hadoop FS must not
    uri = "file://" + os.path.abspath(local)
    with __import__("pytest").raises(OSError):
        os.path.getsize(uri)
    assert _source_bytes(spark, uri) == want
    # plain local path still works (the bench/driver call shape)
    assert _source_bytes(spark, local) == want
    # directory: recursive content summary, >= the single file
    assert _source_bytes(spark, "file://" + os.path.abspath(sf_dir)) >= want
    # missing path: 0, never an exception (callers floor the count)
    assert _source_bytes(spark, "file:///definitely/not/there") == 0
    assert _source_bytes(spark, "/definitely/not/there") == 0
