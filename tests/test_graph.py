"""Link-graph analytics: PageRank vs a dense numpy reference, degrees,
and rank-derived quality weights."""

import numpy as np
import pytest


def _edges(spark):
    # a small directed graph incl. a dangling node (3) and a hub (0)
    rows = [
        ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("c", "b"),
        ("a", "d"),  # d is dangling (no out-links)
        ("e", "a"),  # e feeds the hub
    ]
    return spark.createDataFrame(rows, "src string, dst string")


def _numpy_pagerank(edges, nodes, d=0.85, iters=20):
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    odeg = np.zeros(n)
    for s, t in edges:
        odeg[idx[s]] += 1
    for s, t in edges:
        M[idx[t], idx[s]] += 1.0 / odeg[idx[s]]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[odeg == 0].sum()
        r = (1 - d) / n + d * (M @ r + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_dense_reference(spark):
    from enterprise_warp_spark.pipeline.graph import pagerank

    edges = _edges(spark)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    nodes = sorted({v for e in pairs for v in e})
    want = _numpy_pagerank(pairs, nodes)
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=20).collect()}
    assert set(got) == set(want)
    for v in nodes:
        assert got[v] == pytest.approx(want[v], rel=1e-9)
    # ranks form a distribution; the hub outranks the leaf feeder
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["a"] > got["e"]


def test_degrees_and_quality_weights(spark):
    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline.graph import (
        degrees,
        pagerank,
        rank_quality_weights,
    )

    edges = _edges(spark)
    deg = {r["node"]: (r["out_degree"], r["in_degree"]) for r in degrees(edges).collect()}
    assert deg["a"] == (3, 3) and deg["d"] == (0, 1) and deg["e"] == (1, 0)

    ranks = pagerank(edges, iterations=10)
    docs = spark.createDataFrame(
        [(1, "a"), (2, "e"), (3, "unknown_host")],
        "doc_id long, source string",
    )
    out = {r["doc_id"]: r["rank_weight"] for r in rank_quality_weights(docs, ranks).collect()}
    assert out[1] == pytest.approx(1.0)          # top-ranked host -> weight 1
    assert 0.1 <= out[2] < out[1]                # low-rank host in [floor, 1)
    assert out[3] == pytest.approx(0.1)          # unknown host -> floor


def test_pagerank_and_weights_guards(spark):
    """Validation and edge semantics: bad iterations raise up front; an
    empty ranks table raises; uniform ranks give every KNOWN host weight 1
    (distinguishable from the unknown-host floor)."""
    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline.graph import pagerank, rank_quality_weights

    edges = _edges(spark)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.5)

    docs = spark.createDataFrame([(1, "x"), (2, "zz")], "doc_id long, source string")
    empty = spark.createDataFrame([], "node string, rank double")
    with pytest.raises(ValueError, match="empty"):
        rank_quality_weights(docs, empty)

    # 2-cycle: perfectly regular graph -> uniform ranks
    cyc = spark.createDataFrame([("x", "y"), ("y", "x")], "src string, dst string")
    uni = pagerank(cyc, iterations=5)
    out = {r["doc_id"]: r["rank_weight"] for r in rank_quality_weights(docs, uni).collect()}
    assert out[1] == pytest.approx(1.0)   # known host: full weight
    assert out[2] == pytest.approx(0.1)   # unknown host: floor
