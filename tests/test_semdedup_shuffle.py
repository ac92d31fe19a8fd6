"""SemDeDup (within-cluster semantic dedup) and deterministic corpus
shuffle."""

import math
import random

import pytest


def _emb_corpus(spark, seed=11):
    """Clusters of near-identical vectors plus isolated singletons; ids
    assigned so duplicate groups span id ranges (exercises transitivity)."""
    rng = random.Random(seed)
    rows = []
    vid = 0
    # 4 duplicate families around distinct anchors, 3-5 members each
    for fam in range(4):
        anchor = [rng.uniform(-1, 1) for _ in range(8)]
        for _ in range(3 + fam % 3):
            jitter = [a + rng.uniform(-0.003, 0.003) for a in anchor]
            rows.append((vid, jitter))
            vid += 1
    # 10 singletons far apart
    for s in range(10):
        v = [0.0] * 8
        v[s % 8] = 10.0 + s
        rows.append((vid, v))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute_pairs(rows, threshold):
    out = set()
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1 :]:
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            if round(dot / (na * nb), 6) >= threshold:
                out.add((min(ia, ib), max(ia, ib)))
    return out


def test_semdedup_pairs_within_cell_match_brute_force(spark):
    """With nprobe-style cells covering the corpus, every brute-force
    duplicate pair whose members share a cell is found, at the exact
    cosine. With n_cells=1 (single cell) recall is total."""
    from enterprise_warp_spark.pipeline.similarity import semdedup_pairs

    emb = _emb_corpus(spark)
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    want = _brute_pairs(rows, 0.999)
    got = {
        (r["vec_a"], r["vec_b"])
        for r in semdedup_pairs(emb, threshold=0.999, n_cells=1).collect()
    }
    assert got == want and len(want) >= 10


def test_semdedup_keep_list_one_rep_per_family(spark):
    """Keep-list retains exactly one representative (min id) per duplicate
    family and every singleton."""
    from enterprise_warp_spark.pipeline.similarity import (
        semdedup_keep_list,
        semdedup_pairs,
    )

    emb = _emb_corpus(spark)
    kept = {r["vec_id"] for r in semdedup_keep_list(emb, 0.999, n_cells=1).collect()}
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    fams = _brute_pairs(rows, 0.999)
    # union-find over brute pairs
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in fams:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i for i, _ in rows if find(i) == i}
    assert kept == want

    # clustered variant: recall may drop across cells, but never keeps a
    # non-representative AND never drops a singleton
    kept8 = {r["vec_id"] for r in semdedup_keep_list(emb, 0.999, n_cells=8).collect()}
    assert want <= kept8


def test_semdedup_plan_no_cartesian(spark):
    """Candidate generation: ONE shuffle on cell_id feeding the grouped
    Arrow gram kernel (FlatMapGroupsInPandas) — no CartesianProduct, no
    per-pair join materialization. (BroadcastNestedLoopJoin IS allowed:
    the centroid cell-assignment fan-out is corpus x n_cells against a
    broadcast table, same as the IVF paths in test_plan_quality.)"""
    from enterprise_warp_spark.pipeline.similarity import semdedup_pairs

    emb = _emb_corpus(spark)
    plan = (
        semdedup_pairs(emb, 0.999, n_cells=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    # the candidate pairs never exist as joined Spark rows
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_semdedup_gram_kernel_equals_sql_pair_join(spark, sf_dir):
    """The Arrow gram kernel must reproduce the r10 SQL equi-join pair set
    and cosines EXACTLY (the [semd] gate hashes these values): rebuild the
    join shape from the same assignment and compare row-for-row on the
    real embeddings table plus the synthetic families."""
    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline.similarity import (
        DOT,
        _cell_distances,
        _with_norm_sq,
        deterministic_centroids,
        semdedup_pairs,
    )

    def sql_twin(emb, threshold, n_cells):
        from pyspark.sql import Window

        n = _with_norm_sq(emb)
        cents = deterministic_centroids(emb, n_cells)
        d = _cell_distances(n, cents, "embedding")
        w = Window.partitionBy("vec_id").orderBy("dist", "cell_id")
        assigned = (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "embedding", "nsq", "cell_id")
            .localCheckpoint(eager=True)
        )
        a = assigned.select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_emb"),
            F.col("nsq").alias("a_nsq"), "cell_id",
        )
        b = assigned.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b_emb"),
            F.col("nsq").alias("b_nsq"), "cell_id",
        )
        dot = DOT.format(a="a_emb", b="b_emb")
        return (
            a.join(b, "cell_id")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .withColumn(
                "cosine", F.round(F.expr(f"{dot} / sqrt(a_nsq * b_nsq)"), 6)
            )
            .filter(F.col("cosine") >= threshold)
            .select("vec_a", "vec_b", "cosine")
        )

    for emb, thr, cells in (
        (spark.read.parquet(f"{sf_dir}/embeddings.parquet"), 0.35, 8),
        (_emb_corpus(spark), 0.999, 4),
    ):
        want = {
            (r["vec_a"], r["vec_b"]): r["cosine"]
            for r in sql_twin(emb, thr, cells).collect()
        }
        got = {
            (r["vec_a"], r["vec_b"]): r["cosine"]
            for r in semdedup_pairs(emb, thr, cells).collect()
        }
        assert got == want and len(want) > 0


def test_shuffle_corpus_deterministic_and_mixing(spark):
    """Order is a pure function of (data, seed): invariant under input
    partitioning; different under a different seed; sources interleave
    (no long single-source runs)."""
    from pyspark.sql import functions as F

    from enterprise_warp_spark.operators.sampling import shuffle_corpus

    n = 400
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n / 2, F.lit("src_a")).otherwise(F.lit("src_b")).alias(
            "source"
        ),
    )
    o1 = [r["doc_id"] for r in shuffle_corpus(df, "doc_id", seed=1, n_partitions=4).toLocalIterator()]
    o2 = [
        r["doc_id"]
        for r in shuffle_corpus(df.repartition(17), "doc_id", seed=1, n_partitions=4).toLocalIterator()
    ]
    assert o1 == o2 and sorted(o1) == list(range(n))
    o3 = [r["doc_id"] for r in shuffle_corpus(df, "doc_id", seed=2, n_partitions=4).toLocalIterator()]
    assert o3 != o1

    # mixing: max run of one source far below the n/2 block of the input
    srcs = ["src_a" if d < n / 2 else "src_b" for d in o1]
    longest = cur = 1
    for i in range(1, len(srcs)):
        cur = cur + 1 if srcs[i] == srcs[i - 1] else 1
        longest = max(longest, cur)
    assert longest <= 25


def test_semdedup_auto_cells_production_default(spark):
    """n_cells=None (production contract) derives the cell count from a
    corpus count so expected cell size stays ~SEMDEDUP_TARGET_CELL_ROWS —
    and still finds the same exact-duplicate pairs a fixed-cell run does
    on a small corpus (auto resolves to the 4-cell floor here)."""
    import numpy as np

    from enterprise_warp_spark.pipeline.similarity import (
        SEMDEDUP_TARGET_CELL_ROWS,
        semdedup_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(30, 8))
    rows = [(i, [float(x) for x in base[i % 30]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    auto = {
        (r["vec_a"], r["vec_b"])
        for r in semdedup_pairs(emb, threshold=0.999).collect()
    }
    # every duplicated base vector pairs with its copy (same cell: the
    # centroid assignment is deterministic on identical vectors)
    assert {(i, i + 30) for i in range(30)} <= auto
    assert SEMDEDUP_TARGET_CELL_ROWS >= 60  # floor engaged for this corpus


def test_assign_cells_arrow_tie_breaks_to_lowest_cell(spark):
    """The kernel's np.argmin-first-minimum must reproduce the SQL
    window's ORDER BY dist, cell_id on EXACT rounded-distance ties —
    crafted here: vectors equidistant between two centroids (and one
    exactly ON a centroid) must land in the LOWER cell_id."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline.similarity import (
        _assign_cells_arrow,
        _cell_distances,
        _with_norm_sq,
    )

    # centroids at +/-1 on axis 0; vectors on the perpendicular bisector
    # (axis-0 coord 0) are EXACTLY equidistant at any axis-1 offset
    rows = [
        (0, [1.0, 0.0]), (1, [-1.0, 0.0]),       # the two centroids
        (10, [0.0, 0.0]), (11, [0.0, 2.5]), (12, [0.0, -7.0]),  # ties
        (13, [1.0, 0.0]),                          # exactly ON centroid 0
        (14, [-1.0, 0.5]),                         # clear cell 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n = _with_norm_sq(emb)
    cents = (
        _with_norm_sq(emb.filter("vec_id < 2"))
        .selectExpr("cast(vec_id as int) cell_id", "embedding c_emb",
                    "nsq c_nsq")
    )
    got = {
        r["vec_id"]: r["cell_id"]
        for r in _assign_cells_arrow(n, cents, "embedding", "vec_id").collect()
    }
    assert got[10] == 0 and got[11] == 0 and got[12] == 0  # ties -> lower
    assert got[13] == 0 and got[14] == 1

    # and the SQL window twin agrees row-for-row
    d = _cell_distances(n, cents, "embedding")
    w = Window.partitionBy("vec_id").orderBy("dist", "cell_id")
    sql = {
        r["vec_id"]: r["cell_id"]
        for r in d.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").select("vec_id", "cell_id").collect()
    }
    assert got == sql


def test_blas_vs_fold_dot_margin_is_orders_below_round_grain(spark, sf_dir):
    """The Arrow kernels round cosines/distances at 6 dp and argue the
    BLAS-vs-SQL-fold summation difference is absorbed ('round-6
    doctrine'). Measure that margin instead of asserting it: over every
    within-cell pair of the real embeddings table, max |BLAS dot - fold
    dot| must sit >= 4 orders of magnitude below the 0.5e-6 rounding
    grain (so a boundary flip needs a ~1e-10-probability coincidence per
    value, not a plausible event)."""
    import numpy as np

    from enterprise_warp_spark.pipeline.similarity import DOT

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    E = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
    # fold dots via SQL for a deterministic pair sample (all pairs of the
    # first 80 vectors: 3160 dot products)
    sub = emb.filter("vec_id < 80")
    a = sub.selectExpr("vec_id va", "embedding ea")
    b = sub.selectExpr("vec_id vb", "embedding eb")
    fold = {
        (r["va"], r["vb"]): r["d"]
        for r in a.crossJoin(b)
        .filter("va < vb")
        .selectExpr("va", "vb", DOT.format(a="ea", b="eb") + " AS d")
        .collect()
    }
    ids = {r["vec_id"]: i for i, r in enumerate(rows)}
    worst = 0.0
    for (va, vb), d in fold.items():
        blas = float(E[ids[va]] @ E[ids[vb]])
        worst = max(worst, abs(blas - d))
    assert len(fold) == 80 * 79 // 2
    assert worst < 5e-11, worst  # grain is 5e-7: >= 4 orders of margin


def _rand_corpus(spark, n=400, dim=8, seed=3):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_hier_assignment_all_probes_equals_flat(spark):
    """nprobe_super = n_super makes the two-level assignment search every
    centroid — it must reproduce the flat Arrow argmin EXACTLY (same
    round-6 distances, same lowest-cell_id tie-break), per vector."""
    from enterprise_warp_spark.pipeline.similarity import (
        _assign_cells_arrow,
        _with_norm_sq,
        assign_cells_hierarchical,
        deterministic_centroids,
    )

    emb = _rand_corpus(spark)
    n = _with_norm_sq(emb, "embedding", "vec_id")
    cents = deterministic_centroids(emb, 25, "embedding", "vec_id")
    flat = {
        r["vec_id"]: r["cell_id"]
        for r in _assign_cells_arrow(n, cents, "embedding", "vec_id").collect()
    }
    hier = assign_cells_hierarchical(
        n, cents, "embedding", "vec_id", n_super=5, nprobe_super=5
    )
    got = {r["vec_id"]: r["cell_id"] for r in hier.collect()}
    assert got == flat
    # payload columns survive the struct-min reduce intact
    one = hier.limit(1).collect()[0]
    assert len(one["embedding"]) == 8 and one["nsq"] > 0


def test_hier_assignment_partial_probes_recall(spark):
    """With the default modest nprobe_super, most (not necessarily all)
    vectors still land in their true nearest cell; every assignment must
    at least be a cell WITHIN a probed super — and exact ids must appear
    once each (no duplicate/lost vectors through the cogroup+reduce)."""
    from enterprise_warp_spark.pipeline.similarity import (
        _assign_cells_arrow,
        _with_norm_sq,
        assign_cells_hierarchical,
        deterministic_centroids,
    )

    emb = _rand_corpus(spark, n=600, seed=9)
    n = _with_norm_sq(emb, "embedding", "vec_id")
    cents = deterministic_centroids(emb, 36, "embedding", "vec_id")
    hier = assign_cells_hierarchical(
        n, cents, "embedding", "vec_id", n_super=6, nprobe_super=3
    ).collect()
    assert len(hier) == 600 and len({r["vec_id"] for r in hier}) == 600
    flat = {
        r["vec_id"]: r["cell_id"]
        for r in _assign_cells_arrow(n, cents, "embedding", "vec_id").collect()
    }
    agree = sum(1 for r in hier if flat[r["vec_id"]] == r["cell_id"])
    assert agree / len(hier) >= 0.5  # random data is the worst case


def test_semdedup_pairs_hier_mode_matches_flat(spark):
    """The full SemDeDup pipeline through assign='hier' (all probes) must
    emit the identical pair set + cosines as the flat path."""
    from enterprise_warp_spark.pipeline.similarity import semdedup_pairs

    emb = _emb_corpus(spark)
    flat = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in semdedup_pairs(emb, threshold=0.999, n_cells=4).collect()
    }
    hier = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in semdedup_pairs(
            emb, threshold=0.999, n_cells=4, assign="hier", nprobe_super=4
        ).collect()
    }
    assert hier == flat and len(flat) > 0
    with pytest.raises(ValueError, match="assign"):
        semdedup_pairs(emb, n_cells=4, assign="nope").collect()


def test_assign_auto_picks_flat_below_threshold(spark):
    """assign='auto' with a small centroid table routes through the flat
    kernel and matches the explicit flat call."""
    from enterprise_warp_spark.pipeline.similarity import semdedup_pairs

    emb = _emb_corpus(spark)
    flat = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in semdedup_pairs(emb, threshold=0.999, n_cells=4).collect()
    }
    auto = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in semdedup_pairs(
            emb, threshold=0.999, n_cells=4, assign="auto"
        ).collect()
    }
    assert auto == flat and len(flat) > 0
