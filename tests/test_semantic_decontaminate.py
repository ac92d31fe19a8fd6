"""Semantic decontamination vs brute force."""
import math
import random

import pytest

from enterprise_warp_spark.pipeline.decontaminate import (
    semantic_contamination,
    semantic_decontaminate,
)


def test_semantic_contamination_matches_brute(spark):
    rng = random.Random(4)
    evals = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(5)]
    corpus = []
    for i in range(60):
        if i % 10 == 0:  # planted near-duplicate of an eval row
            base = evals[(i // 10) % 5]
            corpus.append([x + rng.uniform(-0.002, 0.002) for x in base])
        else:
            corpus.append([rng.uniform(-1, 1) for _ in range(8)])
    cdf = spark.createDataFrame(
        list(enumerate(corpus)), "vec_id long, embedding array<double>"
    )
    edf = spark.createDataFrame(
        list(enumerate(evals)), "vec_id long, embedding array<double>"
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6) if na and nb else 0.0

    want = {
        i: max(cos(c, e) for e in evals) for i, c in enumerate(corpus)
    }
    got = {
        r["vec_id"]: (r["max_eval_cosine"], r["contaminated"])
        for r in semantic_contamination(cdf, edf, threshold=0.99).collect()
    }
    for i in range(60):
        assert got[i][0] == pytest.approx(want[i], abs=2e-6), i
        assert got[i][1] == (want[i] >= 0.99), i
    kept = semantic_decontaminate(cdf, edf, threshold=0.99)
    assert kept.count() == sum(1 for v in want.values() if v < 0.99)
    assert set(kept.columns) == {"vec_id", "embedding"}
    # map-only plan: no shuffle, no join
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_zero_vectors_and_empty_eval(spark):
    cdf = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    edf = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: r for r in semantic_contamination(cdf, edf).collect()}
    assert got[1]["max_eval_cosine"] == 0.0 and not got[1]["contaminated"]
    assert got[2]["max_eval_cosine"] == 1.0 and got[2]["contaminated"]
    with pytest.raises(ValueError, match="empty eval"):
        semantic_contamination(cdf, edf.limit(0)).collect()
