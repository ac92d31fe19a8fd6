"""Quality classifier: separability, determinism, and JVM-only scoring."""

import random

import pytest


def _labeled_corpus(spark, n=150, seed=7):
    """Synthetic separable corpus: 'good' docs draw from a prose vocabulary
    with low repetition; 'bad' docs are keyword-stuffed boilerplate."""
    rng = random.Random(seed)
    prose = (
        "the quiet river winds through a valley where farmers tend orchards "
        "and children walk to school past the old stone bridge every morning"
    ).split()
    spam = "buy cheap now click here free winner casino deal offer".split()
    rows = []
    for i in range(n):
        good = " ".join(rng.choice(prose) for _ in range(30))
        rows.append((2 * i, good, 1))
        stuffed = " ".join(rng.choice(spam) for _ in range(30))
        rows.append((2 * i + 1, stuffed, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_separates_holdout(spark):
    from enterprise_warp_spark.pipeline.classify import (
        score_quality,
        train_quality_classifier,
    )

    corpus = _labeled_corpus(spark)
    train = corpus.filter("doc_id % 5 != 0")
    test = corpus.filter("doc_id % 5 = 0")
    model = train_quality_classifier(train, dim=1 << 14)
    scored = score_quality(model, test).collect()
    assert len(scored) == test.count()
    acc = sum(
        1 for r in scored if (r["quality_prob"] >= 0.5) == (r["label"] == 1)
    ) / len(scored)
    assert acc >= 0.95
    # input columns pass through; score bounded
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in scored)
    assert {"doc_id", "text", "label", "quality_prob"} == set(scored[0].asDict())


def test_classifier_deterministic_and_filter_schema(spark):
    from enterprise_warp_spark.pipeline.classify import (
        quality_filter,
        score_quality,
        train_quality_classifier,
    )

    corpus = _labeled_corpus(spark, n=60)
    m1 = train_quality_classifier(corpus, dim=1 << 13)
    m2 = train_quality_classifier(corpus, dim=1 << 13)
    s1 = {r["doc_id"]: r["quality_prob"] for r in score_quality(m1, corpus).collect()}
    s2 = {r["doc_id"]: r["quality_prob"] for r in score_quality(m2, corpus).collect()}
    for d in s1:
        assert s1[d] == pytest.approx(s2[d], rel=1e-9)

    kept = quality_filter(m1, corpus, threshold=0.5)
    assert kept.columns == corpus.columns
    # filter keeps mostly good docs
    labels = [r["label"] for r in kept.collect()]
    assert sum(labels) / len(labels) > 0.9


def test_scoring_plan_has_no_python_eval(spark):
    """The scoring chain must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython (python UDF) nodes in the physical plan."""
    from enterprise_warp_spark.pipeline.classify import (
        score_quality,
        train_quality_classifier,
    )

    corpus = _labeled_corpus(spark, n=30)
    model = train_quality_classifier(corpus, dim=1 << 12)
    plan = (
        score_quality(model, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_compression_ratio_orders_redundancy(spark):
    """pipeline/text.py compression_ratio: repetitive text compresses far
    below fluent text, which compresses below high-entropy noise; empty
    and null score null; plan is map-only (ArrowEvalPython, no shuffle)."""
    import random

    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline.text import compression_ratio

    rng = random.Random(11)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(2000))
    rows = [
        ("rep", "spam ham " * 250),
        ("flu", ("the quick brown fox jumps over the lazy dog and then "
                 "discusses compression ratios at considerable length ") * 5),
        ("rnd", noise),
        ("emp", ""),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    got = {r["k"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}
    assert got["emp"] is None and got["nul"] is None
    assert got["rep"] < 0.05 < got["flu"] < got["rnd"]
    assert got["rnd"] > 0.6
    plan = (
        compression_ratio(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
