"""Winnowing document fingerprints (Schleimer-Wilkerson-Aiken, SIGMOD 2003)
pinned against an independent pure-Python twin, plus the paper's two
structural guarantees (coverage of long matches; selection is a window min).

No reference-repo counterpart: this is LLM-data-pipeline surface
(document fingerprinting via rolling hashes)."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from enterprise_warp_spark.pipeline.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _h64(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def py_winnow(tokens: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Independent twin: 1-based (pos, hash) winnowing selection with the
    paper's rightmost-min tie rule; docs with fewer than w grams get one
    truncated window covering all grams."""
    m = len(tokens) - k + 1
    if m < 1:
        return set()
    gh = [_h64(" ".join(tokens[i : i + k])) for i in range(m)]
    sel = set()
    for i in range(1, max(1, m - w + 1) + 1):
        best = None
        for p in range(i, min(i + w - 1, m) + 1):
            if best is None or gh[p - 1] <= best[1]:
                best = (p, gh[p - 1])
        sel.add(best)
    return sel


def _corpus(n_docs=40, seed=7):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(50)]
    return [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 60))))
        for i in range(n_docs)
    ]


def test_matches_python_twin(spark):
    docs = spark.createDataFrame(_corpus(), ["doc_id", "text"])
    got = {
        (r.doc_id, r.pos, r.gh)
        for r in winnow_fingerprints(docs, k=6, w=4).collect()
    }
    want = {
        (i, p, h)
        for i, text in _corpus()
        for (p, h) in py_winnow(text.split(), 6, 4)
    }
    assert got == want


def test_guarantee_shared_run_yields_shared_fingerprint(spark):
    """SWA guarantee: a common token run of length >= w + k - 1 between two
    documents always produces at least one shared fingerprint hash."""
    rng = random.Random(3)
    k, w = 4, 5
    run = [f"c{i}" for i in range(w + k - 1)]  # exactly the guarantee bound
    rows = []
    for d in range(6):
        pre = [f"a{d}_{i}" for i in range(rng.randint(0, 20))]
        post = [f"b{d}_{i}" for i in range(rng.randint(0, 20))]
        rows.append((d, " ".join(pre + run + post)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = winnow_fingerprints(docs, k=k, w=w)
    shared = (
        fp.groupBy("gh").agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") == 6).count()
    )
    assert shared >= 1
    pairs = winnow_overlap_pairs(fp, min_shared=1).collect()
    assert len(pairs) == 15  # all C(6,2) pairs detected


def test_density_and_min_property(spark):
    """Every selected hash is the min of its covering window, and the
    selection count per doc never exceeds the window count."""
    for doc_id, text in _corpus(12, seed=11):
        toks = text.split()
        m = len(toks) - 6 + 1
        sel = py_winnow(toks, 6, 4)
        if m < 1:
            assert sel == set()
            continue
        gh = [_h64(" ".join(toks[i : i + 6])) for i in range(m)]
        assert len(sel) <= max(1, m - 4 + 1)
        for pos, h in sel:
            assert gh[pos - 1] == h
            lo = max(1, pos - 3)
            assert any(
                h <= min(gh[i - 1 : min(i + 3, m)])
                for i in range(lo, min(pos, max(1, m - 3)) + 1)
            )


def test_max_df_caps_ubiquitous_hash(spark):
    """A gram present in every document is dropped by max_df before the
    pair join — the quadratic-hot-key guard."""
    # shared run of w + k - 1 = 9 tokens -> guaranteed shared fingerprint
    run = " ".join(f"x{i}" for i in range(1, 10))
    rows = [(d, f"u{d}a u{d}b {run} u{d}c") for d in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = winnow_fingerprints(docs, k=6, w=4)
    assert winnow_overlap_pairs(fp, min_shared=1).count() == 28  # C(8,2)
    assert winnow_overlap_pairs(fp, min_shared=1, max_df=4).count() == 0


def test_short_docs(spark):
    """< k tokens: no fingerprint; k..w+k-2 tokens: exactly one truncated
    window, so at least one fingerprint."""
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b c d e f"), (2, "a b c d e f g")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.n for r in
           winnow_fingerprints(docs, k=6, w=4)
           .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0 not in out and out[1] == 1 and out[2] >= 1


def test_composes_with_cluster_machinery(spark):
    """Winnowing overlap pairs feed the existing transitive-cluster
    machinery: three mutually-overlapping docs + one clean doc collapse to
    one component plus a singleton-free remainder."""
    from enterprise_warp_spark.pipeline.dedup import connected_components

    shared = " ".join(f"s{i}" for i in range(12))  # >> w + k - 1
    rows = [
        (1, f"a1 a2 {shared} a3"),
        (2, f"b1 {shared} b2 b3"),
        (3, f"{shared} c1 c2 c3"),
        (4, "clean doc " + " ".join(f"z{i}" for i in range(12))),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = winnow_fingerprints(docs, k=6, w=4)
    pairs = winnow_overlap_pairs(fp, min_shared=1).select(
        F.col("doc_a"), F.col("doc_b")
    )
    comp = {
        r.doc_id: r.component for r in connected_components(pairs).collect()
    }
    assert comp[1] == comp[2] == comp[3]
    assert 4 not in comp  # never paired, never clustered
