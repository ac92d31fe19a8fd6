"""Distributed suffix array / LCP / exact duplicate spans
(pipeline/suffix.py) vs a brute-force sorted-suffix oracle."""

import random

import pytest
from pyspark.sql import functions as F

from enterprise_warp_spark.pipeline.suffix import (
    adjacent_lcp,
    corpus_positions,
    exact_duplicate_spans,
    suffix_array,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _brute(texts):
    """All suffixes (with per-doc sentinels) in sorted order + adjacent
    LCPs, exactly the module's contract, computed the slow way."""
    seqs = []
    for d, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w] + [f"\x00{d}"]
        base = sum(len(s[2]) for s in seqs)
        seqs.append((d, base, toks))
    sufs = []
    for d, base, toks in seqs:
        for i in range(len(toks)):
            sufs.append((toks[i:], base + i, d, i))
    sufs.sort(key=lambda s: s[0])
    lcps = []
    for x, y in zip(sufs, sufs[1:]):
        n = 0
        for u, v in zip(x[0], y[0]):
            if u != v:
                break
            n += 1
        lcps.append((x[1], y[1], n, x[2], y[2], x[3], y[3]))
    return sufs, lcps


TEXTS = [
    "the cat sat on the mat and the cat sat still",
    "a dog and the cat sat on the mat together today",
    "completely different words here entirely",
    "the cat sat on the mat and the cat sat still",  # full duplicate of 0
]


def test_suffix_order_matches_brute_force(spark):
    pos = corpus_positions(_docs(spark, TEXTS))
    sa, _ = suffix_array(pos)
    got = [
        r["pos"]
        for r in sa.orderBy("sa_rank").collect()
    ]
    want = [s[1] for s in _brute(TEXTS)[0]]
    assert got == want


def test_adjacent_lcp_matches_brute_force(spark):
    pos = corpus_positions(_docs(spark, TEXTS))
    sa, levels = suffix_array(pos)
    got = {
        (r["pos_a"], r["pos_b"]): r["lcp"]
        for r in adjacent_lcp(sa, levels).collect()
    }
    want = {(a, b): n for a, b, n, *_ in _brute(TEXTS)[1]}
    assert got == want


def test_exact_duplicate_spans_finds_the_clone_and_the_phrase(spark):
    spans = exact_duplicate_spans(
        _docs(spark, TEXTS), min_tokens=5
    ).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # docs 0 and 3 are identical (11 tokens): a full-length span each way
    full = [r for r in by_doc.get(0, []) if r["twin_doc"] == 3]
    assert any(r["n_tokens"] == 11 and r["start_tok"] == 0 for r in full)
    full3 = [r for r in by_doc.get(3, []) if r["twin_doc"] == 0]
    assert any(r["n_tokens"] == 11 and r["start_tok"] == 0 for r in full3)
    # the shared phrase 'the cat sat on the mat' (6 tokens) surfaces on
    # doc 1 against ONE of the identical twins (its suffix is adjacent to
    # whichever twin sorts next to it — adjacency semantics; the other
    # twin is reachable through the run, exactly as in the paper)
    assert any(
        r["twin_doc"] in (0, 3) and r["n_tokens"] == 6
        for r in by_doc.get(1, [])
    )
    # doc 2 shares nothing of length >= 5
    assert 2 not in by_doc


def test_within_doc_repeats_gated_by_flag(spark):
    texts = ["x y z q r s t u x y z q r s t u tail words here now"]
    cross = exact_duplicate_spans(
        _docs(spark, texts), min_tokens=8, cross_doc_only=True
    ).count()
    assert cross == 0
    within = exact_duplicate_spans(
        _docs(spark, texts), min_tokens=8, cross_doc_only=False
    ).collect()
    assert any(r["n_tokens"] == 8 for r in within)


def test_randomized_corpora_match_brute(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
            for _ in range(rng.randint(2, 6))
        ]
        pos = corpus_positions(_docs(spark, texts))
        sa, levels = suffix_array(pos)
        got_order = [r["pos"] for r in sa.orderBy("sa_rank").collect()]
        sufs, lcps = _brute(texts)
        assert got_order == [s[1] for s in sufs], (trial, texts)
        got_lcp = {
            (r["pos_a"], r["pos_b"]): r["lcp"]
            for r in adjacent_lcp(sa, levels).collect()
        }
        assert got_lcp == {(a, b): n for a, b, n, *_ in lcps}, trial


def test_single_doc_and_empty_text_edge(spark):
    sa, _ = suffix_array(corpus_positions(_docs(spark, ["one two"])))
    assert sa.count() == 3  # two tokens + sentinel
    # an empty text contributes only its sentinel position
    sa2, _ = suffix_array(corpus_positions(_docs(spark, ["", "a b"])))
    assert sa2.count() == 4


def test_strip_exact_duplicate_spans_removes_the_phrase(spark):
    from enterprise_warp_spark.pipeline.suffix import (
        strip_exact_duplicate_spans,
    )

    texts = [
        "alpha beta the cat sat on the mat gamma delta",
        "one two three the cat sat on the mat four five six",
        "totally unrelated content in this document",
    ]
    out = {
        r["doc_id"]: r
        for r in strip_exact_duplicate_spans(
            _docs(spark, texts), min_tokens=6
        ).collect()
    }
    assert out[0]["cleaned_text"] == "alpha beta gamma delta"
    assert out[1]["cleaned_text"] == "one two three four five six"
    assert out[0]["n_removed_tokens"] == 6
    assert out[2]["cleaned_text"] == texts[2]
    assert out[2]["n_removed_tokens"] == 0


def test_non_ascii_corpus_matches_brute(spark):
    """UTF-8 byte order == code-point order by design, so Spark's string
    comparison and Python's sort agree on accented/CJK/emoji tokens —
    pinned here because the whole suffix order rests on it."""
    texts = [
        "café über straße 中文 字 🎵 note café über",
        "中文 字 appears again 中文 字 and café too",
        "ASCII only words here",
    ]
    pos = corpus_positions(_docs(spark, texts))
    sa, levels = suffix_array(pos)
    got = [r["pos"] for r in sa.orderBy("sa_rank").collect()]
    sufs, lcps = _brute(texts)
    assert got == [s[1] for s in sufs]
    got_lcp = {
        (r["pos_a"], r["pos_b"]): r["lcp"]
        for r in adjacent_lcp(sa, levels).collect()
    }
    assert got_lcp == {(a, b): n for a, b, n, *_ in lcps}


def test_sharded_spans_subset_of_global_and_exact_within_shard(spark):
    from enterprise_warp_spark.pipeline.suffix import (
        exact_duplicate_spans_sharded,
    )

    texts = [
        "the cat sat on the mat and slept there all day",  # 0
        "the cat sat on the mat and slept there all day",  # 1 (dup of 0)
        "a completely different document goes right here",  # 2
        "another text where the cat sat on the mat appears",  # 3
    ]
    docs = _docs(spark, texts)
    key = lambda r: (r["doc_id"], r["start_tok"], r["n_tokens"],  # noqa: E731
                     r["twin_doc"])
    global_spans = {
        key(r) for r in exact_duplicate_spans(docs, min_tokens=6).collect()
    }
    sharded = {
        key(r)
        for r in exact_duplicate_spans_sharded(
            docs, n_shards=2, min_tokens=6
        ).collect()
    }
    # sharded never invents pairs
    assert sharded <= global_spans
    # pairs whose docs share a shard are found exactly
    from pyspark.sql import functions as _F

    shard = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", _F.pmod(_F.xxhash64("doc_id"), _F.lit(2)).alias("s")
        ).collect()
    }
    want_within = {
        k for k in global_spans if shard[k[0]] == shard[k[3]]
    }
    assert sharded == want_within
    # n_shards=1 is exactly the global result
    one = {
        key(r)
        for r in exact_duplicate_spans_sharded(
            docs, n_shards=1, min_tokens=6
        ).collect()
    }
    assert one == global_spans
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        exact_duplicate_spans_sharded(docs, n_shards=0)
