"""Edit-distance threshold join: brute-force Levenshtein parity over random
typo-injected corpora, repeated-gram strings, and the short/long bridge."""

import random

import pytest


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _corpus(rng, n=120):
    vocab = ["johnson", "smithfield", "alexander", "rodriguez", "chen",
             "ab", "abc", "x", "aaaaaa", "aaaaab", "mueller", "oconnor"]
    out = []
    for i in range(n):
        base = rng.choice(vocab)
        s = list(base)
        for _ in range(rng.randint(0, 2)):
            op = rng.randint(0, 2)
            pos = rng.randrange(max(1, len(s)))
            if op == 0 and len(s) > 1:
                del s[pos]
            elif op == 1:
                s.insert(pos, rng.choice("abcdefz"))
            else:
                s[pos] = rng.choice("abcdefz")
        out.append((i, "".join(s)))
    return out


def test_edit_distance_join_matches_brute_force(spark):
    from enterprise_warp_spark.operators.fuzzy import edit_distance_join

    rng = random.Random(11)
    rows = _corpus(rng)
    df = spark.createDataFrame(rows, "id long, name string")
    for k in (1, 2):
        got = {
            (r["id_l"], r["id_r"]): r["distance"]
            for r in edit_distance_join(df, df, "name", max_dist=k).collect()
        }
        want = {
            (i, j): _lev(a, b)
            for i, a in rows
            for j, b in rows
            if _lev(a, b) <= k
        }
        assert set(got) == set(want), f"k={k}"
        for key, d in want.items():
            assert got[key] == d
        assert len(want) > len(rows)  # self-pairs + real fuzzy matches


def test_edit_distance_join_repeated_grams_and_nulls(spark):
    """'aaaaaa' vs 'aaaaab' (distance 1, distinct-gram overlap only 1) must
    match — the multiset count filter keeps it; NULLs never match."""
    from enterprise_warp_spark.operators.fuzzy import edit_distance_join

    df = spark.createDataFrame(
        [(1, "aaaaaa"), (2, "aaaaab"), (3, None), (4, "zzzzzz")],
        "id long, name string",
    )
    got = {
        frozenset((r["id_l"], r["id_r"]))
        for r in edit_distance_join(df, df, "name", max_dist=1).collect()
        if r["id_l"] != r["id_r"]
    }
    assert got == {frozenset((1, 2))}

    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(df, df, "name", max_dist=-1)


def test_edit_distance_join_multiplicity_and_q_sweep(spark):
    """Duplicate input rows keep their multiplicity identically whether
    their strings are long or short (surrogate-id architecture), and the
    three-pass split stays exact across q and k values."""
    from enterprise_warp_spark.operators.fuzzy import edit_distance_join

    dup = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abcdefgh"), (3, "ab"), (4, "ab")],
        "id long, name string",
    )
    out = edit_distance_join(dup, dup, "name", max_dist=2)
    long_pairs = out.filter("name_l = 'abcdefgh' and name_r = 'abcdefgh'").count()
    short_pairs = out.filter("name_l = 'ab' and name_r = 'ab'").count()
    assert long_pairs == 4 and short_pairs == 4  # 2x2 each, consistently

    rng = random.Random(3)
    rows = _corpus(rng, n=80)
    df = spark.createDataFrame(rows, "id long, name string")
    for q in (1, 2, 3):
        for k in (0, 1, 2):
            got = {
                (r["id_l"], r["id_r"])
                for r in edit_distance_join(df, df, "name", max_dist=k, q=q).collect()
            }
            want = {
                (i, j) for i, a in rows for j, b in rows if _lev(a, b) <= k
            }
            assert got == want, (q, k)


def test_pass_c_short_string_product_guard(spark, monkeypatch):
    """The <=max_dist-char population's pair product is the OUTPUT itself
    (every pair matches); past MAX_SHORT_PRODUCT the join must refuse
    loudly instead of silently materializing a quadratic result."""
    from enterprise_warp_spark.operators import fuzzy

    rows = [(i, "ab"[: 1 + i % 2]) for i in range(40)]  # all <= 2 chars
    df = spark.createDataFrame(rows, "id long, name string")
    monkeypatch.setattr(fuzzy, "MAX_SHORT_PRODUCT", 100)
    with pytest.raises(ValueError, match="MAX_SHORT_PRODUCT"):
        fuzzy.edit_distance_join(df, df, "name", max_dist=2, q=2)
    # under the bound it still works
    monkeypatch.setattr(fuzzy, "MAX_SHORT_PRODUCT", 10_000)
    n = fuzzy.edit_distance_join(df, df, "name", max_dist=2, q=2).count()
    assert n == 40 * 40  # every short pair is within 2 edits


def test_deletion_neighborhood_path_edges(spark):
    """max_dist <= 1 routes through the FastSS deletion-neighborhood join
    (r8): verify the length-class edges the old pass A/B/C split handled —
    empty strings, 1-char strings, and k=0 exact matching."""
    from enterprise_warp_spark.operators.fuzzy import edit_distance_join

    rows = [
        (0, ""), (1, "a"), (2, "b"), (3, "ab"), (4, "ba"),
        (5, "abc"), (6, "abd"), (7, "xyz"), (8, "a"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    for k in (0, 1):
        got = {
            (r["id_l"], r["id_r"], r["distance"])
            for r in edit_distance_join(df, df, "name", max_dist=k).collect()
        }
        want = {
            (i, j, _lev(a, b))
            for i, a in rows
            for j, b in rows
            if _lev(a, b) <= k
        }
        assert got == want, k
    # 'ab' vs 'ba' share deletion variants {'a','b'} but sit at distance 2
    # — the verify step must discard them at k=1
    assert (3, 4, 2) not in got and (3, 4, 1) not in got


def test_deletion_variants_runs_and_position_filter_completeness(spark):
    """r15: the deletion pass annotates each distinct deletion variant with
    its contiguous deletion-position run [p0, p1] and keeps a candidate
    only when runs overlap or one side is the un-deleted string (p0 = -1).
    Pin (a) the run semantics on repeated-char strings and (b) filter
    completeness: the filtered candidate set still contains every true
    distance<=1 pair on a fuzzed corpus (vs brute force)."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from enterprise_warp_spark.operators.fuzzy import (
        _deletion_run_starts,
        _deletion_variants,
        edit_distance_join,
    )

    rows = spark.createDataFrame(
        [("aab",), ("",), ("aaaa",), ("abba",)], ["t"]
    ).withColumn("__st", _deletion_run_starts("t")).select(
        "t", _deletion_variants("t", "__st").alias("dv")
    ).collect()
    got = {r["t"]: [(d["v"], d["p0"], d["p1"]) for d in r["dv"]] for r in rows}
    # itself first with (-1, -1); distinct deletions with contiguous runs
    assert got["aab"] == [("aab", -1, -1), ("ab", 0, 1), ("aa", 2, 2)]
    assert got[""] == [("", -1, -1)]
    assert got["aaaa"] == [("aaaa", -1, -1), ("aaa", 0, 3)]
    assert got["abba"] == [
        ("abba", -1, -1), ("bba", 0, 0), ("aba", 1, 2), ("abb", 3, 3)
    ]

    # completeness fuzz: random short strings over a 2-char alphabet (max
    # repeat/collision pressure); the join must equal brute force at k=1
    rnd = random.Random(7)
    corpus = [
        "".join(rnd.choice("ab") for _ in range(rnd.randint(0, 5)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], ["rid", "name"]
    )
    got_pairs = {
        (r["rid_l"], r["rid_r"], r["distance"])
        for r in edit_distance_join(df, df, "name", max_dist=1).collect()
    }

    def lev(a, b):
        m = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[0], i
            for j, cb in enumerate(b, 1):
                prev, m[j] = m[j], min(
                    m[j] + 1, m[j - 1] + 1, prev + (ca != cb)
                )
        return m[len(b)]

    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.product(
            enumerate(corpus), enumerate(corpus)
        )
        if lev(a, b) <= 1
    }
    assert got_pairs == want
