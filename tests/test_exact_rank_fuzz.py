"""Property-fuzz for exact_rank_select (VERDICT r11 #9): adversarial float
distributions — denormals, ulp-adjacent ties, +-DBL_MAX ranges whose width
overflows double, +-inf, -0.0, heavy duplication — against a local
sorted-list oracle. The audio-decoder fuzz pattern applied to the one
operator whose float boundary handling (binning.py) carries the most
careful arithmetic.

Ranking contract under specials: NaN/NULL have no rank (excluded); -inf
ranks first, +inf last; -0.0 == 0.0 (either spelling is a correct answer
for a rank that lands on the zero tie, matching SQL total order's zero
equality).
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from enterprise_warp_spark.operators.binning import exact_rank_select

DBL_MAX = 1.7976931348623157e308
TINY = 5e-324  # minimal denormal

SPECIALS = [
    0.0, -0.0, TINY, -TINY, 1e-310, -1e-310, 4.9e-324,
    DBL_MAX, -DBL_MAX, 1e308, -1e308, 1.0, -1.0,
    math.nextafter(1.0, 2.0), math.nextafter(1.0, 0.0),
    float("inf"), float("-inf"),
]

PROBS = (0.0, 0.25, 0.5, 0.77, 1.0)


def _ulp_cluster(base: float, k: int) -> list[float]:
    out = [base]
    for _ in range(k):
        out.append(math.nextafter(out[-1], math.inf))
    return out


@st.composite
def hostile_values(draw, max_distinct=300):
    """Distinct pool mixing specials, full-range floats, and ulp clusters;
    each value then duplicated 1-12x (ties are the adversarial part)."""
    pool = draw(
        st.lists(
            st.one_of(
                st.sampled_from(SPECIALS),
                st.floats(allow_nan=False, allow_infinity=True),
                st.floats(min_value=-1.0, max_value=1.0),
            ),
            min_size=1,
            max_size=max_distinct - 8,
        )
    )
    if draw(st.booleans()):
        pool += _ulp_cluster(draw(st.sampled_from([1.0, -3.5, 1e-300])), 7)
    pool = list(dict.fromkeys(pool))[:max_distinct]
    dups = [
        v for v in pool for _ in range(draw(st.integers(1, 12)))
    ]
    return dups


def _oracle(vals):
    s = sorted(vals)  # Python sorts -inf first, +inf last, like the op
    return {
        p: s[math.floor((len(s) - 1) * p)] for p in PROBS
    }


def _eq(a: float, b: float) -> bool:
    return a == b  # -0.0 == 0.0 intentionally (SQL zero equality)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=hostile_values(), buckets=st.sampled_from([2, 5, 16]))
def test_hostile_values_exact_vs_sorted_oracle(spark, vals, buckets):
    """collect_cap chosen >= the distinct bound but below the duplicated
    row count, so the histogram loop, the ulp-collapse exit, AND the
    distinct-value-count resolution all get exercised — and none of them
    may ever disagree with the sorted oracle."""
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out = {
        t["p"]: t
        for t in exact_rank_select(
            df, "g", "v", probs=PROBS, buckets=buckets,
            collect_cap=305, max_levels=6,
        )
    }
    want = _oracle(vals)
    for p in PROBS:
        assert out[p]["n"] == len(vals)
        assert _eq(out[p]["value"], want[p]), (
            p, out[p]["value"], want[p], sorted(vals)[:10]
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(
            st.floats(min_value=-1e9, max_value=1e9),
            st.sampled_from([0.0, -0.0, 1.0, math.nextafter(1.0, 2.0)]),
        ),
        min_size=20,
        max_size=400,
    ),
    cap=st.sampled_from([3, 7]),
)
def test_small_cap_narrowing_exact_or_loud(spark, vals, cap):
    """Tiny collect_cap forces deep narrowing. The ONLY acceptable
    outcomes are the exact answer or the documented loud refusal
    (ValueError naming collect_cap) — never a wrong value, never an
    unbounded collect, never a bookkeeping crash."""
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    try:
        out = {
            t["p"]: t["value"]
            for t in exact_rank_select(
                df, "g", "v", probs=PROBS, buckets=8,
                collect_cap=cap, max_levels=8,
            )
        }
    except ValueError as e:
        assert "collect_cap" in str(e)
        return
    want = _oracle(vals)
    for p in PROBS:
        assert _eq(out[p], want[p]), (p, out[p], want[p])


def test_all_infinite_group(spark):
    """Groups made ENTIRELY of infinities: every rank resolves from the
    stats pass with no finite machinery at all."""
    rows = [("i", float("-inf"))] * 5 + [("i", float("inf"))] * 3
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        t["p"]: t["value"]
        for t in exact_rank_select(df, "g", "v", probs=(0.0, 0.5, 1.0))
    }
    assert out[0.0] == float("-inf")
    assert out[0.5] == float("-inf")  # rank 4 of 8 is still in the prefix
    assert out[1.0] == float("inf")


def test_inf_mixed_with_finite_ranks_exactly(spark):
    vals = [float("-inf")] * 3 + [1.0, 2.0, 3.0, 4.0] + [float("inf")] * 2
    df = spark.createDataFrame([("m", v) for v in vals], ["g", "v"])
    out = {
        t["p"]: t["value"]
        for t in exact_rank_select(
            df, "g", "v", probs=PROBS, buckets=2, collect_cap=1,
        )
    }
    want = _oracle(vals)
    for p in PROBS:
        assert out[p] == want[p], (p, out[p], want[p])


def test_maxdouble_range_narrowing_terminates(spark):
    """[-DBL_MAX, DBL_MAX] data: (hi - lo) overflows double, the halved
    bucket spelling must still narrow (or exit cleanly) and return the
    exact ranks."""
    import random

    rng = random.Random(4)
    vals = [DBL_MAX, -DBL_MAX, 1e308, -1e308] + [
        rng.uniform(-1e5, 1e5) for _ in range(200)
    ]
    vals = [v for v in vals for _ in range(3)]
    df = spark.createDataFrame([("x", v) for v in vals], ["g", "v"])
    out = {
        t["p"]: t["value"]
        for t in exact_rank_select(
            df, "g", "v", probs=PROBS, buckets=4, collect_cap=250,
            max_levels=6,
        )
    }
    want = _oracle(vals)
    for p in PROBS:
        assert out[p] == want[p], (p, out[p], want[p])
