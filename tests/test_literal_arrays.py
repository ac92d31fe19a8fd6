"""Bit-exactness of the one-expression SQL literal helpers (r14).

double_array_lit / double_matrix_lit / long_array_lit replace
element-wise F.lit construction (2+ py4j round-trips per element of
driver time) with ONE parsed SQL expression. The value contract is
bit-identity: repr() is the shortest round-trip decimal of a Python
float and Spark's parser must return the same IEEE double; CAST of the
decimal string must return the same int64. These tests pin that
contract on adversarial values, and pin plan equivalence (both forms
constant-fold to the same Literal).
"""

import math
import struct

import pytest
from pyspark.sql import functions as F

from enterprise_warp_spark.functions.arrays import (
    double_array_lit,
    double_matrix_lit,
    long_array_lit,
)

DOUBLES = [
    0.0,
    -0.0,
    1.0,
    -1.5,
    0.1,
    1 / 3,
    1e-6,
    -3.7e-7,
    5e-324,  # smallest subnormal
    2.2250738585072014e-308,  # smallest normal
    1.7976931348623157e308,  # largest finite
    123456.789012,
    -9.87654321e12,
]

LONGS = [0, 1, -1, 2**63 - 1, -(2**63), 42, -99999999999]


def _bits(v: float) -> bytes:
    return struct.pack("<d", v)


def test_double_array_lit_bit_exact(spark):
    got = spark.range(1).select(double_array_lit(DOUBLES).alias("a")).first()["a"]
    assert len(got) == len(DOUBLES)
    for want, have in zip(DOUBLES, got):
        assert _bits(want) == _bits(have), (want, have)


def test_double_matrix_lit_bit_exact(spark):
    m = [DOUBLES[:4], DOUBLES[4:8], DOUBLES[8:12]]
    got = spark.range(1).select(double_matrix_lit(m).alias("m")).first()["m"]
    for wr, hr in zip(m, got):
        for want, have in zip(wr, hr):
            assert _bits(want) == _bits(have), (want, have)


def test_long_array_lit_exact_including_min_max(spark):
    got = spark.range(1).select(long_array_lit(LONGS).alias("a")).first()["a"]
    assert list(got) == LONGS


def test_double_array_lit_matches_flit_form_in_plan(spark):
    """Both construction forms must constant-fold to the same Literal —
    the optimized plans are string-identical, so downstream codegen and
    values cannot differ."""
    vals = DOUBLES[:6]
    fast = spark.range(1).select(double_array_lit(vals).alias("a"))
    slow = spark.range(1).select(
        F.array(*[F.lit(float(v)) for v in vals]).alias("a")
    )
    import re

    def norm(df):
        s = df._jdf.queryExecution().optimizedPlan().toString()
        return re.sub(r"#\d+", "#", s)

    assert norm(fast) == norm(slow)


def test_non_finite_raises():
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            double_array_lit([1.0, bad])


def test_empty_arrays_typed(spark):
    row = spark.range(1).select(
        double_array_lit([]).alias("d"),
        long_array_lit([]).alias("l"),
        double_matrix_lit([]).alias("m"),
    ).first()
    assert list(row["d"]) == [] and list(row["l"]) == [] and list(row["m"]) == []
