"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
a local replica of the driver's t2 correctness gate."""

import pytest

from enterprise_warp_spark.queries import REGISTRY
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    compare(df, duck.sql(spec.oracle))
