"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on /root/testdata/sf0.001
queries()     -> {name: (spark, sf_dir) -> DataFrame} from SURVEY.md §2
oracle_sql()  -> {name: DuckDB-compatible ANSI SQL}

The real catalog lives in enterprise_warp_spark/queries.py; each entry pairs
a Spark DataFrame plan with an oracle whose column names match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shaped pricing summary at sf0.001."""
    from enterprise_warp_spark.queries import REGISTRY
    from enterprise_warp_spark.session import tune_for_any_session

    tune_for_any_session(spark)
    return REGISTRY["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from enterprise_warp_spark.queries import REGISTRY

    return {name: spec.spark for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    from enterprise_warp_spark.queries import REGISTRY

    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }
