"""S2 — .par timing-model parameter scan.

Format (examples/data/J1832-0836.par): `NAME VALUE [FIT_FLAG] [UNCERTAINTY]`
per line; mixed value types (strings, sexagesimal coords, floats); schema is
dynamic — different pulsars carry different parameter sets (SURVEY §1.2).

Emitted as the narrow table par_params(psr, param, value, fit, uncertainty);
typed values are derived by expression downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_par(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    raw = spark.read.text(paths).select(
        F.regexp_extract(F.input_file_name(), r"([^/]+)\.par", 1).alias("psr"),
        F.split(F.trim(F.col("value")), r"\s+").alias("f"),
    ).filter(F.size("f") >= 2)
    is_flag = "element_at(f, 3) IN ('0', '1')"
    return raw.select(
        "psr",
        F.col("f")[0].alias("param"),
        F.col("f")[1].alias("value"),
        F.expr(
            f"CASE WHEN size(f) >= 3 AND {is_flag} THEN cast(element_at(f, 3) as int) END"
        ).alias("fit"),
        F.expr(
            "CASE WHEN size(f) >= 4 THEN try_cast(element_at(f, 4) as double) "
            f"WHEN size(f) = 3 AND NOT ({is_flag}) THEN try_cast(element_at(f, 3) as double) END"
        ).alias("uncertainty"),
    )
