"""S1 — .tim TOA scan.

Reference behavior (enterprise_warp/enterprise_warp.py:648-660 ``read_tim``):
rows are `<src> <freq_MHz> <toa_MJD> <toa_err_us> <obs> [-flag value ...]`;
only lines starting with a space are active TOAs (line_elements[0]=='' at
:658) — `FORMAT`/`MODE` headers and `C`-commented rows are dropped. Trailing
`-flag value` pairs form an open-ended string->string map per row.

TOA MJDs carry ~19 significant digits (ns over decades): kept as both
DECIMAL(27,19) and the raw string (precision round-trip, SURVEY §1.9).

The parse is a single projection over spark.read.text: splits, slices and a
map_from_arrays — whole-stage codegen, parallel over file splits at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOA_SCHEMA = (
    "psr string, src string, freq_mhz double, toa_mjd decimal(27,19), "
    "toa_mjd_str string, toa_err_us double, obs string, flags map<string,string>"
)


def read_tim(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse one or many .tim files into the `toas` table; psr from filename."""
    raw = spark.read.text(paths).select(
        F.regexp_extract(F.input_file_name(), r"([^/]+)\.tim", 1).alias("psr"),
        F.col("value"),
    )
    # active TOAs start with whitespace (reference: line_elements[0] == '')
    active = raw.filter(F.col("value").rlike(r"^\s\S"))
    fields = F.split(F.trim(F.col("value")), r"\s+")
    parsed = active.select(
        "psr",
        fields.alias("f"),
    ).select(
        "psr",
        F.col("f")[0].alias("src"),
        F.col("f")[1].cast("double").alias("freq_mhz"),
        F.col("f")[2].cast("decimal(27,19)").alias("toa_mjd"),
        F.col("f")[2].alias("toa_mjd_str"),
        F.col("f")[3].cast("double").alias("toa_err_us"),
        F.col("f")[4].alias("obs"),
        F.expr(
            # trailing "-key value" pairs -> MAP<STRING,STRING>. Guards:
            # rows with no flags (size(f)=5; sequence(6,5) would DESCEND) and
            # a dangling key with no value (i < size(f)).
            "IF(size(f) >= 7,"
            " map_from_arrays("
            "  transform(filter(sequence(6, size(f)), i -> (i - 6) % 2 = 0 AND i < size(f)),"
            "            i -> substring(element_at(f, i), 2)),"
            "  transform(filter(sequence(6, size(f)), i -> (i - 6) % 2 = 0 AND i < size(f)),"
            "            i -> element_at(f, i + 1))),"
            " map())"
        ).alias("flags"),
    )
    return parsed


def toas_with_seconds(toas: DataFrame, mjd_epoch: int = 0) -> DataFrame:
    """Add exact second-scale arithmetic columns without double precision loss:
    split MJD into integer day + fractional-day DOUBLE (SURVEY §4.2)."""
    return toas.withColumn("mjd_day", F.col("toa_mjd").cast("bigint")).withColumn(
        "mjd_frac", (F.col("toa_mjd") - F.col("toa_mjd").cast("bigint")).cast("double")
    ).withColumn(
        "toa_s_approx",
        ((F.col("mjd_day") - F.lit(mjd_epoch)) * 86400.0 + F.col("mjd_frac") * 86400.0),
    )
