"""S4/J1 — directory glob scan + par/tim pairing.

Reference (enterprise_warp.py:394-400): `sorted(glob('*.par'))` zipped
positionally with the sorted .tim list, after asserting equal counts. The
Spark-native equivalent joins on the file BASENAME (robust where positional
zip silently mispairs), validating the same count invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def paired_pulsar_files(spark: SparkSession, datadir: str) -> DataFrame:
    """-> (psr, parfile, timfile); raises if the sets differ (count check)."""
    pars = (
        spark.read.text(f"{datadir}/*.par")
        .select(F.input_file_name().alias("parfile"))
        .distinct()
        .withColumn("psr", F.regexp_extract("parfile", r"([^/]+)\.par", 1))
    )
    tims = (
        spark.read.text(f"{datadir}/*.tim")
        .select(F.input_file_name().alias("timfile"))
        .distinct()
        .withColumn("psr", F.regexp_extract("timfile", r"([^/]+)\.tim", 1))
    )
    n_par, n_tim = pars.count(), tims.count()
    if n_par != n_tim:
        raise ValueError(f"par/tim count mismatch: {n_par} vs {n_tim}")
    paired = pars.join(tims, "psr")
    if paired.count() != n_par:
        raise ValueError("par/tim basenames do not pair up")
    return paired.select("psr", "parfile", "timfile").orderBy("psr")
