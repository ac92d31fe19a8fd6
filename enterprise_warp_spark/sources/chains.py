"""S6 — MCMC chain matrix source.

Reference layout (results.py:427-513): per-run directory holds
`chain_1.txt` / `chain_1.0.txt` (whitespace matrix; columns = parameters plus
4 trailing sampler columns lnpost/lnlike/accept/pt stripped at :499-500) and
a `pars.txt` sidecar with one parameter name per line
(enterprise_warp.py:550-555). Timestamped segments `chain_<14 digits>.txt`
concatenate in name order (:481-489).

Spark shape: text scan -> split/cast to ARRAY<DOUBLE>; `step` is assigned by
row_number over monotonically_increasing_id within each file — text splits
are assigned in file order, which reproduces the reference's row index.
Long form (run_id, step, idx, par, value) comes from posexplode + a broadcast
join against the pars sidecar (J5).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

AUX_COLS = ("lnpost", "lnlike", "accept", "pt")  # results.py:499-500


def read_pars(spark: SparkSession, pars_path: str) -> DataFrame:
    """pars.txt sidecar -> (idx, par), idx matching chain column order."""
    w = Window.orderBy(F.col("mid"))
    return (
        spark.read.text(pars_path)
        .select(F.monotonically_increasing_id().alias("mid"), F.trim("value").alias("par"))
        .filter(F.col("par") != "")
        .withColumn("idx", F.row_number().over(w) - 1)
        .select("idx", "par")
    )


def read_chain(
    spark: SparkSession, chain_path: str | list[str], run_id: str | None = None
) -> DataFrame:
    """chain file(s) -> (run_id, step, values ARRAY<DOUBLE>, lnpost, lnlike,
    accept, pt); the 4 trailing sampler columns are split off. A list of
    paths concatenates segments in filename order (the W2 sorted-file-order
    contract: the step window orders by file, then line)."""
    first = chain_path[0] if isinstance(chain_path, list) else chain_path
    run_id = run_id or os.path.basename(os.path.dirname(first)) or "run"
    w = Window.partitionBy("run_id").orderBy("file", "mid")
    raw = (
        spark.read.text(chain_path)
        .filter(F.trim("value") != "")
        .select(
            F.lit(run_id).alias("run_id"),
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("mid"),
            F.expr(
                "transform(filter(split(trim(value), '\\\\s+'), x -> x != ''), x -> cast(x as double))"
            ).alias("row"),
        )
    )
    n = F.size("row")
    return (
        raw.withColumn("step", F.row_number().over(w) - 1)
        .select(
            "run_id",
            "step",
            F.expr("slice(row, 1, size(row) - 4)").alias("values"),
            F.element_at("row", n - 3).alias("lnpost"),
            F.element_at("row", n - 2).alias("lnlike"),
            F.element_at("row", n - 1).alias("accept"),
            F.element_at("row", n).alias("pt"),
        )
    )


def chains_long(chain: DataFrame, pars: DataFrame) -> DataFrame:
    """J5 — explode to (run_id, step, par, value) with the pars sidecar."""
    return (
        chain.select("run_id", "step", F.posexplode("values").alias("idx", "value"))
        .join(F.broadcast(pars), "idx")
        .select("run_id", "step", "par", "value")
    )


def read_chain_dir(spark: SparkSession, run_dir: str) -> tuple[DataFrame, DataFrame]:
    """Resolve a reference-style run directory: chain_1.txt or timestamped
    segments + pars.txt (results.py:427-478)."""
    pars = read_pars(spark, os.path.join(run_dir, "pars.txt"))
    candidates = [
        os.path.join(run_dir, "chain_1.txt"),
        os.path.join(run_dir, "chain_1.0.txt"),
    ]
    existing = [p for p in candidates if os.path.exists(p)]
    if not existing:
        import glob as _glob

        existing = sorted(_glob.glob(os.path.join(run_dir, "chain_[0-9]" * 1 + "*.txt")))
    chain = read_chain(spark, existing[0], run_id=os.path.basename(run_dir.rstrip("/")))
    return chain, pars


# the full-width (suffix-free) segment family only: chain_STAMP.txt.
# The par-masked family chain_STAMP_PARS.txt has FEWER columns, so mixing
# the two would misalign par/value pairs (reference get_chain_file_name,
# results.py:427-448, loads exactly one family depending on --par).
SEPARATED_RE = re.compile(r"chain_\d{14}\.txt$")


def read_separated_chain_dir(
    spark: SparkSession, run_dir: str, par_label: str | None = None
):
    """--load_separated (results.py:427-495): load the timestamped segment
    files of ONE family, concatenated in filename (= timestamp) order, as
    one chain. par_label None/'' selects the full-width chain_STAMP.txt
    segments against pars.txt; a non-empty par_label selects the par-masked
    chain_STAMP_<label>.txt segments against pars_<label>.txt. Like the
    reference's get_pars (results.py:467-470), a par_label whose
    pars_<label>.txt does not exist falls back to the full-width family.
    Falls back to the regular chain file when a directory has no separated
    segments (mirrors the reference's could-not-load tolerance)."""
    import glob as _glob

    if par_label and not os.path.exists(
        os.path.join(run_dir, f"pars_{par_label}.txt")
    ):
        par_label = None
    if par_label:
        seg_re = re.compile(
            r"chain_\d{14}_" + re.escape(par_label) + r"\.txt$"
        )
        pars_name = f"pars_{par_label}.txt"
    else:
        seg_re = SEPARATED_RE
        pars_name = "pars.txt"
    segs = sorted(
        p for p in _glob.glob(os.path.join(run_dir, "chain_*.txt"))
        if seg_re.search(p)
    )
    if not segs:
        return read_chain_dir(spark, run_dir)
    pars = read_pars(spark, os.path.join(run_dir, pars_name))
    chain = read_chain(spark, segs, run_id=os.path.basename(run_dir.rstrip("/")))
    return chain, pars
