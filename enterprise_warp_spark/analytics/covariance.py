"""§1.8 — covariance-matrix assembly in long form.

Reference (results.py:537-577): per-run cov.npy blocks are accumulated
block-diagonally across pulsars; parameter names already seen are pruned
(mask at :567-575, set-intersection at :563-566) before scipy block_diag.

Long-form equivalent: covm(run_id, row_par, col_par, value). Block-diagonal
assembly is a UNION; the repeated-name pruning is a left_anti join against
the union of previously-seen parameter names (X1/X3/X4). Pivot to a dense
matrix only at export time (K4).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_block_diag(blocks: list[DataFrame]) -> DataFrame:
    """Union per-run covariance blocks, dropping any block rows/cols whose
    parameter name appeared in an earlier block (reference dedup semantics)."""
    assembled: DataFrame | None = None
    seen: DataFrame | None = None
    for block in blocks:
        if seen is not None:
            pruned = block.join(
                seen.withColumnRenamed("par", "row_par"), "row_par", "left_anti"
            ).join(seen.withColumnRenamed("par", "col_par"), "col_par", "left_anti")
        else:
            pruned = block
        names = pruned.select(F.col("row_par").alias("par")).distinct()
        seen = names if seen is None else seen.union(names).distinct()
        assembled = pruned if assembled is None else assembled.unionByName(pruned)
    return assembled if assembled is not None else reduce(lambda a, b: a, blocks)


def covm_to_dense(covm: DataFrame) -> DataFrame:
    """K4 export — pivot the long form to a dense row-per-row_par matrix."""
    return covm.groupBy("row_par").pivot("col_par").agg(F.first("value"))
