#!/usr/bin/env python
"""Lane-level plan evidence for the suffix doubling round (VERDICT r14 #8).

The repeated_ngram_spans gate plan hides the suffix build behind eager
checkpoints, so the gate-level before/after explains are structurally
identical. This script captures the doubling round's OWN plan — the
`paired` DataFrame each rank pass consumes:

  after  — the real code path (suffix_array's `_plan_out` debug hook):
           the r15 explode -> groupBy fold.
  before — the r14 formulation reconstructed VERBATIM on the same
           `ranked` input (three position self-joins; source:
           `git show e9a59c3:enterprise_warp_spark/pipeline/suffix.py`
           lines 281-295), explained in the same session.

Output: plans/<tag>/suffix_round_paired_{before,after}.txt
Usage:  python scripts/capture_suffix_lane.py [tag=r15]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def explain_str(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline.suffix import (
        corpus_positions,
        suffix_array,
    )
    from enterprise_warp_spark.session import get_spark
    from enterprise_warp_spark.tables import table

    spark = get_spark(app_name="ews-suffix-lane")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    pos = corpus_positions(docs, n_parts=8)
    plans: list = []
    suffix_array(pos, n_parts=8, _plan_out=plans)
    if not plans:
        raise SystemExit("no doubling round ran — corpus trivially ranked")
    width, paired_after = plans[0]

    # r14 shape, verbatim from e9a59c3's suffix_array loop body, on the
    # SAME round-1 `ranked` columns: reconstruct ranked from the after
    # plan's lineage is impossible post-hoc, so rebuild it the way the
    # old round 1 did — the level-1 rank pass output.
    from enterprise_warp_spark.pipeline.suffix import (
        _two_pass_dense_rank_counted,
    )

    ranked_raw, _nd, _nr = _two_pass_dense_rank_counted(
        pos.select("pos", "doc_id", "idx", "token"), ["token"], "r", 8
    )
    ranked = ranked_raw.select("pos", "doc_id", "idx", "r")
    paired_before = ranked
    for k in (1, 2, 3):
        shifted = ranked.select(
            (F.col("pos") - width * k).alias("pos"),
            F.col("r").alias(f"r{k + 1}"),
        )
        paired_before = (
            paired_before.join(shifted, "pos", "left")
            .withColumn(f"r{k + 1}", F.coalesce(f"r{k + 1}", F.lit(-1)))
        )

    for name, df in (
        ("suffix_round_paired_before", paired_before),
        ("suffix_round_paired_after", paired_after),
    ):
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df))
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
