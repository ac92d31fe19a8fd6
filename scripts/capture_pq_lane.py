#!/usr/bin/env python
"""Lane-level plan evidence for the PQ encode lane (VERDICT r14 #4/#8).

embedding_ann_methods checkpoints the code table eagerly, so the gate's
explain never shows pq_encode's own plan — the r14 before/after files were
structurally identical and the map-only claim had no plan evidence. This
captures the lane's OWN explain, pre-checkpoint:

  after  — the current code path (r14 commit c11c9af): one-row codebook
           broadcast + map-side array_min argmin; expected shape: no
           corpus Exchange, no Window, one BroadcastNestedLoopJoin
           against the 1-row codebook bundle.
  before — the pre-c11c9af formulation reconstructed verbatim from
           `git show c11c9af^:enterprise_warp_spark/pipeline/similarity.py`
           (explode subvectors -> broadcast-join codebooks -> Window
           min-by -> groupBy reassemble), explained in the same session.

Output: plans/<tag>/pq_encode_lane_{before,after}.txt
Usage:  python scripts/capture_pq_lane.py [tag=r15]
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

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline import similarity
    from enterprise_warp_spark.session import get_spark
    from enterprise_warp_spark.tables import table

    spark = get_spark(app_name="ews-pq-lane")
    spark.sparkContext.setLogLevel("ERROR")

    emb = table(spark, sf_dir, "embeddings")
    m = 8
    cbs = similarity.pq_codebooks(emb, m, 16).localCheckpoint(eager=True)
    after = similarity.pq_encode(emb, cbs, m)

    # pre-c11c9af pq_encode, verbatim from that commit's parent: explode
    # into subvectors, broadcast-join the codebooks, Window-rank the
    # per-(vec, subspace) distance, groupBy-reassemble the code array
    DOT = similarity.DOT
    dot = DOT.format(a="sub", b="c_sub")
    nsq_sub = DOT.format(a="sub", b="sub")
    nsq_c = DOT.format(a="c_sub", b="c_sub")
    slices = similarity._subvectors(emb, m, "embedding", "vec_id")
    d = slices.join(F.broadcast(cbs), "subspace").withColumn(
        "dist",
        F.round(F.expr(nsq_sub) - 2.0 * F.expr(dot) + F.expr(nsq_c), 6),
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy("dist", "code")
    best = d.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    before = (
        best.groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("subspace", "code"))
            ).alias("sc")
        )
        .select(
            "vec_id", F.expr("transform(sc, x -> x.code)").alias("codes")
        )
    )

    for name, df in (
        ("pq_encode_lane_before", before),
        ("pq_encode_lane_after", after),
    ):
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df))
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
