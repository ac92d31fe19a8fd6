#!/usr/bin/env python
"""Scale probe for the union gates (VERDICT r7 Next #5): replicate the
heavy input table x10 (ids shifted so keys stay unique; customer names
regenerated from the shifted key so the fuzzy-join corpus stays honest)
and measure each gate at 1x (sf0.1) vs 10x. Writes the replicated mirror
under /tmp and prints a markdown table for PERF.md.

The claim under test: these gates' costs are dominated by job-count /
fixed stage overhead at gate scale, and the data-dependent parts scale
linearly EXCEPT where the OUTPUT itself grows superlinearly (the radius
join's pair density) — measured, not asserted.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/ews_scale_x10"
FACTOR = 10
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
REPLICATED = {"customer", "events", "documents", "embeddings"}
GATES = (
    "matching_geo_ops",
    "web_hygiene_ops",
    "temporal_curation_ops",
    "learned_sketch_ops",
    "search_rank_ops",
    # r9 (VERDICT r8 Next #5): the heavy non-union gates — the physics
    # kernel slices (events-driven), MinHash LSH now carrying the simhash
    # branches, span-level n-gram dedup, and the ANN gate now carrying
    # PQ/ADC (embeddings-driven).
    "kernel_value_slices",
    "minhash_lsh",
    "repeated_ngram_spans",
    "embedding_ann_methods",
)


def build_mirror(spark):
    from pyspark.sql import functions as F

    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for t in TABLES:
        src_file = f"{SRC}/{t}.parquet"
        if t not in REPLICATED:
            shutil.copy(src_file, f"{DST}/{t}.parquet")
            continue
        df = spark.read.parquet(src_file)
        parts = []
        for i in range(FACTOR):
            p = df
            if t == "customer":
                p = p.withColumn(
                    "c_custkey", F.col("c_custkey") + F.lit(i * 10_000_000)
                ).withColumn(
                    "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
                )
            elif t == "events":
                p = p.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 100_000_000)
                ).withColumn(
                    "user_id", F.col("user_id") + F.lit(i * 10_000_000)
                )
            elif t == "documents":
                p = p.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
                )
            elif t == "embeddings":
                p = p.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # ONE file: the streaming [stm] branch's oracle assumes the whole
        # documents table arrives as a single availableNow micro-batch
        out.coalesce(1).write.mode("overwrite").parquet(f"{DST}/{t}.tmp")
        part = [
            f for f in os.listdir(f"{DST}/{t}.tmp") if f.endswith(".parquet")
        ][0]
        shutil.move(f"{DST}/{t}.tmp/{part}", f"{DST}/{t}.parquet")
        shutil.rmtree(f"{DST}/{t}.tmp")


def time_gate(spark, name, sf_dir, reps=3):
    from enterprise_warp_spark.queries import REGISTRY

    times, rows = [], None
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = REGISTRY[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    rows = REGISTRY[name].spark(spark, sf_dir).count()
    return round(statistics.median(times), 2), rows


def main():
    from enterprise_warp_spark.session import get_spark

    spark = get_spark(app_name="ews-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SRC}/region.parquet").count()  # warm JVM
    build_mirror(spark)
    print("| gate | t(1x) s | t(10x) s | ratio | rows 1x | rows 10x | rows ratio |")
    print("|---|---|---|---|---|---|---|")
    for g in GATES:
        t1, r1 = time_gate(spark, g, SRC)
        t10, r10 = time_gate(spark, g, DST)
        print(
            f"| `{g}` | {t1} | {t10} | {round(t10 / t1, 2)} "
            f"| {r1} | {r10} | {round(r10 / r1, 2)} |"
        )
    shutil.rmtree(DST, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
