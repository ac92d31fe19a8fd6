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


def _timed(fn, reps=3):
    times, rows = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = fn()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 2), rows


def semdedup_contract_probe(spark):
    """VERDICT r9 Next #2 — measure SemDeDup under its PRODUCTION contract
    (n_cells scales with the corpus so expected cell size is constant ->
    sum(|cell|^2) ~ linear) vs the gate's fixed-cells oracle contract
    (cells fixed for determinism -> cell size grows with the corpus ->
    quadratic within-cell pair cost). Rows through semdedup_pairs at 1x
    (sf0.1 embeddings, 2k rows) and the 10x mirror (20k rows)."""
    from enterprise_warp_spark.pipeline.similarity import semdedup_pairs

    emb1 = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb10 = spark.read.parquet(f"{DST}/embeddings.parquet")
    thr = 0.35  # the gate's threshold: dense-enough output to be honest

    print()
    print("SemDeDup contract probe (threshold 0.35):")
    print("| contract | n_cells | t(1x) s | t(10x) s | time ratio | rows 1x | rows 10x |")
    print("|---|---|---|---|---|---|---|")
    for label, cells1, cells10 in (
        ("fixed-cells (gate oracle)", 32, 32),
        ("scaling-cells (production, n_cells ~ corpus)", None, None),
    ):
        t1, r1 = _timed(lambda: semdedup_pairs(emb1, thr, cells1).count())
        t10, r10 = _timed(lambda: semdedup_pairs(emb10, thr, cells10).count())
        c1 = cells1 if cells1 is not None else "auto"
        print(
            f"| {label} | {c1} | {t1} | {t10} | {round(t10 / t1, 2)} "
            f"| {r1} | {r10} |"
        )


def ann_recall_probe(spark):
    """VERDICT r9 Next #6 — measured recall@k curves at 10x scale (20k
    vectors): IVF across an nprobe sweep and PQ/ADC reranked across rerank
    depths, each against the brute-force exact top-k ground truth on the
    same 10 queries. Demonstrates the recall-vs-cost dial the ANN claim
    rests on, as a curve rather than a point."""
    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline import similarity

    # the plain x10 mirror replicates vectors VERBATIM (ids shifted), which
    # makes every query's true neighbors its own exact copies — any method
    # that lands in the right cell scores recall 1.0 trivially. Perturb each
    # replica with deterministic per-(vec, dim, copy) jitter so the top-k
    # structure is non-degenerate and recall actually discriminates.
    emb = (
        spark.read.parquet(f"{DST}/embeddings.parquet")
        .withColumn("_copy", (F.col("vec_id") / 10_000_000).cast("int"))
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, j) -> x + float(0.15 * "
                "sin(0.7718 * (vec_id % 10000000) + 1.237 * j + 2.9 * _copy)))"
            ),
        )
        .drop("_copy")
        .localCheckpoint(eager=True)
    )
    qf = "vec_id < 10"
    k = 5

    def recall_vs(truth, approx):
        t = {(r["query_id"], r["neighbor_id"]) for r in truth}
        a = {(r["query_id"], r["neighbor_id"]) for r in approx}
        return round(len(t & a) / len(t), 3) if t else 1.0

    t_exact, truth = _timed(
        lambda: similarity.cosine_topk(emb, qf, k).collect(), reps=1
    )
    print()
    print(f"ANN recall@{k} at 10x (20k vectors, 10 queries; brute-force "
          f"exact = {t_exact}s):")
    print("| method | param | recall@5 | t(s) |")
    print("|---|---|---|---|")
    # VERDICT r10 #4: n_cells=16 over this corpus put every query's whole
    # neighborhood inside one cell (flat 1.0 at every nprobe — an
    # uninformative dial). A recall curve needs cells ~ sqrt(N) (the
    # standard IVF sizing: 128 for 20k vectors) AND queries whose true
    # neighbors straddle cell boundaries — ivf_recall_probe below builds
    # that geometry explicitly; here the production-shaped corpus keeps
    # the sqrt-N cell count so at least cell misassignment shows.
    for nprobe in (1, 2, 4, 8, 16, 32):
        t, rows = _timed(
            lambda: similarity.ivf_topk(
                emb, qf, k, n_cells=128, nprobe=nprobe
            ).collect(),
            reps=1,
        )
        print(f"| ivf (n_cells=128) | nprobe={nprobe} | {recall_vs(truth, rows)} | {t} |")
    cbs = similarity.pq_codebooks(emb, 4, 16).localCheckpoint(eager=True)
    codes = similarity.pq_encode(emb, cbs, 4).localCheckpoint(eager=True)
    for rerank in (10, 25, 50, 100):
        t, rows = _timed(
            lambda: similarity.pq_topk_reranked(
                emb, cbs, 4, qf, k=k, rerank=rerank, encoded=codes
            ).collect(),
            reps=1,
        )
        print(f"| pq_reranked (M=4,K=16) | rerank={rerank} | {recall_vs(truth, rows)} | {t} |")


def hundredx_probe(spark):
    """r11 — the 100x question asked directly of the linear-path pipeline
    ops. Unlike the x10 mirror (verbatim replicas, single file), the 100x
    corpus (500k docs / 200k vectors) MUTATES each copy — every replica
    gets a copy-salted token and jittered embedding — so near-dup output
    stays bounded and time ratios measure PROCESSING, not quadratic
    output growth; it is also written multi-file so scan parallelism is
    the production shape. Ops probed end-to-end on both corpora:
    MinHash-LSH candidate pairs (signature -> banded equi-join), exact
    dedup groups, quality scoring, distributed BPE encode (fixed gate
    vocab), and SemDeDup under its production contract (n_cells ~
    corpus)."""
    import time as _time

    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline import dedup, similarity, text
    from enterprise_warp_spark.pipeline.tokenizer import encode_corpus
    from enterprise_warp_spark.queries_hygiene import _BPE_TOK

    docs1 = spark.read.parquet(f"{SRC}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    emb1 = spark.read.parquet(f"{SRC}/embeddings.parquet")
    copies = spark.range(100).select(F.col("id").alias("_copy"))
    docs100 = (
        docs1.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("_copy") * 10_000_000).alias("doc_id"),
            # copy-salted token bounds cross-copy near-dups
            F.concat_ws(" ", "text", F.concat(F.lit("cp"), "_copy")).alias("text"),
            "lang", "source",
        )
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    emb100 = (
        emb1.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("_copy") * 10_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, j) -> x + float(0.2 * "
                "sin(0.7718 * vec_id + 1.237 * j + 2.9 * _copy)))"
            ).alias("embedding"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    n1d, n100d = docs1.count(), docs100.count()
    n1e, n100e = emb1.count(), emb100.count()
    print()
    print(f"100x probe (docs {n1d} -> {n100d}, vecs {n1e} -> {n100e}):")
    print("| op | t(1x) s | t(100x) s | time ratio | rows 1x | rows 100x |")
    print("|---|---|---|---|---|---|")

    def run(name, fn1, fn100):
        t0 = _time.perf_counter(); r1 = fn1(); t1 = _time.perf_counter() - t0
        t0 = _time.perf_counter(); r100 = fn100(); t100 = _time.perf_counter() - t0
        print(f"| {name} | {round(t1, 2)} | {round(t100, 2)} "
              f"| {round(t100 / t1, 2)} | {r1} | {r100} |")

    run("minhash_lsh pairs",
        lambda: dedup.lsh_candidate_pairs(dedup.minhash_bands(docs1)).count(),
        lambda: dedup.lsh_candidate_pairs(dedup.minhash_bands(docs100)).count())
    run("exact dedup groups",
        lambda: dedup.exact_groups(docs1, "md5(text)").count(),
        lambda: dedup.exact_groups(docs100, "md5(text)").count())
    run("quality scores",
        lambda: text.quality_scores(docs1).count(),
        lambda: text.quality_scores(docs100).count())
    # sum the masks/sentence counts: the synthetic corpus keeps 0 docs
    # under both recipes (no punctuation, disjoint stopword vocab), so a
    # keep COUNT would be a zero row; the sums stay data-dependent
    run("gopher rules (mask sum)",
        lambda: text.gopher_rules(docs1).selectExpr(
            "sum(gopher_mask)").first()[0],
        lambda: text.gopher_rules(docs100).selectExpr(
            "sum(gopher_mask)").first()[0])
    run("c4 filters (sentence sum)",
        lambda: text.c4_filters(docs1).selectExpr(
            "sum(c4_sentences)").first()[0],
        lambda: text.c4_filters(docs100).selectExpr(
            "sum(c4_sentences)").first()[0])
    run("sq8 encode (code sum)",
        lambda: similarity.sq8_encode(emb1).selectExpr(
            "sum(aggregate(codes, 0L, (a, c) -> a + c))").first()[0],
        lambda: similarity.sq8_encode(emb100).selectExpr(
            "sum(aggregate(codes, 0L, (a, c) -> a + c))").first()[0])
    run("bpe encode (24-merge vocab)",
        lambda: encode_corpus(docs1, _BPE_TOK).selectExpr(
            "sum(n_tokens)").first()[0],
        lambda: encode_corpus(docs100, _BPE_TOK).selectExpr(
            "sum(n_tokens)").first()[0])
    run("semdedup pairs (production n_cells)",
        lambda: similarity.semdedup_pairs(emb1, 0.35, None).count(),
        lambda: similarity.semdedup_pairs(emb100, 0.35, None).count())


def ivf_recall_probe(spark):
    """VERDICT r10 #4 — an IVF recall-vs-nprobe curve that actually
    discriminates. The r10 sweep read 1.0 at every nprobe because 16 fat
    cells each contained whole query neighborhoods. This geometry makes
    cell boundaries bite by construction:

    * 20k vectors in 16d drawn around 150 Gaussian cluster centers with
      sigma at ~half the typical center separation, so each query's true
      top-k spans SEVERAL adjacent clusters;
    * n_cells = sqrt(N) = 141 (the standard IVF sizing), coarse quantizer
      = the dataset-sample centroids production uses, which do not align
      with the true clusters;
    * 20 queries placed at MIDPOINTS of random center pairs, the
      worst case for single-cell probes.
    """
    import numpy as np
    import pandas as pd

    from enterprise_warp_spark.pipeline import similarity

    rng = np.random.default_rng(20260815)
    n, d, n_true = 20_000, 16, 150
    centers = rng.normal(size=(n_true, d))
    assign = rng.integers(0, n_true, size=n - 20)
    sigma = 0.55 * np.median(
        np.linalg.norm(centers[1:] - centers[:-1], axis=1)
    ) / np.sqrt(2)
    body = centers[assign] + rng.normal(0, sigma / np.sqrt(d), size=(n - 20, d))
    qa, qb = rng.integers(0, n_true, 20), rng.integers(0, n_true, 20)
    queries = (centers[qa] + centers[qb]) / 2 + rng.normal(
        0, 0.02, size=(20, d)
    )
    X = np.vstack([queries, body]).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(map(list, X))}
    )
    emb = (
        spark.createDataFrame(pdf)
        .selectExpr("vec_id", "cast(embedding as array<float>) embedding")
        .repartition(32, "vec_id")
        .localCheckpoint(eager=True)
    )
    qf, k = "vec_id < 20", 10

    def rec(truth, approx):
        t = {(r["query_id"], r["neighbor_id"]) for r in truth}
        a = {(r["query_id"], r["neighbor_id"]) for r in approx}
        return round(len(t & a) / len(t), 3)

    t_exact, truth = _timed(
        lambda: similarity.cosine_topk(emb, qf, k).collect(), reps=1
    )
    n_cells = 141
    cents = similarity.deterministic_centroids(emb, n_cells).localCheckpoint(
        eager=True
    )
    print()
    print(f"IVF recall@{k} on the boundary-straddling corpus "
          f"(20k x 16d, 150 true clusters, n_cells={n_cells}, "
          f"20 midpoint queries; exact = {t_exact}s):")
    print("| nprobe | recall@10 | t(s) |")
    print("|---|---|---|")
    for nprobe in (1, 2, 4, 8, 16, 32, 64, 141):
        t, rows = _timed(
            lambda: similarity.ivf_topk(
                emb, qf, k, n_cells=n_cells, nprobe=nprobe, centroids=cents
            ).collect(),
            reps=1,
        )
        print(f"| {nprobe} | {rec(truth, rows)} | {t} |")


def plot_aggregation_probe(spark):
    """K7 scale check: the plot-sink feeding aggregations must be
    sample-count-linear with bins-bounded output (the property that makes
    a corner plot safe to ask for on a 100 TB chain table). Synthetic
    8-parameter chain at 1x = 2.5e5 steps and 10x = 2.5e6 steps (2e6 /
    2e7 long rows)."""
    from enterprise_warp_spark.operators.binning import grouped_histogram
    from enterprise_warp_spark.plotting import pair_histograms_2d

    pars = [f"p{i}" for i in range(8)]

    def chains(n_steps):
        return spark.range(n_steps * 8).selectExpr(
            "'r' as run_id",
            "cast(id / 8 as int) as step",
            "concat('p', pmod(id, 8)) as par",
            "sin(id) * (1 + pmod(id, 8)) as value",
        )

    print("\n## K7 plot-aggregation scale probe (8 pars)")
    print("| op | t(1x) s | t(10x) s | ratio | out rows 1x | out rows 10x |")
    print("|---|---|---|---|---|---|")
    for label, fn in (
        ("grouped_histogram(50)", lambda df: grouped_histogram(
            df, ["run_id", "par"], "value", bins=50).count()),
        ("pair_histograms_2d(30)", lambda df: pair_histograms_2d(
            df, pars, bins=30)[0].count()),
    ):
        t1, r1 = _timed(lambda: fn(chains(250_000)))
        t10, r10 = _timed(lambda: fn(chains(2_500_000)))
        print(f"| {label} | {t1} | {t10} | {round(t10 / max(t1, 1e-9), 2)} "
              f"| {r1} | {r10} |")


def bpe_encode_probe(spark):
    """r10 [bpe] gate contract: the distributed encode path must be
    doc-count-linear (mapInPandas heap-walk with a per-batch word memo;
    no shuffle, no driver coordination). Timed over the documents table
    at 1x and the 10x mirror under the gate's fixed 24-merge vocab."""
    from pyspark.sql import functions as F

    from enterprise_warp_spark.pipeline.tokenizer import encode_corpus
    from enterprise_warp_spark.queries_hygiene import _BPE_TOK

    def run(sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        enc = encode_corpus(docs, _BPE_TOK).select(
            F.sum("n_tokens").alias("s"), F.count(F.lit(1)).alias("n")
        )
        row = enc.first()
        return int(row["n"]), int(row["s"])

    print("\n## r10 BPE encode scale probe (fixed 24-merge vocab)")
    print("| corpus | t s | docs | tokens |")
    print("|---|---|---|---|")
    for label, d in (("1x", SRC), ("10x", DST)):
        (t, (n, s)) = _timed(lambda: run(d))
        print(f"| {label} | {t} | {n} | {s} |")


def main():
    from enterprise_warp_spark.session import get_spark

    which = set(sys.argv[1:])
    spark = get_spark(app_name="ews-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SRC}/region.parquet").count()  # warm JVM
    build_mirror(spark)
    if not which or "--gates" in which:
        print("| gate | t(1x) s | t(10x) s | ratio | rows 1x | rows 10x | rows ratio |")
        print("|---|---|---|---|---|---|---|")
        for g in GATES:
            t1, r1 = time_gate(spark, g, SRC)
            t10, r10 = time_gate(spark, g, DST)
            print(
                f"| `{g}` | {t1} | {t10} | {round(t10 / t1, 2)} "
                f"| {r1} | {r10} | {round(r10 / r1, 2)} |"
            )
    if not which or "--semd" in which:
        semdedup_contract_probe(spark)
    if not which or "--ann" in which:
        ann_recall_probe(spark)
    if not which or "--ivf" in which:
        ivf_recall_probe(spark)
    if "--x100" in which:
        hundredx_probe(spark)
    if "--plots" in which:
        plot_aggregation_probe(spark)
    if "--bpe" in which:
        bpe_encode_probe(spark)
    shutil.rmtree(DST, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
