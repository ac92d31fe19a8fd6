#!/usr/bin/env python
"""End-to-end training-data curation example over the synthetic documents
table:

    python examples/curate_corpus_example.py [--sf-dir /root/testdata/sf0.001]

Runs pipeline.curate.prepare_training_corpus — heuristic quality gates,
staged dedup (exact -> MinHash-LSH -> SemDeDup-style), per-source caps,
deterministic global shuffle, optional BPE encode + packing — and prints a
stage-by-stage funnel (rows in, rows surviving, why). Everything is
deterministic: re-running prints byte-identical output for the same
inputs and seeds.

This is the LLM-data-pipeline face of the engine (the reference workflow
examples live in run_example_paramfile.py); see docs/api.md §
"Training-data pipeline" for the full operator map.
"""

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_ROOT] + [p for p in [os.environ.get("PYTHONPATH", "")] if p]
)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--bpe-vocab", type=int, default=0,
                    help="train a byte-BPE of this size and encode (0=off)")
    ap.add_argument("--fix-encoding", action="store_true",
                    help="repair latin-1/cp1252 mojibake before scoring "
                         "and dedup (pipeline.text.fix_mojibake)")
    args = ap.parse_args(argv)

    from enterprise_warp_spark.pipeline.curate import (
        CurationConfig,
        ServingConfig,
        prepare_training_corpus,
    )
    from enterprise_warp_spark.session import get_spark
    from enterprise_warp_spark.tables import table

    spark = get_spark(app_name="curate-corpus-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, args.sf_dir, "documents")
    n0 = docs.count()

    serving = ServingConfig(
        cap_per_source=max(2, n0 // 8),
        shuffle_seed=7,
        bpe_vocab_size=args.bpe_vocab or None,
        pack_seq_len=128 if args.bpe_vocab else None,
    )
    out = prepare_training_corpus(
        docs, CurationConfig(fix_encoding=args.fix_encoding), serving
    )
    if "encoding_fixed" in out:
        print(f"encoding repaired:      {out['encoding_fixed'].count()}")

    print(f"input documents:        {n0}")
    for stage in ("dropped_quality", "dropped_lang", "dropped_dup", "kept"):
        if stage in out:
            print(f"{stage + ':':<24}{out[stage].count()}")
    corpus = out["corpus"]
    n_final = corpus.count()
    print(f"served corpus:          {n_final}")
    first = corpus.limit(3).collect()
    cols = corpus.columns
    print(f"columns: {cols}")
    for r in first:
        txt = (r["text"][:60] + "...") if len(r["text"]) > 60 else r["text"]
        print(f"  doc_id={r['doc_id']}  {txt!r}")
    if args.bpe_vocab:
        from pyspark.sql import functions as F

        toks = corpus.agg(F.sum("n_tokens")).collect()[0][0]
        print(f"total tokens at vocab {args.bpe_vocab}: {toks}")
    spark.stop()


if __name__ == "__main__":
    main()
