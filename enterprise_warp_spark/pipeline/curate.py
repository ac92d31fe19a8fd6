"""End-to-end corpus curation — the composed training-data pipeline:

    quality gate (text.quality_scores thresholds)
      -> language filter (text.langid)
      -> staged dedup: exact groups -> MinHash-LSH candidates
         -> exact n-gram Jaccard verification of candidates
      -> keep-list + per-stage accounting

Every stage is one of the already-tested operators; the composition adds
only filters and anti-joins, so the whole pipeline stays shuffle-bounded:
one doc-keyed aggregate per dedup stage plus the band-key candidate join.
At 100 TB this runs as a single lazy plan per stage with no driver-side
loops; the stage counts are the only collected values.
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enterprise_warp_spark.pipeline import dedup, text


@dataclass(frozen=True)
class CurationConfig:
    min_tokens: int = 20
    min_stopword_ratio: float = 0.0
    keep_langs: tuple[str, ...] = ()  # empty = all predicted languages
    jaccard_threshold: float = 0.6
    # Gopher-style repetition gates (1.0 = disabled): drop documents whose
    # duplicate-token fraction / dominant-bigram share exceed the bound.
    max_dup_token_ratio: float = 1.0
    max_top_bigram_share: float = 1.0
    # Encoding repair BEFORE any scoring/hashing: mojibake inflates symbol
    # ratios (dropping salvageable docs) and splits dedup families (the
    # wrecked and clean spellings of the same page hash apart). CCNet-style
    # pipelines fix encodings first; off by default for config stability.
    fix_encoding: bool = False


def curate_corpus(docs: DataFrame, cfg: CurationConfig = CurationConfig()) -> dict[str, DataFrame]:
    """-> {'kept', 'dropped_quality', 'dropped_lang', 'dropped_dup', 'stats'}
    (+ 'encoding_fixed' when cfg.fix_encoding)."""
    if cfg.fix_encoding:
        repaired = text.fix_mojibake(docs, "text")
        docs = repaired.drop("mojibake_fixed")
    scored = text.quality_scores(docs).join(
        text.langid(docs).select("doc_id", "predicted"), "doc_id"
    )
    quality_pred = (F.col("n_tokens") >= cfg.min_tokens) & (
        F.col("stopword_ratio") >= cfg.min_stopword_ratio
    )
    if cfg.max_dup_token_ratio < 1.0 or cfg.max_top_bigram_share < 1.0:
        # Repetition signals are another doc-keyed projection over the same
        # scan; the join is doc_id-equi so the whole gate stays one shuffle.
        scored = scored.join(
            text.repetition_metrics(docs).select(
                "doc_id", "dup_token_ratio", "top_bigram_share"
            ),
            "doc_id",
        )
        quality_pred = (
            quality_pred
            & (F.col("dup_token_ratio") <= cfg.max_dup_token_ratio)
            & (F.col("top_bigram_share") <= cfg.max_top_bigram_share)
        )
    quality_ok = scored.filter(quality_pred)
    lang_ok = (
        quality_ok.filter(F.col("predicted").isin(list(cfg.keep_langs)))
        if cfg.keep_langs
        else quality_ok
    )
    surviving = docs.join(lang_ok.select("doc_id"), "doc_id", "left_semi")

    # stage 1: exact dedup on the full-token normalization key
    key = f"concat_ws(' ', {text.TOKENS.format(s='text')})"
    exact = dedup.exact_groups(surviving, key)
    exact_losers = (
        surviving.select("doc_id")
        .join(exact.select(F.col("keeper").alias("doc_id")), "doc_id", "left_anti")
    )
    after_exact = surviving.join(exact_losers, "doc_id", "left_anti")

    # stage 2: MinHash-LSH candidates -> exact Jaccard verification
    candidates = dedup.lsh_candidate_pairs(dedup.minhash_bands(after_exact))
    verified = (
        dedup.ngram_jaccard_pairs(after_exact)
        .join(candidates, ["doc_a", "doc_b"], "left_semi")
        .filter(F.col("jaccard") >= cfg.jaccard_threshold)
    )
    near_losers = verified.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = after_exact.join(near_losers, "doc_id", "left_anti")

    dropped_quality = docs.join(quality_ok.select("doc_id"), "doc_id", "left_anti")
    dropped_lang = (
        docs.join(quality_ok.select("doc_id"), "doc_id", "left_semi")
        .join(lang_ok.select("doc_id"), "doc_id", "left_anti")
    )
    dropped_dup = surviving.join(kept.select("doc_id"), "doc_id", "left_anti")

    stats = (
        docs.agg(F.count(F.lit(1)).alias("n_input"))
        .crossJoin(kept.agg(F.count(F.lit(1)).alias("n_kept")))
        .crossJoin(dropped_quality.agg(F.count(F.lit(1)).alias("n_dropped_quality")))
        .crossJoin(dropped_lang.agg(F.count(F.lit(1)).alias("n_dropped_lang")))
        .crossJoin(dropped_dup.agg(F.count(F.lit(1)).alias("n_dropped_dup")))
    )
    out = {
        "kept": kept,
        "dropped_quality": dropped_quality,
        "dropped_lang": dropped_lang,
        "dropped_dup": dropped_dup,
        "stats": stats,
    }
    if cfg.fix_encoding:
        out["encoding_fixed"] = repaired.filter(
            F.col("mojibake_fixed")
        ).select("doc_id")
    return out


@dataclass(frozen=True)
class ServingConfig:
    """Post-curation serving knobs (all optional; None/empty = skip):

    quality_model      fitted pipeline.classify model; docs scoring below
                       quality_threshold are dropped (learned gate, applied
                       after the heuristic gates so the model only scores
                       already-plausible text)
    cap_per_source     max docs per `source_col` value (skew-safe two-phase
                       top-k; 'no host dominates the corpus')
    mixture_weights    target group mixture over `mixture_col`
                       (deterministic downsample-only resampling)
    shuffle_seed       epoch seed for the deterministic global shuffle
    tokenizer          trained pipeline.tokenizer dict: encode the served
                       corpus to token_ids/n_tokens (r6)
    bpe_vocab_size     alternatively, TRAIN a byte-level BPE of this size
                       on the served corpus itself, then encode with it
    pack_seq_len       with token ids present, also emit `packed`: pack
                       assignments at this token budget (pipeline.packing)
    semdedup_embeddings
                       embeddings table (id col matching doc_id + an
                       `embedding` array) — when set, a SemDeDup stage
                       runs after curation: within-cell semantic near-
                       duplicates above semdedup_threshold are dropped
                       down to one representative per component. Cell
                       assignment uses assign='auto', which routes to the
                       hierarchical two-level quantizer whenever the cell
                       count exceeds the flat Arrow kernel's measured
                       knee (~32k cells, PERF.md r12) — the recipe can
                       never take the quadratic flat path at production
                       cell counts
    semdedup_threshold / semdedup_n_cells / semdedup_centroids
                       forwarded to pipeline.similarity.semdedup_keep_list
    """

    quality_model: object | None = None
    quality_threshold: float = 0.5
    semdedup_embeddings: DataFrame | None = None
    semdedup_threshold: float = 0.95
    semdedup_n_cells: int | None = None
    semdedup_centroids: DataFrame | None = None
    cap_per_source: int | None = None
    source_col: str = "source"
    mixture_weights: Mapping[str, float] | None = field(default=None)
    mixture_col: str = "lang"
    shuffle_seed: int = 0
    tokenizer: dict | None = None
    bpe_vocab_size: int | None = None
    pack_seq_len: int | None = None


def prepare_training_corpus(
    docs: DataFrame,
    curation: CurationConfig = CurationConfig(),
    serving: ServingConfig = ServingConfig(),
) -> dict[str, DataFrame]:
    """The full corpus-to-training-order pipeline, each stage one of the
    already-tested operators:

        curate_corpus (heuristic gates + staged dedup)
          -> learned quality filter        (pipeline.classify, optional)
          -> per-source cap                (operators.sampling.cap_per_group)
          -> target-mixture resample       (operators.sampling.mixture_resample)
          -> deterministic global shuffle  (operators.sampling.shuffle_corpus)

    Returns curate_corpus's dict plus `corpus`: the serving-ordered result.
    Every stage is deterministic (pure function of data + seeds), so a
    re-run — or a retried production job — reproduces the byte-identical
    training set. Composition cost on top of curation: one tiny count
    aggregate (mixture rates), bounded windows (caps), and one range
    shuffle (ordering); all filters are map-side."""
    from enterprise_warp_spark.operators.sampling import (
        cap_per_group,
        mixture_resample,
        shuffle_corpus,
    )

    out = curate_corpus(docs, curation)
    kept = out["kept"]
    if serving.semdedup_embeddings is not None:
        # semantic dedup right after the lexical stages (the SemDeDup
        # recipe order); assign='auto' so the quantizer switches to the
        # hierarchical path past the flat kernel's measured knee — at
        # production cell counts the recipe can never go quadratic
        from enterprise_warp_spark.pipeline.similarity import (
            semdedup_keep_list,
        )

        emb = serving.semdedup_embeddings.join(
            kept.select(F.col("doc_id").alias("vec_id")), "vec_id",
            "left_semi",
        )
        keep = semdedup_keep_list(
            emb,
            threshold=serving.semdedup_threshold,
            n_cells=serving.semdedup_n_cells,
            centroids=serving.semdedup_centroids,
            assign="auto",
        )
        # Remove only the ids SemDeDup actually DROPPED (covered by an
        # embedding row but absent from the keep-list). A left_semi
        # against the keep-list would also remove every kept doc with no
        # embedding coverage and mislabel it a semantic duplicate
        # (ADVICE r13) — coverage-less docs pass through unjudged.
        dropped_ids = (
            emb.select("vec_id")
            .distinct()
            .join(keep.select("vec_id"), "vec_id", "left_anti")
            .select(F.col("vec_id").alias("doc_id"))
        )
        before = kept
        kept = kept.join(dropped_ids, "doc_id", "left_anti")
        out["dropped_semdedup"] = before.join(
            kept.select("doc_id"), "doc_id", "left_anti"
        )
        out["kept"] = kept  # semantic dedup is part of the keep-set (the
        # later serving stages — quality model, caps, mixture — only
        # narrow `corpus`, preserving corpus <= kept)
    if serving.quality_model is not None:
        from enterprise_warp_spark.pipeline.classify import quality_filter

        kept = quality_filter(
            serving.quality_model, kept, threshold=serving.quality_threshold
        )
    if serving.cap_per_source is not None:
        kept = cap_per_group(
            kept, serving.source_col, serving.cap_per_source, "doc_id"
        )
    if serving.mixture_weights:
        kept = mixture_resample(
            kept, serving.mixture_col, serving.mixture_weights, "doc_id"
        )
    corpus = shuffle_corpus(kept, "doc_id", seed=serving.shuffle_seed)
    # tokenize (and optionally pack) the SERVED order (r6): token ids ride
    # the same rows, so the byte-identical-retry guarantee extends through
    # tokenization — BPE training and encoding are deterministic
    if serving.pack_seq_len is not None and (
        serving.tokenizer is None and serving.bpe_vocab_size is None
    ):
        raise ValueError(
            "ServingConfig.pack_seq_len needs token counts: also set "
            "`tokenizer` (a trained dict) or `bpe_vocab_size` (train one)"
        )
    if serving.tokenizer is not None or serving.bpe_vocab_size is not None:
        from enterprise_warp_spark.pipeline.tokenizer import (
            encode_corpus,
            train_bpe,
            word_counts,
        )

        tok = serving.tokenizer
        if tok is None:
            tok = train_bpe(word_counts(corpus), serving.bpe_vocab_size)
        out["tokenizer"] = tok
        corpus = encode_corpus(corpus, tok)
        if serving.pack_seq_len is not None:
            from enterprise_warp_spark.pipeline.packing import pack_documents

            out["packed"] = pack_documents(
                corpus, serving.pack_seq_len, order_col="doc_id"
            )
    out["corpus"] = corpus
    return out
