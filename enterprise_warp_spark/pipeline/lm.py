"""Corpus-statistical language-model scoring: unigram LM perplexity.

A cheap, training-free fluency signal used by curation pipelines (CCNet's
wikipedia-LM filter is the heavyweight version): train token frequencies on
a reference corpus, score each document by its mean per-token negative
log-probability. Gibberish, boilerplate, and wrong-language text score high
(perplex); fluent text matching the reference distribution scores low.

Everything is two hash aggregates and one equi-join — no Python, no model
artifacts, mergeable across corpus shards:

  train:  explode tokens -> groupBy token count  (one shuffle)
  score:  explode tokens -> join token logp      (shuffle on token)
          -> groupBy doc mean                    (shuffle on doc_id)

At 100 TB the vocabulary table is millions of rows — still broadcastable
after a min-count cut, or a plain shuffle join if not. Smoothing: add-k over
the seen vocabulary, unseen tokens get the k-mass floor, so scores are
finite for any document.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enterprise_warp_spark.functions.arrays import explode_nonnull, spread
from enterprise_warp_spark.pipeline.text import TOKENS


def train_unigram_lm(docs: DataFrame, text_col: str = "text", k: float = 1.0) -> DataFrame:
    """-> (token, logp) with add-k smoothing over the observed vocabulary.
    Deterministic: logp depends only on corpus counts."""
    toks = spread(docs.select(F.expr(TOKENS.format(s=text_col)).alias("toks")))
    counts = (
        explode_nonnull(toks, F.col("toks"), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            F.log((F.col("n") + F.lit(k)) / (F.col("total") + F.lit(k) * (F.col("vocab") + 1))).alias("logp"),
        )
    )


def unseen_logp(lm_totals: tuple[int, int], k: float = 1.0) -> float:
    """Floor log-probability for tokens outside the trained vocabulary."""
    total, vocab = lm_totals
    return math.log(k / (total + k * (vocab + 1)))


def perplexity(
    docs: DataFrame,
    lm: DataFrame,
    unseen: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, n_tokens, mean_nll, ppl): per-document mean negative
    log-probability and perplexity under the unigram LM. Empty documents get
    null scores (no tokens to judge)."""
    toks = spread(docs.select(id_col, F.expr(TOKENS.format(s=text_col)).alias("toks")))
    per_tok = explode_nonnull(toks, F.col("toks"), "token", id_col).join(
        lm, "token", "left"
    )
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.avg(F.coalesce(F.col("logp"), F.lit(float(unseen))))).alias("mean_nll"),
        )
        .withColumn("ppl", F.exp("mean_nll"))
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", k: float = 1.0
) -> tuple[DataFrame, DataFrame, int]:
    """-> (bigrams, contexts, vocab): add-k bigram model components.

    bigrams  (prev, token, logp) for every observed adjacent pair:
             logp = log((c(prev,token)+k) / (c(prev)+k*(vocab+1)))
    contexts (prev, floor_logp) — the unseen-continuation floor per context:
             log(k / (c(prev)+k*(vocab+1)))
    vocab    observed vocabulary size (for the unseen-context floor
             log(1/(vocab+1)), computed by the caller via unseen_context_logp)

    Same two-aggregate shape as the unigram trainer; both tables are
    mergeable across corpus shards.
    """
    toks = spread(docs.select(F.expr(TOKENS.format(s=text_col)).alias("toks")))
    pair_arr = (
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) as prev, element_at(toks, i + 1) as token)) "
        "ELSE cast(array() as array<struct<prev:string,token:string>>) END"
    )
    pairs = explode_nonnull(toks, pair_arr, "p").select("p.prev", "p.token")
    pair_counts = pairs.groupBy("prev", "token").agg(F.count(F.lit(1)).alias("c_pt"))
    ctx_counts = pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("c_p"))
    vocab = (
        explode_nonnull(toks, F.col("toks"), "token").select("token").distinct().count()
    )
    denom_k = k * (vocab + 1)
    bigrams = pair_counts.join(ctx_counts, "prev").select(
        "prev",
        "token",
        F.log((F.col("c_pt") + F.lit(k)) / (F.col("c_p") + F.lit(denom_k))).alias("logp"),
    )
    contexts = ctx_counts.select(
        "prev", F.log(F.lit(k) / (F.col("c_p") + F.lit(denom_k))).alias("floor_logp")
    )
    return bigrams, contexts, vocab


def unseen_context_logp(vocab: int) -> float:
    """Floor for a transition whose CONTEXT was never seen: uniform over the
    smoothed event space."""
    return math.log(1.0 / (vocab + 1))


def bigram_perplexity(
    docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, n_transitions, mean_nll, ppl) over adjacent-token
    transitions. Fallback chain per transition: observed pair logp ->
    seen-context floor -> unseen-context floor. Docs with < 2 tokens score
    null (no transitions). Two equi-joins + one doc aggregate."""
    toks = spread(docs.select(id_col, F.expr(TOKENS.format(s=text_col)).alias("toks")))
    pair_arr = (
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) as prev, element_at(toks, i + 1) as token)) "
        "ELSE cast(array() as array<struct<prev:string,token:string>>) END"
    )
    trans = explode_nonnull(toks, pair_arr, "p", id_col).select(
        id_col, "p.prev", "p.token"
    )
    scored = (
        trans.join(bigrams, ["prev", "token"], "left")
        .join(contexts, "prev", "left")
        .select(
            id_col,
            F.coalesce(
                F.col("logp"),
                F.col("floor_logp"),
                F.lit(unseen_context_logp(vocab)),
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            (-F.avg("lp")).alias("mean_nll"),
        )
        .withColumn("ppl", F.exp("mean_nll"))
    )
