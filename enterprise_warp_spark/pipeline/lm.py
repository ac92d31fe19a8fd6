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
