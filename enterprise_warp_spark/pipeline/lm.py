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


def _toks(docs: DataFrame, text_col: str):
    """Tokenize `text_col`, or pass it through untouched when it is already
    an array<string> — so a caller scoring several models over one corpus
    can tokenize ONCE (materialize the token arrays) and hand the same
    column to every train/score entry point."""
    from pyspark.sql import types as T

    for fld in docs.schema.fields:
        if fld.name == text_col and isinstance(fld.dataType, T.ArrayType):
            return F.col(text_col)
    return F.expr(TOKENS.format(s=text_col))


def train_unigram_lm(docs: DataFrame, text_col: str = "text", k: float = 1.0) -> DataFrame:
    """-> (token, logp) with add-k smoothing over the observed vocabulary.
    Deterministic: logp depends only on corpus counts. `text_col` may be a
    pre-tokenized array<string> column (see _toks)."""
    toks = spread(docs.select(_toks(docs, text_col).alias("toks")))
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
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """-> (doc_id, *carry_cols, n_tokens, mean_nll, ppl): per-document mean
    negative log-probability and perplexity under the unigram LM. Empty
    documents score no row (no tokens to judge). `carry_cols` are
    per-document attributes (constant per id) that ride through the
    aggregate — grouping by (id, carry) equals grouping by id, and carrying
    beats a join-back-to-docs shuffle."""
    keep = [id_col, *carry_cols]
    toks = spread(
        docs.select(*keep, _toks(docs, text_col).alias("toks"))
    )
    per_tok = explode_nonnull(toks, F.col("toks"), "token", *keep).join(
        lm, "token", "left"
    )
    return (
        per_tok.groupBy(*keep)
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

    One corpus-scale pass: c(prev) = sum_t c(prev, t) exactly (every pair
    occurrence contributes once), so context counts re-aggregate the
    already-shuffled pair table instead of exploding the corpus a second
    time. The vocabulary is likewise recoverable without another explode:
    in a document with >= 2 tokens every token appears in some adjacent
    pair (as prev if not last, as token if not first), so
    vocab = distinct(prev) ∪ distinct(token) ∪ {tokens of 1-token docs} —
    the first two read the small aggregated table, the last is a no-explode
    projection over the rare single-token documents.
    """
    toks = spread(docs.select(_toks(docs, text_col).alias("toks")))
    pair_arr = (
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) as prev, element_at(toks, i + 1) as token)) "
        "ELSE cast(array() as array<struct<prev:string,token:string>>) END"
    )
    pairs = explode_nonnull(toks, pair_arr, "p").select("p.prev", "p.token")
    pair_counts = pairs.groupBy("prev", "token").agg(
        F.count(F.lit(1)).alias("c_pt")
    ).localCheckpoint(eager=False)
    ctx_counts = pair_counts.groupBy("prev").agg(F.sum("c_pt").alias("c_p"))
    singles = toks.filter(F.expr("size(toks) = 1")).select(
        F.expr("toks[0]").alias("token")
    )
    vocab = (
        pair_counts.select(F.col("prev").alias("token"))
        .unionByName(pair_counts.select("token"))
        .unionByName(singles)
        .distinct()
        .count()
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
    toks = spread(docs.select(id_col, _toks(docs, text_col).alias("toks")))
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


def unigram_lm_components(
    docs: DataFrame, text_col: str = "text", k: float = 1.0
) -> tuple[DataFrame, float]:
    """(lm, unseen): the unigram model AND its unseen-token floor from ONE
    token aggregate (train_unigram_lm + a separate totals pass would scan
    the reference corpus twice). The totals collect is two scalars."""
    toks = spread(docs.select(_toks(docs, text_col).alias("toks")))
    counts = (
        explode_nonnull(toks, F.col("toks"), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    row = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("vocab")
    ).first()
    total, vocab = int(row["total"] or 0), int(row["vocab"] or 0)
    denom = total + k * (vocab + 1)
    lm = counts.select(
        "token", F.log((F.col("n") + F.lit(k)) / F.lit(denom)).alias("logp")
    )
    return lm, math.log(k / denom)


def ccnet_buckets(
    docs: DataFrame,
    lm: DataFrame,
    unseen: float,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    exact: bool = True,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document against a reference unigram LM, then split EACH LANGUAGE into
    `n_buckets` quality tiers by perplexity rank (bucket 1 = most fluent =
    CCNet's "head"; 3 = "tail"). -> (id_col, lang_col, n_tokens, mean_nll,
    bucket). Documents with no tokens score no row (CCNet drops them too).

    Deterministic and tie-aware: ranks order by ROUND(mean_nll, 6) alone —
    the rounding absorbs float-summation wiggle, and equal scores always
    share a bucket (CCNet assigns by perplexity THRESHOLD, so identical
    documents can never straddle a tier edge the way an id-tiebroken
    ntile would split them).

    `exact=True` is a per-language percent_rank threshold
    (bucket = floor(pr * n) + 1, clamped) — identical to ntile on
    distinct scores, tie-sharing on ties; a distributed sort within each
    language (range-partitioned; fine in batch). `exact=False` is the
    100 TB shape: per-language GK cutoff quantiles (one sketch aggregate),
    then a broadcast join + map-side comparison — no sort at all, at the
    cost of sketch-accuracy bucket edges."""
    from pyspark.sql import Window

    scored = perplexity(
        docs, lm, unseen, text_col, id_col, carry_cols=(lang_col,)
    )
    r = F.round("mean_nll", 6)
    if exact:
        w = Window.partitionBy(lang_col).orderBy(r.asc())
        bucket = F.least(
            F.lit(n_buckets),
            (F.floor(F.percent_rank().over(w) * n_buckets) + 1).cast("int"),
        )
        return scored.withColumn("bucket", bucket)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scored.groupBy(lang_col).agg(
        F.percentile_approx(r, F.array(*[F.lit(p) for p in probs]), F.lit(10_000))
        .alias("__cuts")
    )
    joined = scored.join(F.broadcast(cuts), lang_col, "left")
    bucket = F.lit(1) + F.aggregate(
        "__cuts",
        F.lit(0),
        lambda acc, c: acc + F.when(r > c, 1).otherwise(0),
    )
    return joined.withColumn("bucket", bucket).drop("__cuts")
