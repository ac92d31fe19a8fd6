"""Text analysis for training-data pipelines: tokenization, language ID,
quality scores, fingerprints.

All pure Catalyst expressions (split/filter/transform/aggregate + md5) so the
work stays in whole-stage codegen — at 100 TB the text columns stream through
the JVM with zero Python round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5-derived portable 64-bit hash: identical in Spark (conv) and DuckDB
# (hex-literal cast); 15 hex digits keeps it < 2^60 (positive int64).
H64 = "cast(conv(substr(md5({s}), 1, 15), 16, 10) as bigint)"

TOKENS = "filter(split({s}, ' '), x -> x != '')"

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "das", "und", "ist", "von"),
}


def tokens(col: str = "text") -> Column:
    return F.expr(TOKENS.format(s=col))


def h64(expr: str) -> str:
    """SQL fragment: portable 64-bit hash of the given string expression."""
    return H64.format(s=expr)


def stopword_hits(tok_expr: str, lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"size(filter({tok_expr}, x -> array_contains(array({arr}), x)))"


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-heuristic language ID: stopword-hit voting per language.

    Returns doc rows + per-language hit counts + predicted label
    ('und' when no stopwords hit at all).
    """
    t = TOKENS.format(s=text_col)
    hits = {lang: stopword_hits(t, lang) for lang in STOPWORDS}
    pred = (
        "CASE WHEN en_hits = 0 AND es_hits = 0 AND de_hits = 0 THEN 'und' "
        "WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en' "
        "WHEN es_hits >= de_hits THEN 'es' ELSE 'de' END"
    )
    out = df
    for lang, expr in hits.items():
        out = out.withColumn(f"{lang}_hits", F.expr(expr))
    return out.withColumn("predicted", F.expr(pred))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: token stats + stopword ratio + a combined
    score. Mirrors the length/punct/stopword-ratio style filters used in
    public web-scale dataset pipelines."""
    t = TOKENS.format(s=text_col)
    n_tok = f"size({t})"
    return df.select(
        "doc_id",
        F.expr(f"length({text_col})").alias("n_chars_obs"),
        F.expr(n_tok).alias("n_tokens"),
        F.round(
            F.expr(
                f"(length({text_col}) - length(replace({text_col}, ' ', ''))) "
                f"/ cast(greatest({n_tok}, 1) as double)"
            ),
            6,
        ).alias("space_ratio"),
        F.round(
            F.expr(
                f"length(replace({text_col}, ' ', '')) / cast(greatest({n_tok}, 1) as double)"
            ),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.expr(
                f"{stopword_hits(t, 'en')} / cast(greatest({n_tok}, 1) as double)"
            ),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.expr(
                f"0.5 * least(cast({n_tok} as double) / 100, cast(1 as double)) + 0.5 * "
                f"({stopword_hits(t, 'en')} / cast(greatest({n_tok}, 1) as double))"
            ),
            6,
        ).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (letter runs, digit
    runs, single punctuation — the classic pre-tokenizer shape)."""
    return df.select(
        "doc_id",
        F.expr(f"size({TOKENS.format(s=text_col)})").alias("n_ws_tokens"),
        F.expr(
            f"size(regexp_extract_all({text_col}, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
        ).alias("n_bpe_tokens"),
    )


def all_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One wide per-document projection with every text metric: language-ID
    hit counts + prediction, quality scores, token counts and fingerprints —
    a single scan + single shuffle-free select (the shape a curation pass
    runs at 100 TB: compute all row-wise features in one pass, not four).
    """
    from enterprise_warp_spark.functions.arrays import spread

    t = TOKENS.format(s=text_col)
    n_tok = f"size({t})"
    hits = {lang: stopword_hits(t, lang) for lang in STOPWORDS}
    pred = (
        f"CASE WHEN {hits['en']} = 0 AND {hits['es']} = 0 AND {hits['de']} = 0 THEN 'und' "
        f"WHEN {hits['en']} >= {hits['es']} AND {hits['en']} >= {hits['de']} THEN 'en' "
        f"WHEN {hits['es']} >= {hits['de']} THEN 'es' ELSE 'de' END"
    )
    poly = (
        "aggregate(filter(split({s}, ''), x -> x != ''), cast(0 as bigint), "
        "(acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"
    )
    return spread(df).select(
        "doc_id",
        "lang",
        F.expr(hits["en"]).alias("en_hits"),
        F.expr(hits["es"]).alias("es_hits"),
        F.expr(hits["de"]).alias("de_hits"),
        F.expr(pred).alias("predicted"),
        F.expr(f"length({text_col})").alias("n_chars_obs"),
        F.expr(n_tok).alias("n_tokens"),
        F.round(
            F.expr(
                f"(length({text_col}) - length(replace({text_col}, ' ', ''))) "
                f"/ cast(greatest({n_tok}, 1) as double)"
            ),
            6,
        ).alias("space_ratio"),
        F.round(
            F.expr(
                f"length(replace({text_col}, ' ', '')) / cast(greatest({n_tok}, 1) as double)"
            ),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.expr(f"{hits['en']} / cast(greatest({n_tok}, 1) as double)"), 6
        ).alias("stopword_ratio"),
        F.round(
            F.expr(
                f"0.5 * least(cast({n_tok} as double) / 100, cast(1 as double)) + 0.5 * "
                f"({hits['en']} / cast(greatest({n_tok}, 1) as double))"
            ),
            6,
        ).alias("quality_score"),
        F.expr(
            f"size(regexp_extract_all({text_col}, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
        ).alias("n_bpe_tokens"),
        F.expr(poly.format(s=text_col)).alias("fp_full"),
        F.expr(poly.format(s=f"substring({text_col}, 1, 64)")).alias("fp_prefix64"),
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: polynomial rolling hash (base 31,
    mod 1e9+7) over characters, full text + 64-char prefix."""
    from enterprise_warp_spark.functions.arrays import spread

    poly = (
        "aggregate(filter(split({s}, ''), x -> x != ''), cast(0 as bigint), "
        "(acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"
    )
    return spread(df).select(
        "doc_id",
        F.expr(poly.format(s=text_col)).alias("fp_full"),
        F.expr(poly.format(s=f"substring({text_col}, 1, 64)")).alias("fp_prefix64"),
    )
