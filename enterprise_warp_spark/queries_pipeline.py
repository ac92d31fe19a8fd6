"""Catalog entries for the LLM-data-pipeline operators (dedup, similarity,
text analysis, multimodal metadata) with DuckDB oracles.

DuckDB dialect notes mirrored here (kept byte-compatible with the Spark
plans): hex-literal cast replaces conv(); list_* replaces higher-order array
functions; len() is BIGINT so it is cast to INTEGER wherever Spark's size()
(int32) feeds the output; numeric literals in fractions are cast to DOUBLE
because bare 1.0/100.0 parse as DECIMAL in both engines and would change the
division type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from enterprise_warp_spark.pipeline import dedup, similarity, text
from enterprise_warp_spark.queries import register
from enterprise_warp_spark.tables import table

# ---------------------------------------------------------------------------
# Shared DuckDB fragments
# ---------------------------------------------------------------------------

D_TOK = "list_filter(string_split(text, ' '), x -> x != '')"
D_H64 = "CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"
D_SHINGLES = (
    "CASE WHEN len(tok) < 3 THEN [array_to_string(tok, ' ')] "
    "ELSE list_transform(range(1, len(tok) - 1), i -> "
    "concat_ws(' ', tok[i], tok[i+1], tok[i+2])) END"
)


def _d_minhash(j: int) -> str:
    a, b = dedup.MINHASH_PARAMS[j]
    h = D_H64.format(s="s")
    return (
        f"list_min(list_transform(sh, s -> "
        f"({a} * ({h} % {dedup.P31}) + {b}) % {dedup.P31}))"
    )


_D_SIG_CTE = f"""
    t AS (SELECT doc_id, {D_TOK} AS tok FROM documents),
    sgl AS (SELECT doc_id, {D_SHINGLES} AS sh FROM t),
    m AS (SELECT doc_id, {", ".join(f"{_d_minhash(j)} AS mh{j}" for j in range(8))} FROM sgl),
    bands AS (
      SELECT doc_id, 0 AS band_id, md5(concat_ws(',', CAST(mh0 AS VARCHAR), CAST(mh1 AS VARCHAR))) AS band_key FROM m
      UNION ALL
      SELECT doc_id, 1, md5(concat_ws(',', CAST(mh2 AS VARCHAR), CAST(mh3 AS VARCHAR))) FROM m
      UNION ALL
      SELECT doc_id, 2, md5(concat_ws(',', CAST(mh4 AS VARCHAR), CAST(mh5 AS VARCHAR))) FROM m
      UNION ALL
      SELECT doc_id, 3, md5(concat_ws(',', CAST(mh6 AS VARCHAR), CAST(mh7 AS VARCHAR))) FROM m
    )
"""

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    f"""
    WITH t AS (SELECT doc_id, {D_TOK} AS tok FROM documents)
    SELECT md5(array_to_string(tok[1:5], ' ')) AS h,
           COUNT(*) AS n, MIN(doc_id) AS keeper
    FROM t GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on normalization key (first-5-token prefix).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    key = f"concat_ws(' ', slice({text.TOKENS.format(s='text')}, 1, 5))"
    return dedup.exact_groups(docs, key)


@register(
    "minhash_bands",
    f"WITH {_D_SIG_CTE} SELECT doc_id, band_id, band_key FROM bands",
    doc="MinHash signature -> LSH band table (shingle->minhash->band).",
)
def minhash_bands_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_bands(table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_pairs",
    f"""
    WITH {_D_SIG_CTE}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
    doc="MinHash-LSH candidate pairs via band-key equi-join (100TB-safe plan).",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(
        dedup.minhash_bands(table(spark, sf_dir, "documents"))
    )


@register(
    "simhash_docs",
    f"""
    WITH t AS (SELECT doc_id, {D_TOK} AS tok FROM documents),
    h AS (SELECT doc_id, list_transform(tok, tk -> {D_H64.format(s="tk")}) AS hs FROM t)
    SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), i ->
      CASE WHEN list_sum(list_transform(hs, hv -> CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
           THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
    FROM h
    """,
    doc="SimHash fingerprint (32-bit sign-of-weighted-bits) per document.",
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(table(spark, sf_dir, "documents"))


@register(
    "simhash_near_dup_pairs",
    f"""
    WITH t AS (SELECT doc_id, {D_TOK} AS tok FROM documents),
    h AS (SELECT doc_id, list_transform(tok, tk -> {D_H64.format(s="tk")}) AS hs FROM t),
    s AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), i ->
      CASE WHEN list_sum(list_transform(hs, hv -> CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
           THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash FROM h)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM s a JOIN s b
      ON (a.simhash >> 26) = (b.simhash >> 26) AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 10
    """,
    doc="SimHash near-dup pairs: top-6-bit bucket equi-join + hamming verify.",
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_pairs(
        table(spark, sf_dir, "documents"), bucket_bits=26, max_hamming=10
    )


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH t AS (SELECT doc_id, lang, CAST(FLOOR(n_chars / 50) AS BIGINT) AS len_bucket,
                      {D_TOK} AS tok FROM documents),
    g AS (SELECT doc_id, lang, len_bucket, list_distinct({D_SHINGLES}) AS grams FROM t),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS inter,
             len(a.grams) AS la, len(b.grams) AS lb
      FROM g a JOIN g b
        ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, ROUND(inter / CAST(la + lb - inter AS DOUBLE), 9) AS jaccard
    FROM p WHERE inter >= 1
    """,
    doc="Blocked pairwise exact n-gram Jaccard (inverted-index join; pairs sharing >=1 gram).",
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_D_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len({a}) + 1), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (acc, x) -> acc + x)"
)


@register(
    "embedding_topk",
    f"""
    WITH n AS (SELECT vec_id, embedding, {_D_DOT.format(a="embedding", b="embedding")} AS nsq
               FROM embeddings),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_D_DOT.format(a="q.embedding", b="c.embedding")} / SQRT(q.nsq * c.nsq), 6) AS cosine
      FROM n q JOIN n c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ),
    r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk FROM p)
    SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5
    """,
    doc="Brute-force cosine top-k ANN baseline (exact, rank pre-rounded).",
)
def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk(table(spark, sf_dir, "embeddings"), "vec_id < 10", 5)


_D_PLANE_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len(embedding) + 1), i -> "
    "CAST(embedding[i] AS DOUBLE) * "
    "CASE WHEN ((i * 2654435761 + p * 40503) % 97) % 2 = 0 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)), "
    "(acc, x) -> acc + x)"
)

_D_BUCKET = (
    "CAST(list_sum(list_transform(range(0, 4), p -> "
    f"CASE WHEN {_D_PLANE_DOT} > 0 THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
)


@register(
    "embedding_ann_bucketed",
    f"""
    WITH n AS (SELECT vec_id, embedding,
                      {_D_DOT.format(a="embedding", b="embedding")} AS nsq,
                      {_D_BUCKET} AS bucket
               FROM embeddings),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_D_DOT.format(a="q.embedding", b="c.embedding")} / SQRT(q.nsq * c.nsq), 6) AS cosine
      FROM n q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ),
    r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk FROM p)
    SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5
    """,
    doc="LSH-bucketed ANN: hyperplane-sign bucket equi-join (scale path).",
)
def embedding_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.bucketed_topk(
        table(spark, sf_dir, "embeddings"), "vec_id < 10", 5, n_planes=4
    )


@register(
    "embedding_ann_ivf",
    f"""
    WITH n AS (SELECT vec_id, embedding, {_D_DOT.format(a="embedding", b="embedding")} AS nsq
               FROM embeddings),
    cent AS (SELECT vec_id AS cell_id, embedding AS c_emb, nsq AS c_nsq FROM n WHERE vec_id < 16),
    d AS (SELECT n.vec_id, n.embedding, n.nsq, cent.cell_id,
                 ROUND(n.nsq - 2 * {_D_DOT.format(a="n.embedding", b="cent.c_emb")} + cent.c_nsq, 6) AS dist
          FROM n CROSS JOIN cent),
    a AS (SELECT vec_id, embedding, nsq, cell_id FROM
            (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS rn FROM d)
          WHERE rn = 1),
    probe AS (SELECT vec_id AS query_id, embedding AS q_emb, nsq AS q_nsq, cell_id FROM
                (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell_id) AS prn
                 FROM d WHERE vec_id < 10)
              WHERE prn <= 4),
    p AS (SELECT probe.query_id, a.vec_id AS neighbor_id,
                 ROUND({_D_DOT.format(a="probe.q_emb", b="a.embedding")} / SQRT(probe.q_nsq * a.nsq), 6) AS cosine
          FROM probe JOIN a ON a.cell_id = probe.cell_id AND a.vec_id <> probe.query_id),
    r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk FROM p)
    SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 5
    """,
    doc="IVF ANN: nearest-centroid inverted lists, nprobe=4 of 16 cells "
    "(centroids = deterministic dataset pick; KMeans-pluggable).",
)
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(
        table(spark, sf_dir, "embeddings"), "vec_id < 10", 5, n_cells=16, nprobe=4
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def _d_hits(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in text.STOPWORDS[lang])
    return f"CAST(len(list_filter(tok, x -> list_contains([{arr}], x))) AS INTEGER)"


@register(
    "text_langid",
    f"""
    WITH t AS (SELECT doc_id, lang, {D_TOK} AS tok FROM documents)
    SELECT doc_id, lang,
           {_d_hits("en")} AS en_hits,
           {_d_hits("es")} AS es_hits,
           {_d_hits("de")} AS de_hits,
           CASE WHEN {_d_hits("en")} = 0 AND {_d_hits("es")} = 0 AND {_d_hits("de")} = 0 THEN 'und'
                WHEN {_d_hits("en")} >= {_d_hits("es")} AND {_d_hits("en")} >= {_d_hits("de")} THEN 'en'
                WHEN {_d_hits("es")} >= {_d_hits("de")} THEN 'es' ELSE 'de' END AS predicted
    FROM t
    """,
    doc="Language ID: stopword-hit voting heuristic per document.",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.langid(table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "en_hits", "es_hits", "de_hits", "predicted"
    )


@register(
    "text_quality",
    f"""
    WITH t AS (SELECT doc_id, text, {D_TOK} AS tok FROM documents)
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars_obs,
           CAST(len(tok) AS INTEGER) AS n_tokens,
           ROUND((length(text) - length(replace(text, ' ', ''))) / CAST(greatest(len(tok), 1) AS DOUBLE), 6) AS space_ratio,
           ROUND(length(replace(text, ' ', '')) / CAST(greatest(len(tok), 1) AS DOUBLE), 6) AS avg_token_len,
           ROUND({_d_hits("en")} / CAST(greatest(len(tok), 1) AS DOUBLE), 6) AS stopword_ratio,
           ROUND(0.5 * least(CAST(len(tok) AS DOUBLE) / 100, CAST(1 AS DOUBLE)) + 0.5 * ({_d_hits("en")} / CAST(greatest(len(tok), 1) AS DOUBLE)), 6) AS quality_score
    FROM t
    """,
    doc="Quality scoring: length/space/stopword ratios + combined score.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_scores(table(spark, sf_dir, "documents"))


@register(
    "token_counts",
    f"""
    SELECT doc_id,
           CAST(len({D_TOK}) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_tokens
    FROM documents
    """,
    doc="Token counting: whitespace + BPE-ish pre-tokenizer regex.",
)
def token_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_counts(table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    """
    WITH c AS (
      SELECT doc_id,
             list_transform(string_split(text, ''), ch -> ascii(ch)) AS codes,
             list_transform(string_split(substr(text, 1, 64), ''), ch -> ascii(ch)) AS codes64
      FROM documents
    )
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), codes), (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_full,
           list_reduce(list_prepend(CAST(0 AS BIGINT), codes64), (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_prefix64
    FROM c
    """,
    doc="Document fingerprinting: polynomial rolling hash, full + 64-char prefix.",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprints(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Multimodal metadata (pure-SQL part; decode kernels live in pipeline.multimodal)
# ---------------------------------------------------------------------------


@register(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    doc="Opaque-binary metadata: byte length + content hash (decode stubbed).",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from enterprise_warp_spark.pipeline.multimodal import binary_meta

    return binary_meta(table(spark, sf_dir, "documents"))


_D_BUCKET2 = (
    "CAST(list_sum(list_transform(range(0, 2), p -> "
    f"CASE WHEN {_D_PLANE_DOT} > 0 THEN (CAST(1 AS BIGINT) << p) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
)


@register(
    "dedup_embedding_cosine",
    f"""
    WITH n AS (SELECT vec_id, embedding,
                      {_D_DOT.format(a="embedding", b="embedding")} AS nsq,
                      {_D_BUCKET2} AS bucket
               FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_D_DOT.format(a="a.embedding", b="b.embedding")} / SQRT(a.nsq * b.nsq), 6) AS cosine
    FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND({_D_DOT.format(a="a.embedding", b="b.embedding")} / SQRT(a.nsq * b.nsq), 6) >= 0.35
    """,
    doc="Embedding-cosine near-dup pairs: hyperplane-bucket candidates + cosine threshold.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_near_dup_pairs(
        table(spark, sf_dir, "embeddings"), threshold=0.35, n_planes=2
    )
