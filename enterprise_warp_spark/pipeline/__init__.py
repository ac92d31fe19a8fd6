"""LLM-training-data pipeline operators (the north-star extension surface):

    dedup       exact, MinHash+LSH, SimHash, n-gram Jaccard
    similarity  brute-force cosine top-k + LSH-bucketed ANN over embeddings
    text        language-ID, quality scoring, token counting, fingerprinting
    multimodal  opaque-binary columns with typed metadata; decode kernels as
                Arrow-batched mapInPandas (decode itself stubbed: no codec
                libraries in this container)

All hot paths are Catalyst expressions (portable 64-bit md5-derived hashes,
higher-order array functions) — no Python UDFs. Each operator is exposed as a
catalog query with a DuckDB oracle in queries_pipeline.py.
"""
