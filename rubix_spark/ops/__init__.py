"""LLM-pipeline extension operators (SURVEY.md §2.B X1..X4 + multimodal).

Submodules register their query entries into ``rubix_spark.queries.REGISTRY``:

- ``dedup``      — exact dedup, MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup
- ``similarity`` — brute-force cosine top-k, IVF-lite probe, sign-LSH buckets
- ``text``       — language-ID heuristic, quality scoring, token stats, fingerprinting
- ``udf``        — vectorized pandas UDF surface (scalar, grouped-agg, UDTF-shape)
- ``multimodal`` — binary payload columns + Arrow-batched metadata/decode plumbing
"""
