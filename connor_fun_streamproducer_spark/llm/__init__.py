"""LLM-data-pipeline tier (north star, SURVEY.md §2.2 last block).

Nothing here exists in the reference — connor.fun's downstream purpose was
text analytics over the streams this engine's REF tier produces. The tier
supplies what a 100 TB training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force and LSH-bucketed ANN), text analysis (language ID, quality
scores, token stats, fingerprints), and multimodal binary-column plumbing.
"""
