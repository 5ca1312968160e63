"""Text-analysis and deduplication operators for large-scale corpus pipelines.

These extend the reference's analytics surface (SURVEY §7.1 M6) with the
operations a 100 TB training-data pipeline needs: tokenization, language ID,
quality scoring, fingerprinting (analysis.py) and exact/MinHash-LSH/SimHash/
n-gram-Jaccard deduplication (dedup.py). Everything is native Spark SQL
expressions — no Python UDFs in any hot path.
"""
