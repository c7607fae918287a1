"""Large-scale training-data pipelines over the engine's tables.

Beyond the crawl core (SURVEY §2), these are the operations a 100 TB
web-text training-data pipeline needs: text analysis, exact/near
deduplication, similarity search, relational analytics and multimodal
payload plumbing — each expressed Ray-Data-first (``map_batches`` over
Arrow batches, partial aggregation before any shuffle, broadcast small
sides, bucket-shuffle LSH instead of O(n^2) pair joins).
"""
