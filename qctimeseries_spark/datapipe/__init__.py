"""Large-scale training-data-pipeline operators (SURVEY.md §7.2 step 9).

Beyond the reference's QC surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding near-dup), similarity search, text
analysis, and multimodal column plumbing — all designed for the
100 TB / 1000-executor regime (hash-partitioned shuffles, broadcast
candidate sets, no driver-side loops).
"""
