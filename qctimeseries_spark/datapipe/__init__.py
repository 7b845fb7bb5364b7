"""Large-scale training-data-pipeline operators (SURVEY.md §7.2 step 9).

Beyond the reference's QC surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding near-dup), similarity search, text
analysis, and multimodal column plumbing — all designed for the
100 TB / 1000-executor regime (hash-partitioned shuffles, broadcast
candidate sets, no driver-side loops).
"""

from qctimeseries_spark.datapipe.dedup import (
    cosine,
    dedup_against_store,
    dup_clusters,
    embedding_dedup_against_store,
    embedding_dup_pairs,
    exact_dedup,
    jaccard_on,
    lsh_candidates,
    minhash_dedup_pairs,
    semantic_dedup,
    minhash_signatures,
    neardup_against_store,
    shingles,
    simhash,
    simhash_dup_pairs,
)
from qctimeseries_spark.datapipe.curate import curate_corpus, drop_near_dups
from qctimeseries_spark.datapipe.sample import (
    assign_token_shards,
    hash_sample,
    mixture_weights,
    sample_bucket,
    sample_to_token_budget,
    split_corpus,
)
from qctimeseries_spark.datapipe.hashing import fast_hash64, hash60
from qctimeseries_spark.datapipe.multimodal import (
    attach_media,
    decode_jpeg,
    decode_media,
    encode_jpeg_dc,
    extract_features,
    media_summary,
    repartition_by_bytes,
)
from qctimeseries_spark.datapipe.monitor import population_stability
from qctimeseries_spark.datapipe.similarity import (
    ivf_assign,
    knn_bruteforce,
    knn_ivf,
    recall_at_k,
    take_centroids,
    tune_nprobe,
)
from qctimeseries_spark.datapipe.text import (
    bpe_pair_counts,
    bpe_train,
    contamination_check,
    fingerprint,
    lang_id,
    quality_score,
    redact_pii,
    repetition_stats,
    strip_repeated_lines,
    text_stats,
    tfidf_top_terms,
    token_count,
    unigram_logprob,
)

__all__ = [
    "cosine",
    "curate_corpus",
    "drop_near_dups",
    "recall_at_k",
    "tune_nprobe",
    "dup_clusters",
    "assign_token_shards",
    "bpe_pair_counts",
    "bpe_train",
    "hash_sample",
    "mixture_weights",
    "population_stability",
    "sample_bucket",
    "sample_to_token_budget",
    "split_corpus",
    "contamination_check",
    "redact_pii",
    "embedding_dedup_against_store",
    "embedding_dup_pairs",
    "dedup_against_store",
    "exact_dedup",
    "jaccard_on",
    "lsh_candidates",
    "minhash_dedup_pairs",
    "semantic_dedup",
    "minhash_signatures",
    "neardup_against_store",
    "shingles",
    "simhash",
    "simhash_dup_pairs",
    "fast_hash64",
    "hash60",
    "attach_media",
    "decode_jpeg",
    "decode_media",
    "encode_jpeg_dc",
    "extract_features",
    "media_summary",
    "repartition_by_bytes",
    "ivf_assign",
    "knn_bruteforce",
    "knn_ivf",
    "take_centroids",
    "fingerprint",
    "lang_id",
    "quality_score",
    "repetition_stats",
    "strip_repeated_lines",
    "text_stats",
    "tfidf_top_terms",
    "token_count",
    "unigram_logprob",
]
