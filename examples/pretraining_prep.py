"""Runnable pre-training data preparation — the round-8 continuation
operators composed end-to-end (no reference equivalent; the reference
is a single-table QC tool, SURVEY.md §2.7):

    surgical decontamination (span excision) → temperature-balanced
    language mixture → deterministic sampling → RAG/context chunking →
    sequence packing layout,

with a diversified-retrieval sanity check (MMR over an ANN pool) and
an exact k-means corpus-structure report on the side.

Usage:
    python examples/pretraining_prep.py [sf_dir]

Default sf_dir=/root/testdata/sf0.001.  Everything here is the public
API; swap paths/thresholds for your own corpus.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from qctimeseries_spark.datapipe.sample import (  # noqa: E402
    hash_sample,
    pack_sequences,
    temperature_weights,
)
from qctimeseries_spark.datapipe.similarity import (  # noqa: E402
    kmeans_exact,
    knn_bruteforce,
    mmr_rerank,
)
from qctimeseries_spark.datapipe.text import (  # noqa: E402
    chunk_documents,
    excise_contaminated_spans,
    token_count,
)
from qctimeseries_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("pretraining-prep", master="local[8]",
                      shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. surgical decontamination: cut benchmark passages, keep docs
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    clean = excise_contaminated_spans(
        corpus.select("doc_id", "text"), bench, width=8
    )
    n_excised = clean.filter(F.col("n_removed") > 0).count()
    print(f"[1] excision: {n_excised} docs had leaked spans cut")
    cleaned = clean.select("doc_id", F.col("text_clean").alias("text")).join(
        corpus.select("doc_id", "lang", "source"), "doc_id"
    )

    # 2. temperature-balanced mixture over languages (alpha = 0.5)
    with_tok = cleaned.withColumn("n_tok", token_count(F.col("text")))
    mix = temperature_weights(with_tok, "lang", "n_tok", alpha=0.5)
    mix.show()
    fractions = {r["lang"]: r["keep_frac"] for r in mix.collect()}

    # 3. deterministic per-language sampling to the mixed corpus
    sampled = None
    for lang, frac in fractions.items():
        part = hash_sample(
            with_tok.filter(F.col("lang") == lang), "doc_id", frac
        )
        sampled = part if sampled is None else sampled.unionByName(part)
    print(f"[3] mixed corpus: {sampled.count()} docs "
          f"({with_tok.count()} before mixing)")

    # 4. context chunking for retrieval / packing for pre-training
    chunks = chunk_documents(sampled, chunk_tokens=64, overlap=16)
    packed = pack_sequences(
        sampled, "n_tok", key_col="doc_id", ctx_len=512,
        shard_col="source",
    )
    crossers = packed.filter(F.col("crosses_boundary")).count()
    print(f"[4] {chunks.count()} chunks; packing: {packed.count()} docs "
          f"({crossers} straddle a 512-token boundary)")

    # 5. corpus structure: exact k-means cells
    km = kmeans_exact(emb, nlist=8, iters=2)
    print("[5] k-means cells:")
    km.select("centroid_id", "n_members").show()

    # 6. diversified retrieval sanity check (MMR over an ANN pool)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pool = knn_bruteforce(emb, queries, k=10)
    diverse = mmr_rerank(pool, emb, k=5, lam=0.5)
    print(f"[6] MMR: {diverse.count()} diversified results for 3 queries")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
