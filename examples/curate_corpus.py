"""Runnable end-to-end training-corpus curation — the scripted entry
point for the datapipe extension (no reference equivalent; the
reference is a single-table QC tool, SURVEY.md §2.7):

    dedup → decontaminate → quality-filter → sample → token budget,

with near-dup clustering and an ANN index sanity check on the side.

Usage:
    python examples/curate_corpus.py [sf_dir]

Default sf_dir=/root/testdata/sf0.001.  Everything here is the public
API; swap paths/thresholds for your own corpus.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from qctimeseries_spark.datapipe import (  # noqa: E402
    curate_corpus,
    dup_clusters,
    knn_bruteforce,
    knn_ivf,
    minhash_dedup_pairs,
    recall_at_k,
    sample_to_token_budget,
    split_corpus,
)
from qctimeseries_spark.session import get_spark  # noqa: E402
from qctimeseries_spark.sources import read_table  # noqa: E402


def main(sf_dir: str) -> int:
    spark = get_spark("curate", master="local[4]", shuffle_partitions=4)

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    n_raw = docs.count()

    # 1. the composed curation chain: exact dedup + benchmark
    #    decontamination (here: every 50th doc stands in for an eval
    #    set) + quality cut + deterministic 50% sample
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    curated = curate_corpus(
        docs, bench, ngram=8, quality_min=0.5, sample_fraction=0.5
    )
    n_curated = curated.count()
    print(f"curate: {n_raw} raw docs -> {n_curated} curated")

    # 2. near-dup audit on the survivors: MinHash-LSH pairs -> clusters
    pairs = minhash_dedup_pairs(
        curated.select("doc_id", "text"), k=15, bands=5, threshold=0.6
    )
    clusters = dup_clusters(pairs)
    print(f"near-dup clusters among survivors: {clusters.count()} members")

    # 3. fit the curated corpus to a token budget (reproducible prefix)
    budget = 5000
    fitted = sample_to_token_budget(
        curated.select("doc_id", "lang", "n_tokens"),
        "doc_id",
        "n_tokens",
        budget,
    )
    kept = fitted.agg(F.sum("n_tokens")).collect()[0][0] or 0
    print(f"token budget {budget}: kept {fitted.count()} docs / {kept} tokens")

    # 3b. deterministic splits: same doc always lands in the same split
    tagged = split_corpus(
        curated.select("doc_id"), "doc_id",
        {"train": 0.9, "val": 0.05, "test": 0.05},
    )
    sizes = {r["split"]: r["n"] for r in
             tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(f"splits: {sizes}")

    # 4. ANN index sanity: IVF recall@10 vs brute force on embeddings
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rec = recall_at_k(
        knn_bruteforce(emb, queries, k=10),
        knn_ivf(emb, queries, k=10, nlist=8, nprobe=4),
    )
    mean_rec = rec.agg(F.avg("recall")).collect()[0][0]
    print(f"IVF recall@10 vs brute force: {mean_rec:.3f}")

    spark.stop()
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raise SystemExit(main(sf))
