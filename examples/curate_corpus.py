"""Runnable end-to-end training-corpus curation — the scripted entry
point for the datapipe extension (no reference equivalent; the
reference is a single-table QC tool, SURVEY.md §2.7):

    dedup → decontaminate → quality-filter → sample → token budget →
    mixture weights → token shards,

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
    assign_token_shards,
    curate_corpus,
    dup_clusters,
    hash_sample,
    knn_bruteforce,
    knn_ivf,
    minhash_dedup_pairs,
    mixture_weights,
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

    # 1b. the finer dedup granularities: strip corpus-repeated
    #     boilerplate LINES (C4-style) then repeated SPANS
    #     (ExactSubstr-style) from the survivors' text
    from qctimeseries_spark.datapipe import (
        strip_repeated_lines,
        strip_repeated_spans,
    )

    lined = strip_repeated_lines(
        curated.select("doc_id", "text"), min_docs=3
    )
    spanned = strip_repeated_spans(
        lined.select("doc_id", F.col("text_clean").alias("text")),
        width=20, min_count=3,
    )
    trimmed = spanned.filter(F.col("n_removed") > 0).count()
    print(f"line+span dedup: {trimmed} docs lost repeated spans")

    # 1c. domain balancing + the model-based quality screen
    from qctimeseries_spark.datapipe import cap_per_group, classify_quality

    balanced = cap_per_group(
        docs.join(curated.select("doc_id"), "doc_id"), "lang", "doc_id", 200
    )
    scored = classify_quality(balanced)
    n_keep = scored.filter(F.col("keep")).count()
    print(f"balance+classify: {balanced.count()} balanced, {n_keep} keep")

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

    # 3b. deterministic splits: same doc always lands in the same split.
    #     NOTE the distinct seed: the curation chain already hash-sampled
    #     on doc_id with the default seed, so splitting with the SAME
    #     seed would collapse every survivor into 'train' (survivors all
    #     sit in the low buckets).  Different seed -> independent hash.
    tagged = split_corpus(
        curated.select("doc_id"), "doc_id",
        {"train": 0.9, "val": 0.05, "test": 0.05},
        seed="qcts-split",
    )
    sizes = {r["split"]: r["n"] for r in
             tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(f"splits: {sizes}")

    # 3c. language mixture: compute per-lang keep fractions realizing a
    #     target token mix without upsampling, apply them via the
    #     deterministic hash sample, and pack the result into
    #     fixed-token training shards (write with partitionBy(shard_id))
    mw = mixture_weights(
        curated.select("lang", "n_tokens"),
        "lang",
        "n_tokens",
        {"en": 0.5, "zh": 0.2, "de": 0.1, "fr": 0.1, "es": 0.1},
    )
    fracs = {r["lang"]: r["keep_frac"] for r in mw.collect()}
    mixed = hash_sample(
        curated.select("doc_id", "lang", "n_tokens"),
        "doc_id",
        strata_col="lang",
        fractions=fracs,
        default_fraction=0.0,
    )
    sharded = assign_token_shards(mixed, "doc_id", "n_tokens", 2000)
    n_shards = sharded.agg(F.countDistinct("shard_id")).collect()[0][0]
    print(f"mixture: {mixed.count()} docs -> {n_shards} x 2000-token shards")

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

    # 4b. build the index ONCE, serve query batches from the store —
    #     and answer a radius query ("everything at least this
    #     similar") with no per-query ranking window at all
    import tempfile

    from qctimeseries_spark.datapipe import (
        build_ivf_index,
        knn_query_index,
        radius_search,
    )

    with tempfile.TemporaryDirectory(prefix="qcts_ivf_") as ix:
        info = build_ivf_index(emb, ix, nlist=8)
        served = knn_query_index(spark, ix, queries, k=10, nprobe=4)
        print(f"persisted index: nlist={info['nlist']}, "
              f"served {served.count()} knn rows from the store")
    near = radius_search(emb, queries, threshold=0.25)
    print(f"radius search (cos >= 0.25): {near.count()} pairs")

    spark.stop()
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raise SystemExit(main(sf))
