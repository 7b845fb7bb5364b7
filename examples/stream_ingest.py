"""Runnable end-to-end STREAMING ingestion loop — the production
crawl-to-corpus path as a script (no reference equivalent; the
reference is a single-table batch QC tool, SURVEY.md §2.7):

    arriving document batches → exact dedup vs the persistent
    fingerprint store → near-dup dedup vs the signature store →
    embedding batches → semantic dedup vs the unit-vector store →
    a persisted IVF index built once, GROWN incrementally, and
    served to a stream of query vectors,

with store health stats and compaction at the end.  Every stage is
idempotent under at-least-once replay, and every survivor sink is
physically exactly-once on disk (committed per-batch directories —
an external reader sees no duplicates).

Usage:
    python examples/stream_ingest.py [sf_dir]

Default sf_dir=/root/testdata/sf0.001.  Everything here is the public
API; swap paths/thresholds for your own corpus.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from qctimeseries_spark.datapipe import (  # noqa: E402
    append_to_ivf_index,
    build_ivf_index,
    compact_store,
    store_stats,
)
from qctimeseries_spark.session import get_spark  # noqa: E402
from qctimeseries_spark.sources import read_table  # noqa: E402
from qctimeseries_spark.streaming import (  # noqa: E402
    ingest_dedup_stream,
    ingest_embedding_stream,
    ingest_neardup_stream,
    knn_serve_stream,
)


def stage_batches(frames, src: str) -> None:
    """Lay each frame down as one parquet file with ascending mtimes so
    the file source replays them as ordered micro-batches."""
    os.makedirs(src, exist_ok=True)
    for i, frame in enumerate(frames):
        stage = src + f"_stage{i}"
        frame.coalesce(1).write.mode("overwrite").parquet(stage)
        dst = os.path.join(src, f"batch{i}.parquet")
        shutil.move(glob.glob(stage + "/part-*.parquet")[0], dst)
        shutil.rmtree(stage, ignore_errors=True)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("stream-ingest-example")
    root = tempfile.mkdtemp(prefix="qcts_example_")

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    # --- 1. exact dedup ingestion: two crawl batches, the second
    # re-delivers every 10th doc of the first (a re-crawl)
    first = docs.filter(F.col("doc_id") % 2 == 0)
    recrawl = first.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    second = docs.filter(F.col("doc_id") % 2 == 1).unionByName(recrawl)
    stage_batches([first, second], root + "/d_src")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1).parquet(root + "/d_src")
    )
    survivors = ingest_dedup_stream(
        stream, root + "/fp_store", root + "/d_out",
        checkpoint_dir=root + "/d_ckpt",
    )
    n_in = first.count() + second.count()
    print(f"exact ingest: {n_in} arrived -> {survivors.count()} kept "
          f"({recrawl.count()} re-crawls dropped against the store)")

    # --- 2. near-dup ingestion: drifted re-crawls (appended banner)
    drift = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" mirror banner")).alias("text"),
    )
    stage_batches([docs, drift], root + "/n_src")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1).parquet(root + "/n_src")
    )
    survivors = ingest_neardup_stream(
        stream, root + "/sig_store", root + "/n_out",
        k=15, bands=5, threshold=0.6,
        checkpoint_dir=root + "/n_ckpt",
    )
    print(f"near ingest: {docs.count() + drift.count()} arrived -> "
          f"{survivors.count()} kept (drifted banners dropped on the "
          f"band+Jaccard tiers)")

    # --- 3. semantic ingestion: re-encoded vectors (tiny perturbation,
    # zero shared surface text possible) drop on the store cosine
    reencode = emb.filter(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") % 10 == 0)
    ).select(
        (F.col("vec_id") + 3_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * 1.0001).cast("float")
        ).alias("embedding"),
    )
    stage_batches(
        [emb.filter(F.col("vec_id") % 2 == 0),
         emb.filter(F.col("vec_id") % 2 == 1).unionByName(reencode)],
        root + "/e_src",
    )
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1).parquet(root + "/e_src")
    )
    survivors = ingest_embedding_stream(
        stream, root + "/vec_store", root + "/e_out",
        threshold=0.98, checkpoint_dir=root + "/e_ckpt",
    )
    print(f"semantic ingest: {emb.count() + reencode.count()} arrived -> "
          f"{survivors.count()} kept ({reencode.count()} re-encodes "
          f"dropped at cosine>=0.98 vs the store)")

    # --- 4. build the ANN index on the first half, GROW it with the
    # second, serve a query stream from the persisted store
    build_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 0), root + "/index", nlist=8
    )
    append_to_ivf_index(
        spark, root + "/index", emb.filter(F.col("vec_id") % 2 == 1)
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    stage_batches([queries], root + "/q_src")
    stream = (
        spark.readStream.schema("query_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1).parquet(root + "/q_src")
    )
    served = knn_serve_stream(
        stream, root + "/index", root + "/q_out",
        k=5, nprobe=3, checkpoint_dir=root + "/q_ckpt",
    )
    print(f"ANN serve: {served.count()} results for "
          f"{queries.count()} streamed queries from the grown index")

    # --- 5. store health + compaction (the long-lived-store loop)
    stats = store_stats(spark, root + "/sig_store")
    res = compact_store(spark, root + "/sig_store")
    print("signature store:",
          {k: v["files"] for k, v in stats.items()}, "files ->",
          {k: v["files_after"] for k, v in res.items()},
          "after compaction (rows unchanged)")

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    print("stream ingest example complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
