"""compact_store() at sf1 across all three store layouts
(VERDICT r8 task 6).

Builds each incremental store from the sf1 corpus in multiple
fragmenting ingest batches, snapshots a serve-side result hash, runs
:func:`~qctimeseries_spark.datapipe.dedup.compact_store`, and verifies
(a) files shrank to the target layout and (b) the serve result is
hash-identical on the compacted store:

- d6 flat fingerprint store (``dedup_against_store``)
- d7 ``bands/`` + ``exact/`` + ``shingles/`` store
  (``neardup_against_store``)
- x3/x5 IVF ``cells/`` store (``build_ivf_index`` +
  ``append_to_ivf_index``, served by ``knn_query_index``)

Usage: python tools/compact_sf1.py [sf_dir] [out_dir]
(defaults /tmp/sf1, /tmp/compact_sf1; prints a BENCHNOTES-ready
summary)
"""

from __future__ import annotations

import hashlib
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _hash_rows(df) -> tuple[int, str]:
    rows = sorted(
        "|".join(str(v) for v in r) for r in df.collect()
    )
    return len(rows), hashlib.sha256(
        "\n".join(rows).encode()
    ).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/compact_sf1")
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)

    from pyspark.sql import functions as F

    from qctimeseries_spark.datapipe.dedup import (
        compact_store,
        dedup_against_store,
        neardup_against_store,
    )
    from qctimeseries_spark.datapipe.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        knn_query_index,
    )
    from qctimeseries_spark.session import get_spark
    from qctimeseries_spark.sources import read_table

    spark = get_spark("compact_sf1")
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    n_batches = 6
    summary = {}

    # --- d6: flat fingerprint store -------------------------------
    p = str(out / "d6_store")
    for b in range(n_batches):
        batch = docs.filter(F.pmod(F.col("doc_id"), n_batches) == b)
        dedup_against_store(batch, p)
    probe = docs.filter(F.pmod(F.col("doc_id"), 17) == 3)
    before = _hash_rows(
        dedup_against_store(probe, p, update_store=False)
        .select("doc_id", "fingerprint")
    )
    t0 = time.time()
    stats = compact_store(spark, p, target_file_bytes=32 << 20)
    dt = time.time() - t0
    after = _hash_rows(
        dedup_against_store(probe, p, update_store=False)
        .select("doc_id", "fingerprint")
    )
    assert before == after, f"d6 serve changed: {before} vs {after}"
    summary["d6_flat"] = {"compact_s": round(dt, 1), **stats}

    # --- d7: bands/ + exact/ + shingles/ --------------------------
    p = str(out / "d7_store")
    for b in range(n_batches):
        batch = docs.filter(F.pmod(F.col("doc_id"), n_batches) == b)
        neardup_against_store(batch, p)
    before = _hash_rows(
        neardup_against_store(probe, p, update_store=False)
        .select("doc_id", "fingerprint")
    )
    t0 = time.time()
    stats = compact_store(spark, p, target_file_bytes=32 << 20)
    dt = time.time() - t0
    after = _hash_rows(
        neardup_against_store(probe, p, update_store=False)
        .select("doc_id", "fingerprint")
    )
    assert before == after, f"d7 serve changed: {before} vs {after}"
    summary["d7_bands"] = {"compact_s": round(dt, 1), **stats}

    # --- x3/x5: IVF cells/ ----------------------------------------
    p = str(out / "ivf_store")
    vecs = emb.select("vec_id", "embedding")
    build_ivf_index(
        vecs.filter(F.pmod(F.col("vec_id"), n_batches) == 0), p,
        nlist=32,
    )
    for b in range(1, n_batches):
        append_to_ivf_index(
            spark, p,
            vecs.filter(F.pmod(F.col("vec_id"), n_batches) == b),
        )
    queries = vecs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = _hash_rows(
        knn_query_index(spark, p, queries, k=10, nprobe=4)
    )
    t0 = time.time()
    stats = compact_store(spark, p, target_file_bytes=32 << 20)
    dt = time.time() - t0
    after = _hash_rows(
        knn_query_index(spark, p, queries, k=10, nprobe=4)
    )
    assert before == after, f"ivf serve changed: {before} vs {after}"
    summary["x3_cells"] = {"compact_s": round(dt, 1), **stats}

    print("\n=== compact_store @ sf1 summary ===")
    for k, v in summary.items():
        comps = {c: s for c, s in v.items() if isinstance(s, dict)}
        fb = sum(s["files_before"] for s in comps.values())
        fa = sum(s["files_after"] for s in comps.values())
        rows = sum(s["rows"] for s in comps.values())
        print(
            f"{k}: files {fb} -> {fa} ({rows:,} rows, "
            f"{v['compact_s']}s) "
            + ", ".join(
                f"{c}: {s['files_before']}->{s['files_after']}"
                for c, s in comps.items()
            )
        )
        print(f"{k}: serve hash UNCHANGED")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
