"""Planted-pair validation of simhash_dup_pairs (d3) at sf1 scale.

The d3 registered query is the one registry entry whose DuckDB oracle
cannot run at sf1: the synthetic documents table has a ~31-token
vocabulary, so hamming-<=3 simhash pairs are quadratically dense
(~108.8M pairs at 50k docs) and the hash-compare harness OOMs
MATERIALIZING the result — a harness limit, not a Spark one
(BENCHNOTES §7).  This tool closes the verification gap the way d9 and
st14 were closed: plant N known near-dup pairs in an sf1-SCALE corpus
with a REALISTIC vocabulary (100k tokens — random docs sit ~32 bits
apart on a 64-bit simhash, so incidental pairs are ~0) and assert the
operator recovers them pair-for-pair.

Recall is the only thing that needs demonstrating: every emitted pair
is exact-checked (the operator computes true hamming per candidate),
so false positives are impossible by construction — the pigeonhole
candidate join is the part that must not MISS pairs at scale.

Two planting modes, both asserted:
- 1000 exact twins (hamming 0): exercises the chunk-collision join.
- 1000 one-token-appended twins: data-dependent hamming; the tool
  computes each planted pair's TRUE hamming with the same simhash
  expression and asserts every pair at hamming <= 3 is recovered
  (pairs landing above 3 are correctly absent).

Usage:  python tools/validate_d3_sf1.py [n_docs] [n_twins]
Defaults: 50_000 docs (the sf1 documents row count), 2_000 twins.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_VOCAB = 100_000
DOC_TOKENS = 80
TWIN_BASE = 10_000_000  # twin of doc i gets id TWIN_BASE + i


def build_corpus(spark, n_docs: int, n_twins: int):
    """Deterministic sf1-scale corpus: 80 tokens/doc over a 100k-token
    vocabulary, all JVM-side (xxhash64 of (doc id, position)).  Twins
    of docs [0, n_twins): even i = exact copy, odd i = one token
    appended."""
    from pyspark.sql import functions as F

    pos = F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1))
    tok = lambda id_col, p: F.concat(
        F.lit("tok"),
        F.pmod(F.xxhash64(id_col, p), F.lit(N_VOCAB)).cast("string"),
    )
    base = (
        spark.range(n_docs)
        .withColumn(
            "text",
            F.array_join(
                F.transform(pos, lambda p: tok(F.col("id"), p)), " "
            ),
        )
        .select(F.col("id").alias("doc_id"), "text")
    )
    twins = (
        base.filter(F.col("doc_id") < n_twins)
        .select(
            (F.col("doc_id") + F.lit(TWIN_BASE)).alias("doc_id"),
            F.when(
                F.col("doc_id") % 2 == 0, F.col("text")  # exact twin
            ).otherwise(
                F.concat(F.col("text"), F.lit(" extratoken"))
            ).alias("text"),
        )
    )
    return base.unionByName(twins)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_twins = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000

    from pyspark.sql import functions as F

    from qctimeseries_spark.datapipe.dedup import (
        simhash_dup_pairs,
        simhash_table,
    )
    from qctimeseries_spark.session import get_spark

    spark = get_spark("validate-d3-sf1")
    corpus = build_corpus(spark, n_docs, n_twins).persist()
    print(f"corpus: {corpus.count()} docs ({n_docs} base + {n_twins} twins)")

    t0 = time.time()
    # 64-bit/4-chunk layout: 2^16 chunk values hold ~1M docs without
    # widening, and random docs sit far apart so the planted pairs are
    # the only hamming-<=3 pairs (incidental-pair expectation ~4e-4)
    pairs = simhash_dup_pairs(
        corpus, bits=64, chunks=4, max_hamming=3
    ).persist()
    n_pairs = pairs.count()
    elapsed = time.time() - t0
    print(f"simhash_dup_pairs: {n_pairs} pairs in {elapsed:.1f}s")

    # ground truth for the planted pairs via the same signature expr
    st = simhash_table(corpus, bits=64)
    a = st.filter(F.col("doc_id") < n_twins).alias("a")
    b = st.filter(F.col("doc_id") >= TWIN_BASE).alias("b")
    truth = (
        a.join(
            b,
            F.col("b.doc_id") == F.col("a.doc_id") + F.lit(TWIN_BASE),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .persist()
    )
    within = truth.filter(F.col("hamming") <= 3)
    n_within = within.count()
    print(
        f"planted pairs at true hamming <= 3: {n_within}/{n_twins}"
        f" (exact twins + the appended-token twins that land <= 3)"
    )
    assert n_within >= n_twins // 2, "planting produced too few pairs"

    # recall: every planted hamming-<=3 pair must be in the result
    # (operator emits (min_id, max_id) = (id_a, id_b) here)
    missed = within.join(
        pairs,
        (within.id_a == pairs.id_a) & (within.id_b == pairs.id_b),
        "left_anti",
    )
    n_missed = missed.count()
    print(f"missed planted pairs: {n_missed}")
    assert n_missed == 0, f"RECALL FAILURE: {n_missed} planted pairs missed"

    # incidental (non-planted) pairs should be ~0 at 64 bits
    incidental = pairs.filter(
        ~((pairs.id_a < n_twins) & (pairs.id_b >= TWIN_BASE))
    ).count()
    print(f"incidental pairs: {incidental}")

    print(
        f"PASS: d3 planted-pair validation at {n_docs} docs —"
        f" {n_within}/{n_within} recovered, {elapsed:.1f}s"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
