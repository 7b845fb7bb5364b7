"""End-to-end training-corpus curation: the dedup → decontaminate →
quality-filter → sample chain a pre-training data pipeline runs over a
raw crawl before tokenization.

Composes the already-audited building blocks (fingerprint exact-dedup,
broadcast benchmark decontamination, Catalyst quality scoring,
deterministic hash sampling) into ONE lazy DataFrame chain, so Catalyst
fuses the narrow stages and the whole pipeline runs with exactly two
wide stages at any corpus size:

1. a shuffle on ``fingerprint`` (uniform hash key — no skew) for the
   keeper-selection window, and
2. a shuffle on ``id_col`` for the shared-shingle count inside
   decontamination (the benchmark side is broadcast, never shuffled).

Everything else — shingling, quality stats, the sampling predicate —
is a narrow codegen projection.  No Python in any hot path.

The reference has no corpus-curation surface (single-table QC tool);
this extends SURVEY.md §7.2 step 9's LLM-data-pipeline mandate from
individual operators to the composed pipeline a user actually ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qctimeseries_spark.datapipe.sample import hash_sample
from qctimeseries_spark.datapipe.text import (
    contamination_check,
    fingerprint,
    quality_score,
)


def drop_near_dups(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 15,
    bands: int = 5,
    ngram: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Keep one document per near-duplicate cluster: MinHash-LSH pairs
    → transitive closure → survivor = the cluster's minimum id.  Docs
    in no pair survive untouched (no ``all_ids`` join needed — absence
    from the pair list IS survival)."""
    from qctimeseries_spark.datapipe.dedup import (
        dup_clusters,
        minhash_dedup_pairs,
    )

    pairs = minhash_dedup_pairs(
        docs.select(id_col, text_col),
        id_col, text_col, k=k, bands=bands, ngram=ngram, threshold=threshold,
    )
    clusters = dup_clusters(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    min_shared_ngrams: int = 1,
    quality_min: float = 0.5,
    sample_fraction: float | None = None,
    seed: str = "qcts",
    near_dup_threshold: float | None = None,
) -> DataFrame:
    """Curate a document corpus for training-data use.

    Stages, in pipeline order (each optional knob disables its stage):

    1. **Exact dedup** — keep the lowest ``id_col`` per normalized-text
       :func:`fingerprint` (lowercased, whitespace-collapsed), dropping
       mangled re-crawls.  Keeper choice is deterministic, so reruns
       and engines agree.
    2. **Benchmark decontamination** — drop any document sharing at
       least ``min_shared_ngrams`` word ``ngram``-shingles with
       ``benchmark`` (skipped when ``benchmark`` is None).  The
       benchmark's distinct shingle hashes are broadcast; the corpus is
       probed map-side (see :func:`contamination_check`).
    3. **Quality filter** — keep documents with composite
       :func:`quality_score` ≥ ``quality_min``.
    4. **Near-dup dedup** (``near_dup_threshold`` set) — MinHash-LSH →
       transitive clusters → keep each cluster's minimum id
       (:func:`drop_near_dups`), catching paraphrase-level duplication
       the exact fingerprint misses.
    5. **Deterministic sample** — keep ``sample_fraction`` of survivors
       by key hash (skipped when None); membership is a pure function
       of ``(seed, id)`` so the sample is reproducible and joinable.

    Returns the curated rows with ``fingerprint``, ``n_tokens`` and
    ``quality`` bookkeeping columns retained for downstream budgeting
    (token counting / mixture weighting).

    Scale notes: the keeper window shuffles on the 60-bit fingerprint —
    uniformly distributed by construction, immune to hot-key skew even
    when one boilerplate page dominates the crawl (its copies all land
    in ONE group, but a single group is a single partition's work: if a
    constant string is >1 partition of the corpus, dedup it upstream
    with a count sketch).  The decontamination count shuffles on the
    document id.  Both keys are high-cardinality and uniform; no
    salting needed.
    """
    # 1. exact dedup: deterministic keeper per fingerprint group
    fp = fingerprint(docs, text_col)
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    kept = (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 2. decontamination: anti-join on flagged ids (the hits side is a
    # thin id/count frame — orders of magnitude smaller than the
    # corpus; AQE broadcasts it when it fits).  The deduped corpus has
    # two consumers here (the shingle probe and the anti-join chain),
    # so persist it: without the barrier the fingerprint window —
    # a full-corpus shuffle — would run twice.  MEMORY_AND_DISK, so at
    # 100 TB this spills rather than evicts.
    if benchmark is not None:
        kept = kept.persist()
        hits = contamination_check(
            kept, benchmark, id_col, text_col, ngram=ngram
        ).filter(F.col("n_shared_ngrams") >= min_shared_ngrams)
        kept = kept.join(hits.select(id_col), id_col, "left_anti")

    # 3. quality filter
    out = quality_score(kept, text_col).filter(
        F.col("quality") >= quality_min
    )

    # 4. near-duplicate clusters (optional — a second LSH pass is real
    # work; run it after the cheap filters have shrunk the corpus)
    if near_dup_threshold is not None:
        out = drop_near_dups(
            out, id_col=id_col, text_col=text_col,
            threshold=near_dup_threshold,
        )

    # 5. deterministic sample
    if sample_fraction is not None:
        out = hash_sample(out, id_col, sample_fraction, seed=seed)
    return out
