"""Paired Spark/DuckDB queries for the datapipe operators (dedup,
similarity search, text analysis, multimodal plumbing).

The source tables have no natural duplicates (500/500 distinct texts at
sf0.01), so the dedup queries derive corpora with *planted* duplicates
— an exact-dup tier (case/whitespace-mangled copies, exercising
normalization) and a near-dup tier (3-token tails, exercising
MinHash/SimHash recall).  Both engines derive the same corpus from the
same base table, so hashes must match.

Hash portability: every hash is :func:`hash60` (MD5-based) which DuckDB
mirrors exactly; cosine similarity is a left-fold in array order on
both sides so double sums are bit-equal; division by powers of two is
used where exactness matters (multimodal features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qctimeseries_spark.datapipe.dedup import (
    dup_clusters,
    embedding_dup_pairs,
    exact_dedup,
    containment_on,
    edit_distance_on,
    jaccard_on,
    lsh_candidates,
    minhash_dedup_pairs,
    simhash_dup_pairs,
)
from qctimeseries_spark.datapipe.dedup import MINHASH_P, minhash_coeffs
from qctimeseries_spark.datapipe.curate import curate_corpus
from qctimeseries_spark.datapipe.hashing import hash60_sql
from qctimeseries_spark.datapipe.multimodal import (
    JPEG_DC_OVERHEAD,
    attach_media,
    decode_media,
    extract_features,
    media_summary,
)
from qctimeseries_spark.datapipe.sample import (
    hash_sample,
    sample_to_token_budget,
    split_corpus,
)
from qctimeseries_spark.datapipe.similarity import (
    knn_binary,
    knn_bruteforce,
    knn_ivf,
)
from qctimeseries_spark.datapipe.text import (
    LANG_STOPWORDS,
    PII_PATTERNS,
    contamination_check,
    fingerprint,
    lang_id,
    quality_score,
    redact_pii,
    text_stats,
    token_count,
)
from qctimeseries_spark.sources import read_table

# ---------------------------------------------------------------------------
# derived corpora (planted duplicates) — Spark side
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def _exact_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ case/whitespace-mangled copies of every 10th doc."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    dups = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.regexp_replace(F.upper("text"), " ", "  ").alias("text"),
        )
    )
    return d.unionByName(dups)


def _near_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ 3-token-tail near-dup copies of every 7th doc."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    dups = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 7 == 0)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq qz xz")).alias("text"),
        )
    )
    return d.unionByName(dups)


def _emb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings (as double) ∪ first-dimension-perturbed copies of
    every 10th vector (cosine ≈ 0.99 vs the original)."""
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    pert = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0].cast("double") * 1.5),
            F.expr(
                "transform(slice(embedding, 2, size(embedding) - 1),"
                " x -> CAST(x AS DOUBLE))"
            ),
        ).alias("v"),
    )
    return base.unionByName(pert)


# ---------------------------------------------------------------------------
# derived corpora — DuckDB side (must mirror the Spark derivations)
# ---------------------------------------------------------------------------

_EXACT_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, replace(upper(text), ' ', '  ') AS text
  FROM documents WHERE doc_id % 10 = 0
)"""

_NEAR_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, concat(text, ' zq qz xz') AS text
  FROM documents WHERE doc_id % 7 = 0
)"""

_EMB_CORPUS_SQL = """
corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_concat([CAST(embedding[1] AS DOUBLE) * 1.5],
                     list_transform(embedding[2:], x -> CAST(x AS DOUBLE)))
  FROM embeddings WHERE vec_id % 10 = 0
)"""

_TOKS = r"list_filter(string_split_regex(lower({c}), '\s+'), t -> t != '')"


def _shingle_sql(src: str, n: int = 3) -> str:
    """CTEs tk(doc_id, tk) + sh(doc_id, s) over ``src``."""
    toks = _TOKS.format(c="text")
    return f"""
tk AS (SELECT doc_id, {toks} AS tk FROM {src}),
sh AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(tk) >= {n}
      THEN list_transform(range(0, len(tk) - {n - 1}),
                          i -> array_to_string(list_slice(tk, i + 1, i + {n}), ' '))
      ELSE [array_to_string(tk, ' ')] END) AS s
  FROM tk
)"""


def _sh_hashed(tkcol: str, n: int) -> str:
    """Inline DuckDB expression: distinct hashed word-n-gram shingles of
    a token-list column (mirror of ``hashed_shingles``)."""
    return (
        "list_distinct(list_transform(CASE WHEN len(" + tkcol + ") >= "
        + str(n)
        + " THEN list_transform(range(0, len(" + tkcol + ") - " + str(n - 1)
        + "), i -> array_to_string(list_slice(" + tkcol + ", i + 1, i + "
        + str(n)
        + "), ' ')) ELSE [array_to_string(" + tkcol + ", ' ')] END, x -> "
        + hash60_sql("x")
        + "))"
    )


def _minhash_sql(k: int = 16) -> str:
    """Mirror of :func:`minhash_signatures`: one MD5 per shingle, k
    affine rehashes, element-wise min fold."""
    p = MINHASH_P
    kv = ", ".join(
        f"({a} * h + {b}) % {p}" for a, b in minhash_coeffs(k)
    )
    return f"""
base AS (
  SELECT doc_id, list_transform(s, x -> {hash60_sql('x')} % {p}) AS bh FROM sh
),
sig AS (
  SELECT doc_id,
         list_reduce(list_transform(bh, h -> [{kv}]),
                     (acc, hv) -> list_transform(range(1, {k + 1}),
                                                 j -> LEAST(acc[j], hv[j]))) AS sig
  FROM base
)"""


def _band_eb_sql(bands: int, rows: int) -> str:
    """CTE eb(doc_id, band, h) — per-doc banded signature hashes."""
    h = hash60_sql(
        f"array_to_string(list_transform(list_slice(sig, band * {rows} + 1,"
        f" band * {rows} + {rows}), x -> CAST(x AS VARCHAR)), ',')"
    )
    return f"""
eb AS (
  SELECT doc_id, band, {h} AS h
  FROM sig, (SELECT unnest(range(0, {bands})) AS band) b
)"""


def _band_sql(bands: int, rows: int) -> str:
    return f"""{_band_eb_sql(bands, rows)},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM eb a JOIN eb b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
)"""


_JACCARD_SQL = f"""
jh AS (
  SELECT doc_id, list_distinct(list_transform(s, x -> {hash60_sql('x')})) AS hs
  FROM sh
),
j AS (
  SELECT cand.id_a, cand.id_b,
         ROUND(CAST(len(list_filter(sa.hs, x -> list_contains(sb.hs, x))) AS DOUBLE)
               / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) AS jaccard
  FROM cand
  JOIN jh sa ON sa.doc_id = cand.id_a
  JOIN jh sb ON sb.doc_id = cand.id_b
)"""


def _cos_fold_sql(a: str, b: str) -> str:
    """Left-fold cosine identical to dedup.cosine (bit-equal doubles)."""
    dot = (
        f"list_reduce(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (p, q) -> p + q)"
    )
    na = (
        f"sqrt(list_reduce(list_transform({a},"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))"
    )
    nb = (
        f"sqrt(list_reduce(list_transform({b},"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))"
    )
    return f"{dot} / ({na} * {nb})"


# ---------------------------------------------------------------------------
# dedup queries
# ---------------------------------------------------------------------------


def q_d1_exact_dedup(spark, sf_dir):
    """Exact dedup groups after normalization (hash-groupBy).

    ``ids`` is rendered as a comma-joined string for the harness: the
    driver's canonicalizer sorts result columns with pandas, which
    cannot hash array cells.  Same information, scalar type.
    """
    return exact_dedup(_exact_corpus(spark, sf_dir)).select(
        "fingerprint",
        "keeper",
        "n_dups",
        F.array_join(F.col("ids").cast("array<string>"), ",").alias("ids"),
    )


def q_d2_minhash_dedup(spark, sf_dir):
    """MinHash-LSH candidates + exact-Jaccard verify ≥ 0.6.

    Banding (b=5, r=3) puts the LSH S-curve threshold at
    (1/5)^(1/3) ≈ 0.58, just under the 0.6 Jaccard cut — near-full
    recall without flooding the verifier with low-similarity candidates
    (b=8, r=2 benchmarked ~7× slower for the identical result set).
    """
    return minhash_dedup_pairs(
        _near_corpus(spark, sf_dir), k=15, bands=5, ngram=3, threshold=0.6
    )


def q_d3_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs via chunk pigeonhole join, hamming ≤ 7.

    64-bit signatures in 4×16-bit chunks — PINNED to the layout the
    auto-widener picks at every driver scale, so the oracle can
    mirror it bit-for-bit.  The full-recall 8×8-bit rung saturates at
    ~2k docs (each 8-bit chunk has 256 values; past that the
    pigeonhole equi-join degrades toward all-pairs), so even the
    sf0.01 corpus (≈5.7k docs with the planted tails) runs the
    widened 4×16 layout; round 9 caught the old 8×8 ORACLE agreeing
    with the widened Spark run only coincidentally at sf0.01 and
    diverging at sf1 (198.7M vs 108.8M pairs, found by the
    aggregate-hash compare in tools/validate_d3_sf1_hash.py).  With
    both sides on 4×16 the result is layout-exact at EVERY scale —
    sf1 included (the row-level harness still OOMs there; the
    aggregate-hash tool is the sf1 gate).  Recall: guaranteed to
    hamming ≤ 3 (4 chunks), best-effort 4–7 — identical on both
    engines since the oracle applies the SAME pigeonhole.  7 of 64
    bits is calibrated to this corpus: docs have ~26 distinct tokens,
    so the planted 3-token-tail near-dups land at hamming 2-12.
    The 4×16 rung's capacity is ~1M docs; past it the operator
    auto-widens to 2×32 (warned) — for short-doc corpora MinHash (d2)
    remains the scale path.
    """
    import warnings

    with warnings.catch_warnings():
        # the narrowed-recall horizon is the documented, deliberate
        # choice here — don't re-warn on every registry run.  ONLY
        # that message is muted (r9 advisor: a blanket ignore would
        # also swallow the auto-widen warning — the one signal that
        # the operator switched to 2x32 while the oracle stayed on
        # 4x16, exactly the scale-dependent divergence r9 fixed); a
        # layout-changing auto-widen is escalated to a hard ERROR so
        # the query can never again silently diverge from its oracle.
        warnings.filterwarnings(
            "ignore", message=r"simhash_dup_pairs: .*guarantees recall"
        )
        warnings.filterwarnings(
            "error", message=r"simhash_dup_pairs: corpus exceeds"
        )
        return simhash_dup_pairs(
            _near_corpus(spark, sf_dir), bits=64, max_hamming=7,
            chunks=4, allow_partial_recall=True,
        )


def q_d4_ngram_jaccard(spark, sf_dir):
    """Raw n-gram Jaccard scores on coarse-LSH candidates (no threshold)."""
    docs = _near_corpus(spark, sf_dir)
    cands = lsh_candidates(docs, k=16, bands=4, ngram=3)
    return jaccard_on(cands, docs, ngram=3)


def q_d14_containment(spark, sf_dir):
    """Asymmetric containment scores on the d4 candidate set: both
    directions (|A∩B|/|A| and /|B|) plus set sizes, so subset
    inclusion (a doc quoted inside a longer one) is visible where a
    Jaccard threshold would dilute it away.  Candidate policy note in
    containment_on: LSH recalls near-dups, not extreme-ratio subsets
    — this query scores the shared candidate set; rare-gram
    generation is the subset-heavy path."""
    docs = _near_corpus(spark, sf_dir)
    cands = lsh_candidates(docs, k=16, bands=4, ngram=3)
    return containment_on(cands, docs, ngram=3)


def q_d15_edit_distance(spark, sf_dir):
    """Character-level Levenshtein verify on the d4 candidate set —
    the finest dedup-ladder rung (token-set scores miss per-character
    churn; this sees it).  prefix_chars=4000 exercises the scale cap
    (a no-op on this fixture's short docs, so the oracle needs no
    prefix handling beyond the same substr); similarity is the exact
    integer-nanodigit 9-dp quotient.  The DuckDB levenshtein is
    byte-level — identical to the engine's codepoint-level distance
    on this ASCII fixture (documented in edit_distance_on)."""
    docs = _near_corpus(spark, sf_dir)
    cands = lsh_candidates(docs, k=16, bands=4, ngram=3)
    return edit_distance_on(cands, docs, prefix_chars=4000)


def q_d5_embedding_dups(spark, sf_dir):
    """Embedding near-dup pairs: cosine ≥ 0.9 over planted perturbed
    copies.  ``nprobe="auto"`` (probe-doubling until the pair set
    stops growing) makes the IVF tier's pair set COMPLETE wherever it
    engages — this query matched the exact quadratic oracle at sf1
    only after the r7 switch (2,438/2,438 pairs; fixed nprobe=3
    missed 2); below the brute cutover the kwarg is inert."""
    return embedding_dup_pairs(
        _emb_corpus(spark, sf_dir), id_col="vec_id", vec_col="v",
        threshold=0.9, nprobe="auto",
    )


def q_c1_dup_clusters(spark, sf_dir):
    """Transitive dedup groups: connected components (iterative
    min-label propagation) over the d2 MinHash near-dup pairs — the
    pairs→groups step a retention pass needs.  Deterministic fixpoint,
    so the DuckDB oracle is a recursive-CTE reachability closure."""
    pairs = minhash_dedup_pairs(
        _near_corpus(spark, sf_dir), k=15, bands=5, ngram=3, threshold=0.6
    )
    return dup_clusters(pairs)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def q_x1_knn_bruteforce(spark, sf_dir):
    """Exact top-10 cosine neighbors for query vectors vec_id < 5."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_bruteforce(emb, queries, k=10)


def q_x18_binary_knn(spark, sf_dir):
    """Binary-signature recall tier + exact rerank: sign-bit packed
    64-dim signatures (ONE BIGINT per vector), Hamming top-40 by
    XOR+popcount, exact-cosine rerank to top-10.  The candidate scan
    reads 8 bytes per vector — the cheapest rung of the x6/x7/x8
    compression ladder — and the fp32 column is touched only for the
    ~40 candidates per query.  Deterministic end-to-end (sign-bit
    packing is exact, Hamming ties break on id, the rerank reuses the
    9-dp cosine + id tie-break), so the whole signature build + scan
    + rerank is oracle-expressible."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_binary(emb, queries, k=10, rerank=4)


def q_x2_knn_ivf(spark, sf_dir):
    """IVF-restricted approximate top-10.  Approximate vs brute force,
    but deterministic end-to-end (seeded centroids, 9-dp rounding, id
    tie-breaks), so it has a full DuckDB oracle; recall is additionally
    pytest-verified against brute force in tests/test_datapipe.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_ivf(emb, queries, k=10, nlist=16, nprobe=4)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_t2_text_stats(spark, sf_dir):
    """Token/char counts, uniq/punct ratios, mean token length."""
    return text_stats(_docs(spark, sf_dir)).select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "n_bpe_tokens",
        "n_uniq_tokens",
        "uniq_ratio",
        "punct_ratio",
        "mean_token_len",
    )


def q_t3_quality(spark, sf_dir):
    """Composite C4/Gopher-style quality score in [0,1]."""
    return quality_score(_docs(spark, sf_dir)).select("doc_id", "quality")


def q_t4_lang_id(spark, sf_dir):
    """Stopword-overlap language ID vs the table's lang column."""
    return lang_id(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "lang_pred", "lang_hits"
    )


def q_t5_fingerprint(spark, sf_dir):
    """60-bit normalized-text fingerprint (exact-dedup key)."""
    return fingerprint(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a deterministic PII blurb (email + IP + phone)
    prepended to every 3rd doc."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    blurb = F.concat(
        F.lit("contact user"), did, F.lit("@mail.example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".1 ring +1555"),
        did, F.lit("0199 "), F.col("text"),
    )
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, blurb)
        .otherwise(F.col("text"))
        .alias("text"),
    )


def q_t6_redact_pii(spark, sf_dir):
    """PII scrub: emails/IPv4/phones replaced, per-doc match count."""
    return redact_pii(_pii_corpus(spark, sf_dir)).select(
        "doc_id", "text_redacted", "n_pii"
    )


def _leak_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ 'leaked' copies of the benchmark slice (doc_id % 50
    == 0) with a short prefix — the contamination to be caught."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    leaked = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 50 == 0)
        .select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.concat(F.lit("leaked copy "), F.col("text")).alias("text"),
        )
    )
    return d.unionByName(leaked)


def q_t7_contamination(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing ≥1 8-gram with
    the benchmark slice, benchmark's own rows excluded (anti-join)."""
    corpus = _leak_corpus(spark, sf_dir)
    bench = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", "text")
    )
    hits = contamination_check(corpus, bench, ngram=8)
    return hits.join(bench.select("doc_id"), "doc_id", "left_anti")


def q_t8_hash_sample(spark, sf_dir):
    """Deterministic stratified sampling: per-language keep rates as a
    pure function of the key hash — reproducible across engines."""
    return hash_sample(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        "doc_id",
        strata_col="lang",
        fractions={"en": 0.3, "zh": 0.8},
        default_fraction=0.5,
    )


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def q_d6_incremental_dedup(spark, sf_dir):
    """Incremental ingestion dedup: even-id docs seed a persistent
    fingerprint store, then a second batch (odd docs ∪ re-crawled
    copies of every 10th odd doc) dedups against it — re-crawls and
    store hits drop, within-batch dups keep the min id.  Each batch
    pays one anti-join, never a re-dedup of history.  The oracle is
    the equivalent set algebra over both batches.

    Both batches run EAGERLY here (dedup_against_store materializes
    its result before the store append), so the driver's timed action
    over the returned frame measures only the final projection; the
    store is a per-invocation temp dir removed before returning —
    the materialized survivors no longer reference it."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.dedup import dedup_against_store

    d = _docs(spark, sf_dir).select("doc_id", "text")
    even = d.filter(F.col("doc_id") % 2 == 0)
    odd = d.filter(F.col("doc_id") % 2 == 1)
    recrawl = odd.filter(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    tmp = tempfile.mkdtemp(prefix="qcts_fps_")
    try:
        store = tmp + "/fingerprints"
        dedup_against_store(even, store)  # batch 1 seeds the store
        out = dedup_against_store(odd.unionByName(recrawl), store)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select("doc_id", "fingerprint")


def q_t17_tfidf(spark, sf_dir):
    """Top-5 TF-IDF terms per document, deterministic (score desc,
    term asc) ranking; idf via libm-exact ln so the 6-dp rounds agree
    bit-for-bit with DuckDB."""
    from qctimeseries_spark.datapipe.text import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=5)


def q_t18_unigram_nll(spark, sf_dir):
    """Per-doc Laplace-unigram negative log-likelihood (the perplexity
    quality signal): per-token -ln p quantized to exact integer
    micro-units before the per-doc sum, so grouping order cannot move
    the hash."""
    from qctimeseries_spark.datapipe.text import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


def q_t19_repetition(spark, sf_dir):
    """Gopher-style repetition screen: duplicate 2/3-gram ratios +
    top-word share per document, every ratio one correctly-rounded
    division of exact integers."""
    from qctimeseries_spark.datapipe.text import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def q_d8_embedding_store(spark, sf_dir):
    """Incremental SEMANTIC dedup: even-id vectors seed a persistent
    unit-vector store, then a second batch (odd vectors ∪ perturbed
    copies of every 10th vector at cosine ≈ 0.99) dedups against it —
    perturbed re-encodes drop on a store cosine ≥ 0.9, fresh vectors
    survive with their max store cosine.  The oracle mirrors the exact
    brute tier: every batch×store cosine with the identical left-fold
    summation, rounded to 9 dp before the max/threshold.

    Eager at construction (store ops materialize before appending);
    per-invocation temp store removed before returning."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.dedup import embedding_dedup_against_store

    c = _emb_corpus(spark, sf_dir)
    even = c.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 1000000))
    batch = c.filter(
        ((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 1000000))
        | (F.col("vec_id") >= 1000000)
    )
    tmp = tempfile.mkdtemp(prefix="qcts_emb_")
    try:
        store = tmp + "/vectors"
        # max_store_brute=32768 keeps this ORACLE query on the exact
        # broadcast tier through sf1 (store ≈ 11k rows there), so the
        # reported max_store_cos is the true max and the hash compare
        # stays full-strength; production keeps the 8k default cutover
        # to IVF, whose drop recall is validated by the planted sf1
        # check (BENCHNOTES: 200/200)
        kw = dict(
            id_col="vec_id", vec_col="v", threshold=0.9,
            max_store_brute=32768,
        )
        embedding_dedup_against_store(even, store, **kw)  # seed
        out = embedding_dedup_against_store(batch, store, **kw)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select("vec_id", F.round("max_store_cos", 9).alias("max_store_cos"))


def q_t16_bpe_merges(spark, sf_dir):
    """Full (bounded) BPE trainer: 10 iterated merges over the corpus
    vocabulary, deterministic tie-break (count desc, pair asc).  The
    oracle unrolls the identical merge loop as chained CTEs — same
    single-character symbol encoding, same private-use codepoints for
    minted symbols, same left-to-right non-overlapping replace — so
    the merge SEQUENCE itself is what the hash pins."""
    from qctimeseries_spark.datapipe.text import bpe_train

    return bpe_train(_docs(spark, sf_dir), n_merges=10)


def _bpe_chain_parts(n: int, *, with_merges: bool) -> list[str]:
    """The unrolled BPE merge loop as CTE parts — vocabulary ``v{i}``,
    pair counts ``p{i}``/argmax ``b{i}`` per rank, and (when
    ``with_merges``) the decoded merge rows ``m{i}``.  Shared by the
    t16 (train) and t21 (train→encode) oracles so the two mirrors
    cannot drift."""
    toks = _TOKS.format(c="text")
    # MATERIALIZED: each stage is referenced several times downstream
    # (scalar subqueries + the next vocabulary) — without it DuckDB
    # inlines the chain and evaluation doubles per merge
    parts = [
        f"w0 AS (SELECT unnest({toks}) AS w FROM documents)",
        "v0 AS MATERIALIZED (SELECT w, COUNT(*) AS n FROM w0 GROUP BY w)",
    ]
    for i in range(n):
        parts.append(
            f"p{i} AS (SELECT unnest(list_transform("
            f"range(1, CAST(length(w) AS INT)), j -> substr(w, j, 2)))"
            f" AS pair, n FROM v{i})"
        )
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT pair, CAST(SUM(n) AS BIGINT)"
            f" AS cnt FROM p{i} GROUP BY pair ORDER BY cnt DESC, pair"
            f" LIMIT 1)"
        )
        if with_merges:
            tok = "pair"
            for j in range(i - 1, -1, -1):
                tok = (
                    f"replace({tok}, chr({0xE000 + j}),"
                    f" (SELECT token FROM m{j}))"
                )
            parts.append(
                f"m{i} AS MATERIALIZED (SELECT {i} AS merge_rank, pair,"
                f" {tok} AS token, cnt AS n_occurrences FROM b{i})"
            )
        if i + 1 < n:
            parts.append(
                f"v{i + 1} AS MATERIALIZED (SELECT replace(w,"
                f" (SELECT pair FROM b{i}), chr({0xE000 + i})) AS w, n"
                f" FROM v{i})"
            )
    return parts


def _bpe_merges_sql(n: int) -> str:
    """DuckDB mirror of :func:`bpe_train`: the merge loop unrolled to
    ``n`` CTE stages (pair count → argmax → replace), token surfaces
    decoded by substituting each minted private-use symbol with its
    (already fully decoded) predecessor token."""
    parts = _bpe_chain_parts(n, with_merges=True)
    union = " UNION ALL ".join(f"SELECT * FROM m{i}" for i in range(n))
    return "WITH " + ",\n".join(parts) + "\n" + union


def _bpe_encode_sql(n: int) -> str:
    """DuckDB mirror of :func:`bpe_train` → :func:`bpe_encode`:
    re-derives the ``n``-merge table (shared CTE chain with the t16
    oracle), then applies the identical rank-ordered replace chain to
    every document's tokens — ``length(encoded)`` is the BPE token
    count because every symbol is one character."""
    parts = _bpe_chain_parts(n, with_merges=False)
    toks = _TOKS.format(c="text")
    enc = "w"
    for i in range(n):
        enc = f"replace({enc}, b{i}.pair, chr({0xE000 + i}))"
    froms = ", ".join(f"b{i}" for i in range(n))
    parts.append(f"tk AS (SELECT doc_id, {toks} AS tk FROM documents)")
    parts.append(
        f"e AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,"
        f" CAST(COALESCE(list_sum(list_transform(tk, w -> length(w))), 0)"
        f" AS BIGINT) AS n_chars,"
        f" CAST(COALESCE(list_sum(list_transform(tk, w -> length({enc}))),"
        f" 0) AS BIGINT) AS n_bpe_tokens"
        f" FROM tk, {froms})"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT doc_id, n_tokens, n_chars, n_bpe_tokens,"
        " CASE WHEN n_bpe_tokens > 0 THEN"
        " ROUND(n_chars / CAST(n_bpe_tokens AS DOUBLE), 6)"
        " ELSE 0.0 END AS chars_per_bpe_token FROM e"
    )


def q_d7_incremental_neardup(spark, sf_dir):
    """Incremental NEAR-dup ingestion: even-id docs seed a persistent
    signature store (fingerprint + MinHash band hashes + shingle
    hashes), then a second batch (odd docs ∪ boilerplate-drifted
    re-crawls of every 6th doc — three appended tokens, which an
    exact-fingerprint store cannot catch) dedups against it.  Drifted
    re-crawls drop on a band collision verified at shingle-Jaccard
    ≥ 0.6; fresh odd docs survive.  The oracle is the identical set
    algebra — same MinHash family, same banding, same verification —
    so both engines make the same (deterministic) LSH decisions.

    Both batches run eagerly at construction (the store operators
    materialize before appending); the store is a per-invocation temp
    dir removed before returning."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.dedup import neardup_against_store

    d = _docs(spark, sf_dir).select("doc_id", "text")
    even = d.filter(F.col("doc_id") % 2 == 0)
    odd = d.filter(F.col("doc_id") % 2 == 1)
    drift = d.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" crawled mirror banner")).alias("text"),
    )
    tmp = tempfile.mkdtemp(prefix="qcts_nds_")
    try:
        store = tmp + "/signatures"
        kw = dict(k=15, bands=5, ngram=3, threshold=0.6)
        neardup_against_store(even, store, **kw)  # batch 1 seeds
        out = neardup_against_store(odd.unionByName(drift), store, **kw)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select("doc_id", "fingerprint")


def q_m1_media_summary(spark, sf_dir):
    """Per-modality byte/row accounting over the derived media table."""
    return media_summary(attach_media(_docs(spark, sf_dir)))


def q_m2_media_features(spark, sf_dir):
    """Arrow-batched mapInPandas header parse + feature extraction.

    ``width``/``height``/``sample_rate``/``duration_s`` are recovered
    by REAL container parsing (PNG IHDR / JPEG SOF / WAV fmt / MP4
    mvhd walks over the payload bytes); the oracle recomputes them
    arithmetically from the id, so a hash match proves the parser
    inverts the container format.  The embedding tier stays the
    deterministic MD5 stand-in over the decoded content segment (real
    pixel/sample codecs aren't in this container, SURVEY.md §7.2/9).

    ``features`` (array<double> of exact k/256 values) is rendered as a
    comma-joined string of the integer numerators so the driver's
    pandas canonicalizer can sort/hash it — arrays are unhashable
    there, and integer text is engine-portable where double text isn't.
    """
    feats = extract_features(attach_media(_docs(spark, sf_dir)), dim=16)
    return feats.select(
        "media_id",
        "modality",
        "fmt",
        "n_bytes",
        "valid",
        "width",
        "height",
        "sample_rate",
        "duration_s",
        "feature_dim",
        F.array_join(
            F.transform(
                F.col("features"),
                lambda x: F.round(x * 256).cast("int").cast("string"),
            ),
            ",",
        ).alias("features_u8"),
    )


def q_m3_media_decode(spark, sf_dir):
    """REAL payload decode over the derived media table: PNG IDAT is
    inflated (genuine zlib) to the pixel-byte stream, WAV data is
    unpacked as signed PCM16 samples; per-item unit count / exact sum /
    mean / RMS.  JPEG and MP4 stay ``decoded=false`` (entropy decode /
    demux need codec libraries this container doesn't ship).

    The oracle recomputes the statistics arithmetically from the
    document bytes (hex-pair expansion of the UTF-8 blob), so a hash
    match proves the Spark side genuinely inverted the zlib stream and
    the PCM sample layout — integer sums are < 2^53 and the derived
    doubles are single correctly-rounded ops, hence bit-portable.
    """
    return decode_media(attach_media(_docs(spark, sf_dir)))


def q_m4_resize(spark, sf_dir):
    """Image thumbnailing over the derived media table: REAL decode to
    the pixel raster (PNG inflate / JPEG entropy decode + IDCT), then
    an exact 2×2 box-average downscale — integer floor arithmetic
    end-to-end, so the resized-raster statistics hash across engines.
    WAV/MP4 have no spatial axes (``resized=false``); their temporal
    reduction is m5."""
    from qctimeseries_spark.datapipe.multimodal import resize_media

    return resize_media(attach_media(_docs(spark, sf_dir)), factor=2)


def q_m5_frame_sample(spark, sf_dir):
    """Temporal frame sampling: keep every 4th frame of the time-axis
    payloads, decoding ONLY those — MP4 frames are located via the
    file's own stbl (stsz uniform size + stco chunk offset) and
    ``struct.unpack_from`` touches exactly the sampled byte ranges, a
    genuine index-driven partial decode.  PNG/JPEG have no time axis
    (``sampled=false``)."""
    from qctimeseries_spark.datapipe.multimodal import sample_frames

    return sample_frames(attach_media(_docs(spark, sf_dir)), every=4)


def q_m6_phash_dedup(spark, sf_dir):
    """Perceptual-hash (aHash) fingerprint buckets over REAL decoded
    media — the multimodal dedup table: PNG payloads inflate (zlib) to
    pixel bytes, WAV unpacks to little-endian PCM16, MP4 demuxes via
    its own stbl to big-endian samples; the first-48-unit
    mean-threshold signature is cross-multiplied (unit·n > Σ) so no
    float exists, and items grouping to the same (fmt, signature)
    bucket are perceptual collisions (n_items > 1).  JPEG is excluded
    by design: DC-only decode repeats each block value 64×, making
    every ≤62-unit window constant — signature 0 for all items (see
    media_ahash).  The oracle reproduces decode + signature
    arithmetically from the document bytes, so a hash match proves the
    engine genuinely inverted the three container formats."""
    from qctimeseries_spark.datapipe.multimodal import (
        attach_media,
        media_ahash,
    )

    media = attach_media(_docs(spark, sf_dir)).filter(
        F.col("fmt") != "jpeg"
    )
    sigs = media_ahash(media, n_units=48)
    return sigs.groupBy("fmt", "signature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.min("media_id").alias("keeper"),
    )


def q_m7_jpeg_dc_phash(spark, sf_dir):
    """DCT-domain perceptual-hash buckets for the JPEG slice m6
    excludes: the engine entropy-decodes each file's DC difference
    chain (Huffman + sign extension) and Huffman-SKIPS the AC
    spectra — no IDCT, no pixel buffer — then sets bit j when DC
    block j exceeds the grid mean (cross-multiplied, no float).  The
    DC plane is the 1/8-scale luma image, so same-signature groups
    are perceptual near-dups (uniform-brightness shifts hash
    identically).  The oracle rebuilds the quantized-DC wheel
    arithmetically from the id, so a hash match proves the engine
    genuinely inverted the entropy coding."""
    from qctimeseries_spark.datapipe.multimodal import (
        attach_media,
        media_dc_phash,
    )

    media = attach_media(_docs(spark, sf_dir)).filter(
        F.col("fmt") == "jpeg"
    )
    sigs = media_dc_phash(media, n_blocks=48)
    return sigs.groupBy("fmt", "signature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.min("media_id").alias("keeper"),
    )


def q_t10_token_budget(spark, sf_dir):
    """Deterministic token-budget prefix: documents in hash-bucket
    order until 6,000 cumulative whitespace tokens.  Two-phase at
    scale (bucket histogram + boundary-bucket cumsum); the oracle is
    the equivalent single global window cumsum."""
    d = text_stats(_docs(spark, sf_dir)).select("doc_id", "lang", "n_tokens")
    return sample_to_token_budget(d, "doc_id", "n_tokens", budget=6000)


#: the t13 mixture targets, normalized once so the Spark literals and
#: the oracle's VALUES list are the same doubles
_MIX_TARGETS = {"en": 0.4, "zh": 0.3, "de": 0.1, "fr": 0.1, "es": 0.1}


def q_t12_bpe_pairs(spark, sf_dir):
    """Tokenizer-training statistic: top-40 adjacent character pairs
    weighted by word frequency (the first BPE merge iteration's
    argmax candidates).  Corpus-sized work = one shuffle on the word;
    pair expansion runs over the vocabulary only.  Deterministic
    selection: count desc, pair asc."""
    from qctimeseries_spark.datapipe.text import bpe_pair_counts

    return (
        bpe_pair_counts(_docs(spark, sf_dir))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair"))
        .limit(40)
    )


def q_t13_mixture(spark, sf_dir):
    """Data-mixing computation: per-language token totals, corpus
    share, and the per-group keep fraction realizing a 40/30/10/10/10
    en/zh/de/fr/es token mixture without upsampling."""
    from qctimeseries_spark.datapipe.sample import mixture_weights

    d = _docs(spark, sf_dir).select(
        "lang", token_count(F.col("text")).alias("n_tokens")
    )
    return mixture_weights(d, "lang", "n_tokens", _MIX_TARGETS)


def q_t14_token_shards(spark, sf_dir):
    """Shard packing: documents in deterministic hash order, cut every
    2,000 cumulative tokens; a doc's shard is where its first token
    lands.  Two-phase prefix sum (bucket histogram + partitioned
    within-bucket cumsum) — the oracle is the equivalent single global
    window cumsum."""
    from qctimeseries_spark.datapipe.sample import assign_token_shards

    d = text_stats(_docs(spark, sf_dir)).select("doc_id", "n_tokens")
    return assign_token_shards(d, "doc_id", "n_tokens", 2000)


#: t15 bucket edges over n_tokens — explicit (not quantile-derived) so
#: the bucketing is deterministic across snapshots and engines
_PSI_EDGES = [20.0, 40.0, 60.0, 80.0, 100.0]


def q_t15_psi(spark, sf_dir):
    """Corpus drift screen: PSI of the token-count distribution,
    even-id docs (the 'new crawl') vs odd-id docs (the reference).
    Two thin bucket-count aggregations + a broadcast join — corpus
    size touches only the counting scans."""
    from qctimeseries_spark.datapipe.monitor import population_stability

    d = text_stats(_docs(spark, sf_dir)).select("doc_id", "n_tokens")
    cur = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("n_tokens").cast("double").alias("x")
    )
    ref = d.filter(F.col("doc_id") % 2 == 1).select(
        F.col("n_tokens").cast("double").alias("x")
    )
    return population_stability(cur, ref, "x", _PSI_EDGES)


def q_t11_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test tagging — contiguous hash
    bucket ranges, pure function of the doc id."""
    return split_corpus(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )


def _curate_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ mangled re-crawls of every 10th doc (exact-dup tier,
    caught by dedup) ∪ 'leaked' benchmark copies of every 50th doc
    (caught by decontamination) — the mess a crawl hands a curation
    pipeline."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    mangled = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "lang",
            F.regexp_replace(F.upper("text"), " ", "  ").alias("text"),
        )
    )
    leaked = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 50 == 0)
        .select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            "lang",
            F.concat(F.lit("leaked copy "), F.col("text")).alias("text"),
        )
    )
    return d.unionByName(mangled).unionByName(leaked)


def q_c2_curate(spark, sf_dir):
    """Flagship composed pipeline: exact dedup (keeper = min id per
    fingerprint) → benchmark decontamination (≥1 shared 8-gram) →
    quality ≥ 0.5 → deterministic 50% hash sample.  One lazy chain,
    two wide stages (fingerprint window + shingle-count groupBy); the
    benchmark side is broadcast.  Every stage is individually
    oracle-checked (d1/t7/t3/t8); this checks their composition."""
    src = _curate_src(spark, sf_dir)
    bench = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", "text")
    )
    out = curate_corpus(
        src,
        bench,
        ngram=8,
        min_shared_ngrams=1,
        quality_min=0.5,
        sample_fraction=0.5,
    )
    return out.select("doc_id", "lang", "fingerprint", "n_tokens", "quality")


def q_t20_line_dedup(spark, sf_dir):
    """C4-style repeated-line (boilerplate) removal: each doc becomes
    three lines — its own text, a banner shared by every doc_id%7
    class (planted boilerplate), and a unique tail.  Lines occurring
    in ≥3 distinct documents are stripped; the oracle is the identical
    split/count/filter/reassemble algebra."""
    from qctimeseries_spark.datapipe.text import strip_repeated_lines

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(
                F.lit("subscribe banner "),
                (F.col("doc_id") % 7).cast("string"),
            ),
            F.concat(F.lit("unique tail "), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return strip_repeated_lines(d, min_docs=3)


def q_d9_semantic_dedup(spark, sf_dir):
    """SemDeDup-style retention pass over the planted embedding corpus:
    cosine-0.9 pairs -> transitive clusters -> min-id keeper; every
    perturbed re-encode (vec_id >= 1000000) collapses into its
    original's cluster and drops.  The oracle composes d5's exact pair
    algebra with c1's recursive-CTE reachability closure."""
    from qctimeseries_spark.datapipe.dedup import semantic_dedup

    out = semantic_dedup(
        _emb_corpus(spark, sf_dir), id_col="vec_id", vec_col="v",
        threshold=0.9, nprobe="auto",
    )
    return out.select("vec_id")


def q_t21_bpe_encode(spark, sf_dir):
    """Tokenizer APPLICATION: train 10 BPE merges on the corpus (the
    t16 schedule), then encode every document with the resulting merge
    table — per-doc whitespace-token, character and BPE-token counts
    plus chars-per-BPE-token (the compression the tokenizer actually
    achieves).  The oracle re-derives the identical merge table in SQL
    (same chained CTEs as t16) and applies the same replace chain, so
    the hash pins train→apply end-to-end."""
    from qctimeseries_spark.datapipe.text import bpe_encode, bpe_train

    d = _docs(spark, sf_dir)
    return bpe_encode(d, bpe_train(d, n_merges=10))


def q_t22_bigram_nll(spark, sf_dir):
    """Per-doc Laplace-BIGRAM negative log-likelihood — the word-order
    quality screen (shuffled-word spam scores normal under t18's
    unigram model but lights up here).  Same integer micro-unit
    quantization before the per-doc sum as t18."""
    from qctimeseries_spark.datapipe.text import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir))


def q_t24_source_cap(spark, sf_dir):
    """Domain balancing: at most 8 docs per source, selected by key
    hash (an unbiased per-source sample — not a storage-order head).
    The oracle is the global rank-≤-cap semantics the two-phase
    histogram construction must reproduce row-identically."""
    from qctimeseries_spark.datapipe.sample import cap_per_group

    out = cap_per_group(_docs(spark, sf_dir), "source", "doc_id", 8)
    return out.select("doc_id", "source")


def q_t25_quality_classifier(spark, sf_dir):
    """Model-based quality filter: linear classifier over hashed
    unigram∪bigram features (the hashing trick), integer milli-unit
    weights so the per-doc sum is exact and the score one
    correctly-rounded division.  Zero shuffles — pure row-local map."""
    from qctimeseries_spark.datapipe.text import classify_quality

    return classify_quality(_docs(spark, sf_dir))


def q_x4_radius_search(spark, sf_dir):
    """Range-query similarity: every corpus vector with cosine ≥ 0.25
    of a query vector, IVF-restricted (seeded centroids, nlist=16,
    nprobe=4 — deterministic end-to-end, so fully oracle-expressible).
    Unlike the knn queries there is NO per-query ranking window — the
    survivors stream out of the probed-cell join's filter."""
    from qctimeseries_spark.datapipe.similarity import radius_search

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return radius_search(
        emb, queries, threshold=0.25, strategy="ivf", nlist=16, nprobe=4
    )


def q_x3_knn_persisted(spark, sf_dir):
    """Persisted-index ANN: build_ivf_index writes centroids/ + the
    centroid-partitioned cells/ store once, knn_query_index serves the
    same five queries from it via broadcast probe join + dynamic
    partition pruning.  Result is bit-identical to x2's fresh in-memory
    build (same seeded centroids, 9-dp rounding, id tie-breaks), so
    it shares x2's full DuckDB oracle — the hash pins the store
    ROUNDTRIP: any loss in the parquet persist/read of the float
    vectors or cell assignment would break it."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.similarity import (
        build_ivf_index,
        knn_query_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="qcts_ivfx_")
    try:
        build_ivf_index(emb, tmp + "/index", nlist=16)
        out = knn_query_index(
            spark, tmp + "/index", queries, k=10, nprobe=4
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_x5_knn_index_append(spark, sf_dir):
    """Incremental index growth: build the persisted IVF index on the
    EVEN-id half of the corpus (so its seeded centroids differ from
    x2/x3's), append the odd half with `append_to_ivf_index` (assigned
    to the FROZEN build-time centroids, appended into the existing
    cells/ partitions — no rebuild), then serve the same five queries.
    The oracle recomputes the equivalent single pass: centroids from
    the even half, assignment and scoring over the full corpus — the
    hash pins that an append-grown store serves exactly like a
    full-corpus build with the same centroids."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        knn_query_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="qcts_ivfapp_")
    try:
        build_ivf_index(
            emb.filter(F.col("vec_id") % 2 == 0), tmp + "/index", nlist=16
        )
        append_to_ivf_index(
            spark, tmp + "/index", emb.filter(F.col("vec_id") % 2 == 1)
        )
        out = knn_query_index(
            spark, tmp + "/index", queries, k=10, nprobe=4
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_x6_quantized_knn(spark, sf_dir):
    """INT8-quantized similarity search: both sides quantize to
    symmetric int8 (floor(127·v/max|v| + 0.5), clamped) and the brute
    top-k runs over the quantized store — ~4× less store IO at 100 TB,
    with per-vector scales cancelling out of the cosine so the search
    never dequantizes.  The oracle replays the identical quantization
    and integer-cosine fold, so the hash pins the quantized store
    bit-for-bit across engines."""
    from qctimeseries_spark.datapipe.similarity import knn_quantized

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_quantized(emb, queries, k=10)


def q_x7_pq_knn(spark, sf_dir):
    """Product-quantized ANN: corpus encodes to 8-nibble PQ codes
    (64–128× less candidate-scan IO than raw vectors — the rung above
    x6's int8), ADC scores per (query, code) via an m-term LUT fold,
    top-50 candidates re-rank on exact cosine.  Every float path —
    codebook construction from the 16 lowest-id unit vectors, encode
    argmin, LUT dots, ADC fold, cosine — is left-to-right and
    literal-driven, so the oracle replays the ENTIRE pipeline
    (training → encode → score → cut → re-rank) bit-for-bit in SQL."""
    from qctimeseries_spark.datapipe.similarity import knn_pq

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_pq(emb, queries, k=10, m=8, ksub=16, candidates=50)


def q_x8_pq_index(spark, sf_dir):
    """IVF-PQ persisted index, built then served: IVF cells bound the
    candidate scan to ~nprobe/nlist of the store via dynamic partition
    pruning (the x3 mechanism) while PQ codes bound its bytes to
    ~9/row (the x7 mechanism); only the top-50 ADC survivors read raw
    vectors for the exact re-rank.  Deterministic centroids +
    codebooks let the oracle replay build AND serve end-to-end; the
    packed code column never reaches the oracle, so the hash transits
    the pack→shift/mask-unpack round trip."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.similarity import (
        build_pq_index,
        knn_query_pq_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="qcts_pqidx_")
    try:
        build_pq_index(emb, tmp + "/idx", nlist=16, m=8, ksub=16)
        out = knn_query_pq_index(
            spark, tmp + "/idx", queries, k=10, nprobe=4, candidates=50
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_t23_span_dedup(spark, sf_dir):
    """SPAN-level dedup (ExactSubstr family): every 5th doc gains the
    same 8-token promo tail — unique documents, unique lines, but a
    verbatim repeated SPAN — and `strip_repeated_spans` must excise
    exactly the tokens covered by corpus-repeated 6-grams while
    untouched docs pass through whole.  The oracle replays the
    identical gram-hash/count/coverage/reassembly algebra."""
    from qctimeseries_spark.datapipe.text import strip_repeated_spans

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" sponsored content brought to you by our partners"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return strip_repeated_spans(d, width=6, min_count=2)


def q_d11_canonical_keep(spark, sf_dir):
    """Quality-aware dedup retention: each near-dup cluster keeps its
    LONGEST member (token count, ties to the lower id) instead of the
    min id — re-crawls truncate, so min-id retention routinely keeps
    the damaged copy.  Components + keeper election run over the tiny
    pair-list membership; the corpus pays two thin left joins.  On the
    planted corpus the mangled re-crawls are 3 tokens longer, so the
    keeper genuinely diverges from c1's min-id choice."""
    from qctimeseries_spark.datapipe.dedup import canonical_keep
    from qctimeseries_spark.datapipe.text import token_count

    # materialize the thin (doc_id, n_tokens) frame once: canonical_keep
    # reads `docs` in TWO branches (the keeper-election score join and
    # the final cluster/keeper attach), and only exchanges dedupe under
    # plan reuse — unmaterialized, the planted-corpus construction and
    # its full-text tokenize ran once per branch (guide §1.2 step 1;
    # two longs per doc, always thin)
    docs = _near_corpus(spark, sf_dir).withColumn(
        "n_tokens", token_count(F.col("text"))
    ).select("doc_id", "n_tokens").localCheckpoint(eager=False)
    pairs = minhash_dedup_pairs(
        _near_corpus(spark, sf_dir), k=15, bands=5, ngram=3, threshold=0.6
    )
    return canonical_keep(docs, pairs, score_col="n_tokens")


def q_x10_cell_sample(spark, sf_dir):
    """Cluster-balanced embedding downsample: ≤ 20 vectors per IVF
    cell (nlist=16), survivors a deterministic hash sample per cell —
    coverage-preserving where uniform sampling preserves (wrong) the
    density of the boilerplate head.  Assignment is the zero-shuffle
    Arrow pass; the cap is the two-phase histogram (no per-cell
    funnel).  Oracle replays assignment + cap arithmetic."""
    from qctimeseries_spark.datapipe.similarity import cell_balanced_sample

    emb = read_table(spark, sf_dir, "embeddings")
    return cell_balanced_sample(emb, nlist=16, cap=20)


def q_x9_filtered_knn(spark, sf_dir):
    """FILTERED vector search against the persisted IVF store: top-10
    among vectors satisfying a metadata predicate (label < 3).  The
    build carries every corpus column into cells/, so the predicate
    applies PRE-scoring (full-recall top-k over the filtered set — a
    post-filter would return short lists) and reaches the parquet scan
    as a pushed filter multiplying with the DPP cell pruning.  Oracle
    = x2's probed-cell replay with the same label cut."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.similarity import (
        build_ivf_index,
        knn_query_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="qcts_fivf_")
    try:
        build_ivf_index(emb, tmp + "/index", nlist=16)
        out = knn_query_index(
            spark, tmp + "/index", queries, k=10, nprobe=4,
            where="label < 3",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_t26_shuffle_shard(spark, sf_dir):
    """Deterministic global corpus shuffle + shard assignment (the
    step before a training run reads the data): permutation key =
    hash60(seed:doc_id) — a pure function of the row, so re-runs,
    retries, and engines agree on which document is sample #N of
    shard #K (orderBy(rand()) guarantees none of that).  shard = h %
    n routes with no global coordination; within-shard position is a
    per-shard rank — one shuffle on the shard id, parallelism = #
    shards, no global window.  The oracle replays the identical hash
    arithmetic."""
    from qctimeseries_spark.datapipe.sample import shuffle_shard

    d = _docs(spark, sf_dir).select("doc_id", "source")
    return shuffle_shard(d, "doc_id", n_shards=8, seed="r8")


def q_t28_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split: the split key is the
    dup-CLUSTER representative (connected components over the d2
    near-dup pairs), so near-identical documents can never straddle
    the train/test boundary.  Components run over the tiny pair list;
    one thin left join attaches them; the split itself is the same
    zero-shuffle CASE expression as t11.  The oracle replays clusters
    via the recursive reachability CTE and the identical hash ranges."""
    from qctimeseries_spark.datapipe.sample import leakage_safe_split

    corpus = _near_corpus(spark, sf_dir)
    pairs = minhash_dedup_pairs(
        corpus, k=15, bands=5, ngram=3, threshold=0.6
    )
    return leakage_safe_split(
        corpus.select("doc_id"),
        pairs,
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )


def q_d10_cross_neardup(spark, sf_dir):
    """Cross-corpus MinHash-LSH join — FUZZY decontamination: corpus
    docs that are near-duplicates (shingle Jaccard ≥ 0.6) of a
    benchmark text.  The corpus pays one signature projection and
    never shuffles its bands (the benchmark band table broadcasts);
    Jaccard verifies only candidates.  Corpus = the leak corpus minus
    the benchmark's own rows, so every hit is a genuine leak
    (the planted 'leaked copy' prefix docs)."""
    from qctimeseries_spark.datapipe.dedup import minhash_join

    corpus = _leak_corpus(spark, sf_dir).filter(
        (F.col("doc_id") % 50 != 0) | (F.col("doc_id") >= 3000000)
    )
    bench = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", "text")
    )
    return minhash_join(
        corpus, bench, k=15, bands=5, ngram=3, threshold=0.6
    )


def q_t27_bm25(spark, sf_dir):
    """BM25 top-5 retrieval of corpus docs per benchmark query — the
    sparse decontamination/curation tier.  Corpus collapses once to
    thin (doc, term, tf) postings; the query vocabulary broadcasts to
    prune postings map-side before document frequencies; per-term
    contributions quantize to integer micro-units before the (query,
    doc) sum (the t18 precedent), so aggregation order cannot move the
    hash.  Benchmark slice = doc_id % 50 == 0, excluded from the
    corpus side so ranks carry no self-hits — and capped at the FIXED
    id horizon < 5,000 (the t29 treatment: a no-op at sf0.01/sf0.1,
    while at sf1 the query set stops scaling with the corpus, which
    is what made this oracle one of the slow-oracle sweep
    exclusions)."""
    from qctimeseries_spark.datapipe.text import bm25_retrieval

    d = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    bench = d.filter(
        (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 5000)
    ).select(F.col("doc_id").alias("query_id"), "text")
    return bm25_retrieval(
        corpus, bench, query_text_col="text", k=5
    )


def q_t29_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 (sparse) and brute-force embedding
    cosine (dense) top-10 lists fused by reciprocal-rank fusion into
    a top-5 — the standard two-tower retrieval shape for curation and
    decontamination (each tier misses what the other catches: BM25
    the paraphrases, dense the rare exact terms).  Fusion inputs are
    |queries| x 10 rows, so the fused stage costs nothing next to the
    retrievers; per-list contributions quantize to integer nano-units
    before the sum, so the hash is order-proof.  The documents and
    embeddings tables share the id axis (vec_id == doc_id), making
    the benchmark slice doc_id % 50 == 0 on both sides — capped at a
    FIXED id horizon (< 5,000) so the query-set size stops scaling
    with the corpus (r9 verdict task 5: at sf1 the uncapped 1,000
    BM25 queries × stopword postings made the DuckDB oracle a
    1,782 s outlier that dodged the routine sf1 sweep; the CORPUS
    side still scales, which is what the benchmark measures).  The
    cap is a no-op at sf0.01 (500 docs) and sf0.1 (5,000 docs), so
    driver and bench hashes are unchanged."""
    from qctimeseries_spark.datapipe.similarity import rrf_fuse
    from qctimeseries_spark.datapipe.text import bm25_retrieval

    d = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    bench = d.filter(
        (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 5000)
    ).select(F.col("doc_id").alias("query_id"), "text")
    sparse = bm25_retrieval(corpus, bench, query_text_col="text", k=10)
    emb = read_table(spark, sf_dir, "embeddings")
    dense = knn_bruteforce(
        emb.filter(F.col("vec_id") % 50 != 0),
        emb.filter(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 5000)
        ).select(F.col("vec_id").alias("query_id"), "embedding"),
        k=10,
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse(
        [sparse.select("query_id", "doc_id", "rank"), dense], k=5
    )


def q_t30_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus downsample: the 100 winners of the
    Efraimidis–Vitter exponential race with weight = n_chars (longer
    docs proportionally likelier).  Membership is a pure function of
    (seed, doc_id, weight) — no PRNG — so the oracle selects the
    identical set; the plan is a narrow hash+ln projection into
    TakeOrderedAndProject (per-partition top-n heaps, no global
    sort)."""
    from qctimeseries_spark.datapipe.sample import weighted_sample

    return weighted_sample(
        _docs(spark, sf_dir).select("doc_id", "n_chars"),
        "n_chars",
        100,
        key_col="doc_id",
    )


def q_t31_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty (share of the doc's distinct word
    trigrams appearing in no other document) — the corpus-internal
    duplication profile that picks span-dedup thresholds.  Hashed
    grams shuffle as 8-byte ids (the wide text column never moves);
    two thin postings shuffles + one equi-join total."""
    from qctimeseries_spark.datapipe.text import ngram_novelty

    return ngram_novelty(_docs(spark, sf_dir), n=3)


def q_x11_cell_stats(spark, sf_dir):
    """IVF index health audit: per-cell occupancy, corpus share, and
    member-to-centroid cosine spread over the x2 16-cell layout.
    Zero-shuffle Arrow assignment + broadcast centroid re-attach; the
    only shuffle carries four numbers per cell.  Member cosines are
    9-dp-rounded and micro-quantized before the mean's sum, so the
    result is hash-exact across engines."""
    from qctimeseries_spark.datapipe.similarity import cell_stats

    return cell_stats(read_table(spark, sf_dir, "embeddings"), nlist=16)


def q_t32_bloom_prune(spark, sf_dir):
    """Bloom-filter contamination prune: per corpus document, how many
    of its distinct 8-grams are POSSIBLY in the benchmark slice (both
    Bloom slots set, m=2^18, k=2) — t7's decontamination screen with
    the broadcast capped at m slots instead of the benchmark's gram
    count.  The false positives are deterministic (hash60 slot
    positions), so the oracle reproduces the exact hit set; benchmark
    self-rows anti-joined per the t7 convention."""
    from qctimeseries_spark.datapipe.sketches import bloom_prune

    d = _docs(spark, sf_dir).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    return bloom_prune(d, bench, ngram=8).join(
        bench.select("doc_id"), "doc_id", "left_anti"
    )


def q_t33_cms_heavyhitters(spark, sf_dir):
    """Count-min token-frequency estimation: a 4×1024 sketch built
    over all token occurrences (map-side combine bounds the shuffle at
    4096 cells), probed for every distinct term and joined with the
    exact counts — the (term, est, exact) audit shows the over-count
    the collisions cost.  All-integer output, hash-exact trivially."""
    from qctimeseries_spark.datapipe.sketches import cms_build, cms_estimate
    from qctimeseries_spark.datapipe.text import tokens

    d = _docs(spark, sf_dir)
    sk = cms_build(d)
    occ = d.select(F.explode(tokens(F.col("text"))).alias("term"))
    est = cms_estimate(sk, occ.distinct())
    exact = occ.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact")
    )
    return est.join(exact, "term")


def q_t34_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-trigram estimate per language: 1024
    max-rho registers per group (the register state is the shuffle
    payload — m ints per group no matter the corpus size), harmonic
    estimate over an EXACT scaled-integer register sum.  Trigram
    cardinality at sf0.01 pushes past the linear-counting range, so
    the genuine harmonic branch is exercised."""
    from qctimeseries_spark.datapipe.dedup import shingles
    from qctimeseries_spark.datapipe.sketches import hll_distinct

    g = _docs(spark, sf_dir).select(
        "lang", F.explode(shingles(F.col("text"), 3)).alias("gram")
    )
    return hll_distinct(g, "gram", group_cols=("lang",))


def q_x12_embedding_drift(spark, sf_dir):
    """Embedding-space drift audit: per-dimension mean vectors of two
    snapshot halves (a seeded hash split of vec_id) and the absolute
    shift — the encoder-swap / source-mix / zeroed-dim screen.  One
    map-side-combined shuffle of ~dim rows per task, a dim-rows join;
    means are exact micro-unit integer sums divided once."""
    from qctimeseries_spark.datapipe.hashing import seeded_hash60
    from qctimeseries_spark.datapipe.monitor import embedding_drift

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    h = seeded_hash60(F.col("vec_id").cast("string"), 7)
    return embedding_drift(
        emb.filter(h % 2 == 0), emb.filter(h % 2 == 1)
    )


def q_t35_perplexity_buckets(spark, sf_dir):
    """CCNet-style corpus partition: head/middle/tail terciles by
    unigram-NLL rank (SQL NTILE(3) semantics over (avg_nll, doc_id)),
    computed with NO global sort — a value-histogram prefix sum
    assigns whole buckets driver-side and only the ≤3 boundary
    value-buckets pay a (per-bucket-partitioned) ranking window."""
    from qctimeseries_spark.datapipe.sample import ntile_by_score
    from qctimeseries_spark.datapipe.text import unigram_logprob

    nll = unigram_logprob(_docs(spark, sf_dir)).select("doc_id", "avg_nll")
    return ntile_by_score(nll, "avg_nll", "doc_id", 3)


def q_t36_nfc_dedup(spark, sf_dir):
    """Unicode-normalization-aware exact dedup: planted variants carry
    the DECOMPOSED accent (e + U+0301), doubled spaces, and uppercase,
    while their originals carry the COMPOSED form (U+00E9) — byte-level
    fingerprints see different documents until NFC + casefold +
    whitespace collapse canonicalizes them.  Every planted variant must
    land in a dup group with its original."""
    from qctimeseries_spark.datapipe.hashing import hash60, seeded_hash60
    from qctimeseries_spark.datapipe.text import normalize_text

    d = _docs(spark, sf_dir).select("doc_id", "text")
    base = d.select(
        "doc_id", F.concat("text", F.lit(" caf\u00e9")).alias("text")
    )
    sid = F.col("doc_id").cast("string")
    variants = d.filter(seeded_hash60(sid, 36) % 5 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(
            F.upper(F.col("text")), F.lit("  cafe\u0301")
        ).alias("text"),
    )
    norm = normalize_text(base.unionByName(variants))
    return (
        norm.select(
            "doc_id", hash60(F.col("norm_text")).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).alias("n_dups"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")).cast(
                    "array<string>"
                ),
                ",",
            ).alias("ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def q_d12_snapshot_diff(spark, sf_dir):
    """Incremental corpus refresh: added / removed / changed documents
    between two crawl snapshots, via a fingerprint-only full-outer
    join — the text itself never shuffles (~16 bytes move per doc at
    any scale).  Both engines derive the same two snapshots from the
    base table: each drops a seeded-hash 10% of ids, and the new crawl
    re-edits a seeded-hash 20% of its texts."""
    from qctimeseries_spark.datapipe.dedup import snapshot_diff
    from qctimeseries_spark.datapipe.hashing import seeded_hash60

    d = _docs(spark, sf_dir).select("doc_id", "text")
    sid = F.col("doc_id").cast("string")
    old = d.filter(seeded_hash60(sid, 101) % 10 < 9)
    new = d.filter(seeded_hash60(sid, 102) % 10 < 9).select(
        "doc_id",
        F.when(
            seeded_hash60(sid, 103) % 5 == 0,
            F.concat(F.col("text"), F.lit(" rev2")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(old, new)


DATAPIPE_QUERIES = {
    "d1_exact_dedup": q_d1_exact_dedup,
    "d2_minhash_dedup": q_d2_minhash_dedup,
    "d3_simhash_pairs": q_d3_simhash_pairs,
    "d4_ngram_jaccard": q_d4_ngram_jaccard,
    "d14_containment": q_d14_containment,
    "d15_edit_distance": q_d15_edit_distance,
    "d5_embedding_dups": q_d5_embedding_dups,
    "d9_semantic_dedup": q_d9_semantic_dedup,
    "c1_dup_clusters": q_c1_dup_clusters,
    "x1_knn_bruteforce": q_x1_knn_bruteforce,
    "x18_binary_knn": q_x18_binary_knn,
    "x2_knn_ivf": q_x2_knn_ivf,
    "t2_text_stats": q_t2_text_stats,
    "t3_quality": q_t3_quality,
    "t4_lang_id": q_t4_lang_id,
    "t5_fingerprint": q_t5_fingerprint,
    "t6_redact_pii": q_t6_redact_pii,
    "t7_contamination": q_t7_contamination,
    "t8_hash_sample": q_t8_hash_sample,
    "m1_media_summary": q_m1_media_summary,
    "m2_media_features": q_m2_media_features,
    "m3_media_decode": q_m3_media_decode,
    "m4_resize": q_m4_resize,
    "m5_frame_sample": q_m5_frame_sample,
    "m6_phash_dedup": q_m6_phash_dedup,
    "m7_jpeg_dc_phash": q_m7_jpeg_dc_phash,
    "c2_curate": q_c2_curate,
    "t10_token_budget": q_t10_token_budget,
    "t11_split": q_t11_split,
    "t12_bpe_pairs": q_t12_bpe_pairs,
    "t13_mixture": q_t13_mixture,
    "t14_token_shards": q_t14_token_shards,
    "t15_psi": q_t15_psi,
    "d6_incremental_dedup": q_d6_incremental_dedup,
    "d7_incremental_neardup": q_d7_incremental_neardup,
    "t16_bpe_merges": q_t16_bpe_merges,
    "d8_embedding_store": q_d8_embedding_store,
    "t17_tfidf": q_t17_tfidf,
    "t18_unigram_nll": q_t18_unigram_nll,
    "t19_repetition": q_t19_repetition,
    "t20_line_dedup": q_t20_line_dedup,
    "t21_bpe_encode": q_t21_bpe_encode,
    "t22_bigram_nll": q_t22_bigram_nll,
    "t23_span_dedup": q_t23_span_dedup,
    "t24_source_cap": q_t24_source_cap,
    "t26_shuffle_shard": q_t26_shuffle_shard,
    "t27_bm25": q_t27_bm25,
    "d10_cross_neardup": q_d10_cross_neardup,
    "t28_safe_split": q_t28_safe_split,
    "x9_filtered_knn": q_x9_filtered_knn,
    "d11_canonical_keep": q_d11_canonical_keep,
    "x10_cell_sample": q_x10_cell_sample,
    "t25_quality_classifier": q_t25_quality_classifier,
    "x3_knn_persisted": q_x3_knn_persisted,
    "x4_radius_search": q_x4_radius_search,
    "x5_knn_index_append": q_x5_knn_index_append,
    "x6_quantized_knn": q_x6_quantized_knn,
    "x7_pq_knn": q_x7_pq_knn,
    "x8_pq_index": q_x8_pq_index,
    "t29_hybrid_rrf": q_t29_hybrid_rrf,
    "t30_weighted_sample": q_t30_weighted_sample,
    "t31_ngram_novelty": q_t31_ngram_novelty,
    "x11_cell_stats": q_x11_cell_stats,
    "t32_bloom_prune": q_t32_bloom_prune,
    "t33_cms_heavyhitters": q_t33_cms_heavyhitters,
    "t34_hll_distinct": q_t34_hll_distinct,
    "d12_snapshot_diff": q_d12_snapshot_diff,
    "x12_embedding_drift": q_x12_embedding_drift,
    "t35_perplexity_buckets": q_t35_perplexity_buckets,
    "t36_nfc_dedup": q_t36_nfc_dedup,
}


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

_NORM_TEXT = "array_to_string(" + _TOKS.format(c="text") + ", ' ')"

# --- synthetic JPEG mirrors (multimodal.jpeg_dims / jpeg_qdc /
# encode_jpeg_dc): dimensions in 8x8 blocks, per-block quantized DC,
# entropy-coded byte count, and the exact decoded raster string.
# Pixel value = 128 + qdc = 123 - (doc_id + 3b) % 8 — ASCII range by
# construction, so DuckDB strings hold the raw pixel bytes.
_JW8 = "(1 + doc_id % 6)"
_JH8 = "(1 + (doc_id * 7) % 5)"


def _jpeg_q(b: str) -> str:
    return f"(-(5 + (doc_id + 3 * ({b})) % 8))"


def _jpeg_nbytes_sql() -> str:
    """Mirror of the Catalyst jpeg n_bytes fold: fixed header + EOI
    plus ceil(entropy bits / 8); per-block bits = DC code length +
    magnitude bits + 4 (EOB), from the DC diff's size category."""
    ad = (
        f"abs({_jpeg_q('b')} - CASE WHEN b = 0 THEN 0"
        f" ELSE {_jpeg_q('b - 1')} END)"
    )
    return (
        f"{JPEG_DC_OVERHEAD} + (list_sum(list_transform("
        f"range(0, {_JW8} * {_JH8}), b -> 4 + CASE WHEN {ad} = 0 THEN 2"
        f" WHEN {ad} < 2 THEN 4 WHEN {ad} < 4 THEN 5 WHEN {ad} < 8 THEN 6"
        f" ELSE 7 END)) + 7) // 8"
    )


#: the decoded jpeg image as a raster-order string (one char per
#: pixel): each block-row repeats its 8-pixel-wide block spans 8 times
_JPEG_RASTER = (
    f"array_to_string(list_transform(range(0, {_JH8}), br ->"
    f" repeat(array_to_string(list_transform(range(0, {_JW8}), bx ->"
    f" repeat(chr(CAST(123 - (doc_id + 3 * (br * {_JW8} + bx)) % 8"
    f" AS INT)), 8)), ''), 8)), '')"
)

_STATS_SQL = f"""
tk AS (SELECT *, {_TOKS.format(c='text')} AS tkl FROM documents),
st AS (
  SELECT doc_id, lang,
         length(text) AS n_chars_calc,
         CAST(len(tkl) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT)
             AS n_bpe_tokens,
         CAST(len(list_distinct(tkl)) AS INT) AS n_uniq_tokens,
         ROUND(CAST(len(list_distinct(tkl)) AS DOUBLE) / len(tkl), 6) AS uniq_ratio,
         ROUND(CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
               / length(text), 6) AS punct_ratio,
         ROUND(CAST(length(text) - (len(tkl) - 1) AS DOUBLE) / len(tkl), 6)
             AS mean_token_len
  FROM tk
)"""

# quality in exact integer micro-units, mirroring text.quality_score:
# the float-sum formulation lands on true decimal midpoints (0.5 × a
# 6-dp ratio) where engines round apart; every term here is an exact
# integer and the final ÷1e6 is one correctly-rounded division.
_QUALITY_SQL = """CAST(
  (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 400000 ELSE 0 END
   + CASE WHEN CAST(round(uniq_ratio * 1000000) AS BIGINT) >= 800000
          THEN 400000
          ELSE (CAST(round(uniq_ratio * 1000000) AS BIGINT) + 1) // 2 END
   + (1000000 - LEAST(CAST(round(punct_ratio * 1000000) AS BIGINT) * 5,
                      1000000)) // 5
  ) AS DOUBLE) / 1000000.0"""


def _lang_struct(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        "{'hits': CAST(len(list_filter(tkl, t -> list_contains(["
        + words
        + "], t))) AS INT), 'lang': '"
        + lang
        + "'}"
    )


_LANG_SQL = (
    "list_sort(["
    + ", ".join(_lang_struct(lang) for lang in sorted(LANG_STOPWORDS))
    + "], 'DESC')[1]"
)

DATAPIPE_ORACLE = {
    "d1_exact_dedup": f"""
WITH {_EXACT_CORPUS_SQL},
f AS (
  SELECT doc_id, {hash60_sql(_NORM_TEXT)} AS fingerprint FROM corpus
)
SELECT fingerprint, MIN(doc_id) AS keeper, COUNT(*) AS n_dups,
       array_to_string(list_sort(list(doc_id)), ',') AS ids
FROM f GROUP BY fingerprint HAVING COUNT(*) > 1""",
    "d2_minhash_dedup": f"""
WITH {_NEAR_CORPUS_SQL},
{_shingle_sql('corpus', 3)},
{_minhash_sql(15)},
{_band_sql(5, 3)},
{_JACCARD_SQL}
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.6""",
    "d3_simhash_pairs": f"""
WITH {_NEAR_CORPUS_SQL},
tk AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM corpus),
hs AS (
  SELECT doc_id,
         list_transform(list_distinct(tk), t -> {hash60_sql('t')}) AS hv,
         len(list_distinct(tk)) AS n
  FROM tk
),
sim AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 64), i ->
              CASE WHEN 2 * list_sum(list_transform(hv, h -> (h >> i) & 1)) > n
                   THEN CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                             ELSE (CAST(1 AS BIGINT) << CAST(i AS INT)) END
                   ELSE CAST(0 AS BIGINT) END))
              AS BIGINT) AS simhash
  FROM hs
),
ch AS (
  -- 4x16-bit chunks: the PINNED layout of q_d3 (the 8x8 full-recall
  -- rung saturates at ~2k docs; both engines apply the same
  -- pigeonhole, so the best-effort 4..7-hamming tail is identical)
  SELECT doc_id, simhash, chunk, (simhash >> (chunk * 16)) & 65535 AS v
  FROM sim, (SELECT unnest(range(0, 4)) AS chunk) c
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM ch a JOIN ch b
    ON a.chunk = b.chunk AND a.v = b.v AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 7""",
    "c1_dup_clusters": f"""
WITH RECURSIVE {_NEAR_CORPUS_SQL.lstrip()},
{_shingle_sql('corpus', 3)},
{_minhash_sql(15)},
{_band_sql(5, 3)},
{_JACCARD_SQL},
p AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.6),
e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b, id_a FROM p
),
nd AS (SELECT DISTINCT src AS id FROM e),
reach(a, b) AS (
  SELECT id, id FROM nd
  UNION
  SELECT reach.a, e.dst FROM reach JOIN e ON reach.b = e.src
)
SELECT a AS id, MIN(b) AS cluster_id FROM reach GROUP BY a""",
    "d4_ngram_jaccard": f"""
WITH {_NEAR_CORPUS_SQL},
{_shingle_sql('corpus', 3)},
{_minhash_sql(16)},
{_band_sql(4, 4)},
{_JACCARD_SQL}
SELECT id_a, id_b, jaccard FROM j""",
    # d14: the d4 candidate machinery with asymmetric containment
    # scoring — both directions + set sizes per pair
    "d14_containment": f"""
WITH {_NEAR_CORPUS_SQL},
{_shingle_sql('corpus', 3)},
{_minhash_sql(16)},
{_band_sql(4, 4)},
jh AS (
  SELECT doc_id, list_distinct(list_transform(s, x -> {hash60_sql('x')})) AS hs
  FROM sh
),
c AS (
  SELECT cand.id_a, cand.id_b,
         len(list_filter(sa.hs, x -> list_contains(sb.hs, x))) AS inter,
         len(sa.hs) AS n_a, len(sb.hs) AS n_b
  FROM cand
  JOIN jh sa ON sa.doc_id = cand.id_a
  JOIN jh sb ON sb.doc_id = cand.id_b
)
SELECT id_a, id_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(CAST(inter AS DOUBLE) / n_a, 6) AS containment_a,
       ROUND(CAST(inter AS DOUBLE) / n_b, 6) AS containment_b
FROM c""",
    "d15_edit_distance": f"""
WITH {_NEAR_CORPUS_SQL},
{_shingle_sql('corpus', 3)},
{_minhash_sql(16)},
{_band_sql(4, 4)},
t AS (SELECT doc_id, substr(text, 1, 4000) AS t FROM corpus),
c AS (
  SELECT cand.id_a, cand.id_b,
         levenshtein(ta.t, tb.t) AS d,
         length(ta.t) AS n_a, length(tb.t) AS n_b
  FROM cand
  JOIN t ta ON ta.doc_id = cand.id_a
  JOIN t tb ON tb.doc_id = cand.id_b
)
SELECT id_a, id_b, CAST(d AS BIGINT) AS edit_distance,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CASE WHEN GREATEST(n_a, n_b) = 0 THEN 1.0
            ELSE CAST((2 * (GREATEST(n_a, n_b) - d) * 1000000000
                       + GREATEST(n_a, n_b))
                      // (2 * GREATEST(n_a, n_b)) AS DOUBLE)
                 / 1000000000.0 END AS edit_similarity
FROM c""",
    "d5_embedding_dups": f"""
WITH {_EMB_CORPUS_SQL},
u AS (
  SELECT vec_id,
         list_transform(v, x -> x / sqrt(list_reduce(
             list_transform(v, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
             (p, q) -> p + q))) AS u
  FROM corpus
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_reduce(list_transform(range(1, len(a.u) + 1),
                                          i -> a.u[i] * b.u[i]),
                           (p, q) -> p + q), 9) AS cos
  FROM u a JOIN u b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos FROM p WHERE cos >= 0.9""",
    "d9_semantic_dedup": f"""
WITH RECURSIVE {_EMB_CORPUS_SQL.lstrip()},
un AS (
  SELECT vec_id,
         list_transform(v, x -> x / sqrt(list_reduce(
             list_transform(v, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
             (p, q) -> p + q))) AS u
  FROM corpus
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM un a JOIN un b ON a.vec_id < b.vec_id
  WHERE ROUND(list_reduce(list_transform(range(1, len(a.u) + 1),
                                         i -> a.u[i] * b.u[i]),
                          (p, q) -> p + q), 9) >= 0.9
),
e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b, id_a FROM p
),
nd AS (SELECT DISTINCT src AS id FROM e),
reach(a, b) AS (
  SELECT id, id FROM nd
  UNION
  SELECT reach.a, e.dst FROM reach JOIN e ON reach.b = e.src
),
cl AS (SELECT a AS id, MIN(b) AS cluster_id FROM reach GROUP BY a),
keepers AS (SELECT cluster_id, MIN(id) AS keep FROM cl GROUP BY cluster_id),
dropped AS (
  SELECT cl.id FROM cl JOIN keepers USING (cluster_id)
  WHERE cl.id != keepers.keep
)
SELECT vec_id FROM corpus
WHERE vec_id NOT IN (SELECT id FROM dropped)""",
    "x1_knn_bruteforce": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND({_cos_fold_sql('q.qv', 'e.embedding')}, 9) AS cos
  FROM embeddings e, q WHERE e.vec_id != q.query_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rk
  FROM s
)
SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rank
FROM r WHERE rk <= 10""",
    # x18: sign-bit signatures rebuilt in SQL (the d3 LONG_MIN
    # precedent for bit 63; CAST list_sum — DuckDB sums BIGINT into
    # HUGEINT), Hamming candidates via xor+bit_count, exact-cosine
    # rerank with the shared fold.  64-dim corpus => ONE signature
    # word, mirroring the engine's packed array exactly.
    "x18_binary_knn": f"""
WITH sig AS (
  SELECT vec_id, embedding,
         CAST(list_sum(list_transform(range(0, 64), i ->
           CASE WHEN embedding[i + 1] >= 0
                THEN CASE WHEN i = 63
                          THEN CAST(-9223372036854775808 AS BIGINT)
                          ELSE (CAST(1 AS BIGINT) << CAST(i AS INT)) END
                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS b
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, b AS qb
  FROM sig WHERE vec_id < 5
),
h AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         CAST(bit_count(xor(s.b, q.qb)) AS INT) AS hamming
  FROM sig s, q WHERE s.vec_id != q.query_id
),
cand AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY hamming, neighbor_id) AS crk
  FROM h
),
resc AS (
  SELECT c.query_id, c.neighbor_id, c.hamming,
         ROUND({_cos_fold_sql('q.qv', 'e.embedding')}, 9) AS cos
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN embeddings e ON e.vec_id = c.neighbor_id
  WHERE c.crk <= 40
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rk
  FROM resc
)
SELECT query_id, neighbor_id, hamming, cos, CAST(rk AS INT) AS rank
FROM r WHERE rk <= 10""",
    # IVF is approximate vs brute force but DETERMINISTIC end-to-end
    # (seeded centroids, 9-dp rounding, id tie-breaks), so the whole
    # index build + probe + rank is oracle-expressible.
    "x2_knn_ivf": f"""
WITH cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
         embedding AS centv
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
ccell AS (
  SELECT e.vec_id, e.embedding, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
),
qcell AS (
  SELECT e.vec_id AS query_id, e.embedding AS qv, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
  WHERE e.vec_id < 5
),
s AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
         ROUND({_cos_fold_sql('q.qv', 'c.embedding')}, 9) AS cos
  FROM (SELECT * FROM ccell WHERE rk = 1) c
  JOIN (SELECT * FROM qcell WHERE rk <= 4) q USING (cid)
  WHERE c.vec_id != q.query_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rk
  FROM s
)
SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rank
FROM r WHERE rk <= 10""",
    "t2_text_stats": f"""
WITH {_STATS_SQL}
SELECT doc_id, n_chars_calc, n_tokens, n_bpe_tokens, n_uniq_tokens,
       uniq_ratio, punct_ratio, mean_token_len
FROM st""",
    "t3_quality": f"""
WITH {_STATS_SQL}
SELECT doc_id, {_QUALITY_SQL} AS quality
FROM st""",
    "t4_lang_id": f"""
WITH tk AS (SELECT *, {_TOKS.format(c='text')} AS tkl FROM documents),
best AS (SELECT doc_id, lang, {_LANG_SQL} AS b FROM tk)
SELECT doc_id, lang, b.lang AS lang_pred, b.hits AS lang_hits FROM best""",
    "t5_fingerprint": f"""
SELECT doc_id, {hash60_sql(_NORM_TEXT)} AS fingerprint FROM documents""",
    "t6_redact_pii": (
        """
WITH pii AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
           concat('contact user', CAST(doc_id AS VARCHAR),
                  '@mail.example.com or 10.0.',
                  CAST(doc_id % 256 AS VARCHAR), '.1 ring +1555',
                  CAST(doc_id AS VARCHAR), '0199 ', text)
         ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text, '"""
        + PII_PATTERNS["email"]
        + """', '[PII]', 'g'), '"""
        + PII_PATTERNS["ipv4"]
        + """', '[PII]', 'g'), '"""
        + PII_PATTERNS["phone"]
        + """', '[PII]', 'g') AS text_redacted,
       CAST(len(regexp_extract_all(text, '"""
        + PII_PATTERNS["email"]
        + """')) + len(regexp_extract_all(text, '"""
        + PII_PATTERNS["ipv4"]
        + """')) + len(regexp_extract_all(text, '"""
        + PII_PATTERNS["phone"]
        + """')) AS INT) AS n_pii
FROM pii"""
    ),
    "t7_contamination": (
        """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, concat('leaked copy ', text) AS text
  FROM documents WHERE doc_id % 50 = 0
),
bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
ctk AS (SELECT doc_id, """
        + _TOKS.format(c="text")
        + """ AS tk FROM corpus),
cdh AS (SELECT doc_id, unnest("""
        + _sh_hashed("tk", 8)
        + """) AS h FROM ctk),
btk AS (SELECT """
        + _TOKS.format(c="text")
        + """ AS tk FROM bench),
bdh AS (SELECT DISTINCT unnest("""
        + _sh_hashed("tk", 8)
        + """) AS h FROM btk)
SELECT cdh.doc_id, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_shared_ngrams
FROM cdh JOIN bdh USING (h)
WHERE cdh.doc_id NOT IN (SELECT doc_id FROM bench)
GROUP BY cdh.doc_id"""
    ),
    "t8_hash_sample": f"""
SELECT doc_id, lang FROM documents
WHERE {hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")} % 1000000 <
      CASE WHEN lang = 'en' THEN 300000
           WHEN lang = 'zh' THEN 800000
           ELSE 500000 END""",
    "t11_split": f"""
SELECT doc_id, lang,
       CASE WHEN {hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")}
                 % 1000000 < 800000 THEN 'train'
            WHEN {hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")}
                 % 1000000 < 900000 THEN 'val'
            WHEN {hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")}
                 % 1000000 < 1000000 THEN 'test'
       END AS split
FROM documents""",
    "t10_token_budget": f"""
WITH tkc AS (
  SELECT doc_id, lang,
         CAST(len({_TOKS.format(c='text')}) AS INT) AS n_tokens,
         {hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")} % 1000000
             AS bucket
  FROM documents
),
c AS (
  SELECT *, SUM(CAST(n_tokens AS BIGINT))
                OVER (ORDER BY bucket, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM tkc
)
SELECT doc_id, lang, n_tokens FROM c WHERE cum <= 6000""",
    "c2_curate": (
        f"""
WITH corpus AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, lang,
         replace(upper(text), ' ', '  ') AS text
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, lang,
         concat('leaked copy ', text) AS text
  FROM documents WHERE doc_id % 50 = 0
),
f AS (
  SELECT doc_id, lang, text, {hash60_sql(_NORM_TEXT)} AS fingerprint
  FROM corpus
),
k AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint
                               ORDER BY doc_id) AS rn
  FROM f
),
kept AS (SELECT doc_id, lang, text, fingerprint FROM k WHERE rn = 1),
btk AS (SELECT """
        + _TOKS.format(c="text")
        + """ AS tk FROM documents WHERE doc_id % 50 = 0),
bdh AS (SELECT DISTINCT unnest("""
        + _sh_hashed("tk", 8)
        + """) AS h FROM btk),
ctk AS (SELECT doc_id, """
        + _TOKS.format(c="text")
        + """ AS tk FROM kept),
cdh AS (SELECT doc_id, unnest("""
        + _sh_hashed("tk", 8)
        + f""") AS h FROM ctk),
bad AS (
  SELECT cdh.doc_id, COUNT(DISTINCT h) AS ns
  FROM cdh JOIN bdh USING (h) GROUP BY cdh.doc_id
),
clean AS (
  SELECT * FROM kept
  WHERE doc_id NOT IN (SELECT doc_id FROM bad WHERE ns >= 1)
),
tk2 AS (SELECT *, {_TOKS.format(c='text')} AS tkl FROM clean),
st AS (
  SELECT doc_id, lang, fingerprint,
         CAST(len(tkl) AS INT) AS n_tokens,
         ROUND(CAST(len(list_distinct(tkl)) AS DOUBLE) / len(tkl), 6)
             AS uniq_ratio,
         ROUND(CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
               / length(text), 6) AS punct_ratio
  FROM tk2
),
q AS (
  SELECT doc_id, lang, fingerprint, n_tokens,
         {_QUALITY_SQL} AS quality
  FROM st
)
SELECT doc_id, lang, fingerprint, n_tokens, quality
FROM q
WHERE quality >= 0.5
  AND {hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")} % 1000000
      < 500000"""
    ),
    # The container framing overheads (57/27/44/525) and the
    # width/height/rate/duration formulas mirror multimodal.build_payload;
    # the Spark side recovers them by parsing actual container bytes.
    "m1_media_summary": f"""
WITH m AS (
  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         ELSE 'video' END AS modality,
         CASE
           WHEN doc_id % 6 = 0 THEN strlen(text) + 57 + 6 + 5 * greatest(1,
                (strlen(text) + 65534) // 65535)
           WHEN doc_id % 6 = 3 THEN {_jpeg_nbytes_sql()}
           WHEN doc_id % 3 = 1 THEN strlen(text) + 44
           ELSE strlen(text) + 525 END AS nb
  FROM documents
)
SELECT modality, COUNT(*) AS n_items,
       CAST(SUM(nb) AS BIGINT) AS total_bytes,
       CAST(MAX(nb) AS BIGINT) AS max_bytes
FROM m GROUP BY modality""",
    # m2: jpeg rows mirror the REAL DC-tier codec — dims from the 8x8
    # block wheel, n_bytes from the entropy-coded length, and features
    # over the exact decoded pixel raster (rebuilt as an ASCII string)
    "m2_media_features": f"""
WITH m AS (
  SELECT doc_id, text, strlen(text) AS L,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CASE WHEN doc_id % 6 = 0 THEN 'png' WHEN doc_id % 6 = 3 THEN 'jpeg'
              WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS fmt,
         [8000, 16000, 22050, 44100, 48000][CAST(doc_id % 5 AS INT) + 1]
             AS rate,
         1 + doc_id % 2 AS ch
  FROM documents
),
c AS (
  SELECT *, CASE WHEN fmt = 'jpeg' THEN {_JPEG_RASTER}
                 ELSE text END AS content
  FROM m
)
SELECT doc_id AS media_id, modality, fmt,
       CAST(CASE fmt
                WHEN 'png' THEN L + 57 + 6 + 5 * greatest(1,
                     (L + 65534) // 65535)
                WHEN 'jpeg' THEN {_jpeg_nbytes_sql()}
                WHEN 'wav' THEN L + 44 ELSE L + 525 END AS BIGINT)
           AS n_bytes,
       TRUE AS valid,
       CASE WHEN fmt = 'png' THEN CAST(16 + doc_id % 2033 AS INT)
            WHEN fmt = 'jpeg' THEN CAST(8 * {_JW8} AS INT) END AS width,
       CASE WHEN fmt = 'png' THEN CAST(16 + (doc_id * 7) % 1777 AS INT)
            WHEN fmt = 'jpeg' THEN CAST(8 * {_JH8} AS INT) END AS height,
       CASE WHEN fmt IN ('wav', 'mp4') THEN CAST(rate AS INT)
            END AS sample_rate,
       CASE WHEN fmt = 'wav' THEN CAST(L AS DOUBLE) / (rate * ch * 2)
            WHEN fmt = 'mp4'
            THEN CAST(60 + (doc_id * 97) % 360000 AS DOUBLE) / 600
       END AS duration_s,
       CAST(16 AS INT) AS feature_dim,
       array_to_string(list_transform(range(0, 16),
           i -> CAST(CAST(concat('0x', substr(md5(concat(content, '0')),
                                              2 * i + 1, 2)) AS INT)
                     AS VARCHAR)), ',')
           AS features_u8
FROM c""",
    # m3: the decode oracle expands the document's UTF-8 bytes from the
    # hex rendering of the blob (one INT per byte), then reproduces the
    # PNG pixel-byte stats and the signed PCM16 sample stats (WAV
    # little-endian, MP4 twos big-endian) arithmetically.  Integer sums are exact in BIGINT and the
    # mean/rms doubles are single correctly-rounded ops, so the value
    # hash is bit-comparable with the Spark side's real inflate/unpack.
    # m4: the 2x2 box-average is mirrored arithmetically — png over the
    # width-wrapped document bytes (ragged tail boxes average only the
    # bytes that exist), jpeg in closed form (a 2x2 box never crosses an
    # 8x8 block, so each output pixel IS the block's decoded DC value
    # 123 - (doc_id + 3b) % 8 and each block contributes 16 of them)
    "m4_resize": f"""
WITH m AS (
  SELECT doc_id, text, strlen(text) AS L,
         CASE WHEN doc_id % 6 = 0 THEN 'png' WHEN doc_id % 6 = 3 THEN 'jpeg'
              WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS fmt
  FROM documents
),
png AS (
  SELECT doc_id, fmt, L,
         16 + doc_id % 2033 AS W,
         (L + (16 + doc_id % 2033) - 1) // (16 + doc_id % 2033) AS H,
         list_transform(range(0, CAST(L AS INT)),
           i -> CAST(concat('0x', substr(hex(encode(text)), 2 * i + 1, 2))
                     AS INT)) AS bytes
  FROM m WHERE fmt = 'png'
),
pngpx AS (
  SELECT doc_id, fmt, W, H, (W + 1) // 2 AS oW, (H + 1) // 2 AS oH,
         list_transform(range(0, CAST(((W + 1) // 2) * ((H + 1) // 2) AS INT)),
           bi -> list_filter(
             [CASE WHEN 2 * (bi % ((W + 1) // 2)) < W
                    AND (2 * (bi // ((W + 1) // 2))) * W
                        + 2 * (bi % ((W + 1) // 2)) < L
                   THEN bytes[(2 * (bi // ((W + 1) // 2))) * W
                              + 2 * (bi % ((W + 1) // 2)) + 1] END,
              CASE WHEN 2 * (bi % ((W + 1) // 2)) + 1 < W
                    AND (2 * (bi // ((W + 1) // 2))) * W
                        + 2 * (bi % ((W + 1) // 2)) + 1 < L
                   THEN bytes[(2 * (bi // ((W + 1) // 2))) * W
                              + 2 * (bi % ((W + 1) // 2)) + 2] END,
              CASE WHEN 2 * (bi % ((W + 1) // 2)) < W
                    AND (2 * (bi // ((W + 1) // 2)) + 1) * W
                        + 2 * (bi % ((W + 1) // 2)) < L
                   THEN bytes[(2 * (bi // ((W + 1) // 2)) + 1) * W
                              + 2 * (bi % ((W + 1) // 2)) + 1] END,
              CASE WHEN 2 * (bi % ((W + 1) // 2)) + 1 < W
                    AND (2 * (bi // ((W + 1) // 2)) + 1) * W
                        + 2 * (bi % ((W + 1) // 2)) + 1 < L
                   THEN bytes[(2 * (bi // ((W + 1) // 2)) + 1) * W
                              + 2 * (bi % ((W + 1) // 2)) + 2] END],
             x -> x IS NOT NULL)) AS boxes
  FROM png
),
pngagg AS (
  SELECT doc_id, fmt, W AS in_w, H AS in_h, oW AS out_w, oH AS out_h,
         len(boxes) AS n_px,
         list_sum(list_transform(boxes,
           b -> CASE WHEN len(b) > 0 THEN list_sum(b) // len(b)
                     ELSE 0 END)) AS sum_px
  FROM pngpx
),
jpgagg AS (
  SELECT doc_id, fmt,
         8 * {_JW8} AS in_w, 8 * {_JH8} AS in_h,
         4 * {_JW8} AS out_w, 4 * {_JH8} AS out_h,
         16 * {_JW8} * {_JH8} AS n_px,
         16 * list_sum(list_transform(range(0, {_JW8} * {_JH8}),
               b -> 123 - (doc_id + 3 * b) % 8)) AS sum_px
  FROM m WHERE fmt = 'jpeg'
)
SELECT doc_id AS media_id, fmt, TRUE AS resized,
       CAST(in_w AS BIGINT) AS in_w, CAST(in_h AS BIGINT) AS in_h,
       CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
       CAST(n_px AS BIGINT) AS n_px,
       CAST(CASE WHEN n_px > 0 THEN sum_px END AS BIGINT) AS sum_px,
       CASE WHEN n_px > 0 THEN CAST(sum_px AS DOUBLE) / n_px END AS mean_px
FROM (SELECT * FROM pngagg UNION ALL SELECT * FROM jpgagg)
UNION ALL
SELECT doc_id, fmt, FALSE, NULL, NULL, NULL, NULL, NULL, NULL, NULL
FROM m WHERE fmt IN ('wav', 'mp4')""",
    # m5: every-4th-frame sampling mirrored by list positions 4k+1 over
    # the byte-derived PCM sample list (wav little-endian, mp4 twos
    # big-endian); png/jpeg have no time axis
    "m5_frame_sample": f"""
WITH m AS (
  SELECT doc_id, text, strlen(text) AS L,
         CASE WHEN doc_id % 6 = 0 THEN 'png' WHEN doc_id % 6 = 3 THEN 'jpeg'
              WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS fmt
  FROM documents
),
b AS (
  SELECT doc_id, fmt, L,
         list_transform(range(0, CAST(L AS INT)),
           i -> CAST(concat('0x', substr(hex(encode(text)), 2 * i + 1, 2))
                     AS INT)) AS bytes
  FROM m WHERE fmt IN ('wav', 'mp4')
),
s AS (
  SELECT doc_id, fmt, L // 2 AS n,
         CASE WHEN fmt = 'wav' THEN
           list_transform(range(0, CAST(L // 2 AS INT)),
             k -> CASE WHEN bytes[2 * k + 2] >= 128
                       THEN bytes[2 * k + 1] + 256 * bytes[2 * k + 2] - 65536
                       ELSE bytes[2 * k + 1] + 256 * bytes[2 * k + 2] END)
         ELSE
           list_transform(range(0, CAST(L // 2 AS INT)),
             k -> CASE WHEN bytes[2 * k + 1] >= 128
                       THEN 256 * bytes[2 * k + 1] + bytes[2 * k + 2] - 65536
                       ELSE 256 * bytes[2 * k + 1] + bytes[2 * k + 2] END)
         END AS samples
  FROM b
),
f AS (
  SELECT doc_id, fmt, n,
         list_transform(range(0, CAST((n + 3) // 4 AS INT)),
           k -> samples[4 * k + 1]) AS fr
  FROM s
)
SELECT doc_id AS media_id, fmt, TRUE AS sampled,
       CAST(n AS BIGINT) AS n_frames,
       CAST(len(fr) AS BIGINT) AS n_sampled,
       CAST(CASE WHEN len(fr) > 0 THEN list_sum(fr) END AS BIGINT)
           AS sum_sampled,
       CASE WHEN len(fr) > 0 THEN CAST(list_sum(fr) AS DOUBLE) / len(fr)
            END AS mean_sampled,
       CASE WHEN len(fr) > 0 THEN
            sqrt(CAST(list_sum(list_transform(fr, x -> x * x)) AS DOUBLE)
                 / len(fr)) END AS rms_sampled
FROM f
UNION ALL
SELECT doc_id, fmt, FALSE, NULL, NULL, NULL, NULL, NULL
FROM m WHERE fmt IN ('png', 'jpeg')""",
    "m3_media_decode": f"""
WITH m AS (
  SELECT doc_id, text, strlen(text) AS L,
         CASE WHEN doc_id % 6 = 0 THEN 'png' WHEN doc_id % 6 = 3 THEN 'jpeg'
              WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END AS fmt
  FROM documents
),
b AS (
  SELECT doc_id, fmt, L,
         list_transform(range(0, CAST(L AS INT)),
           i -> CAST(concat('0x', substr(hex(encode(text)), 2 * i + 1, 2))
                     AS INT)) AS bytes
  FROM m
),
s AS (
  SELECT doc_id, fmt, L, bytes,
         CASE WHEN fmt = 'wav' THEN
           list_transform(range(0, CAST(L // 2 AS INT)),
             k -> CASE WHEN bytes[2 * k + 2] >= 128
                       THEN bytes[2 * k + 1] + 256 * bytes[2 * k + 2] - 65536
                       ELSE bytes[2 * k + 1] + 256 * bytes[2 * k + 2] END)
              WHEN fmt = 'mp4' THEN
           -- twos PCM16 is BIG-endian: first byte is the sign byte
           list_transform(range(0, CAST(L // 2 AS INT)),
             k -> CASE WHEN bytes[2 * k + 1] >= 128
                       THEN 256 * bytes[2 * k + 1] + bytes[2 * k + 2] - 65536
                       ELSE 256 * bytes[2 * k + 1] + bytes[2 * k + 2] END)
         END AS samples
  FROM b
),
u AS (
  SELECT doc_id, fmt,
         fmt IN ('png', 'wav', 'jpeg', 'mp4') AS decoded,
         CASE WHEN fmt = 'png' THEN L
              WHEN fmt IN ('wav', 'mp4') THEN L // 2
              WHEN fmt = 'jpeg' THEN 64 * {_JW8} * {_JH8} END AS n_units,
         CASE WHEN fmt = 'png' THEN list_sum(bytes)
              WHEN fmt IN ('wav', 'mp4') THEN list_sum(samples)
              WHEN fmt = 'jpeg' THEN list_sum(list_transform(
                   range(0, {_JW8} * {_JH8}),
                   b -> 64 * (123 - (doc_id + 3 * b) % 8))) END AS su,
         CASE WHEN fmt = 'png'
              THEN list_sum(list_transform(bytes, x -> x * x))
              WHEN fmt IN ('wav', 'mp4')
              THEN list_sum(list_transform(samples, x -> x * x))
              WHEN fmt = 'jpeg' THEN list_sum(list_transform(
                   range(0, {_JW8} * {_JH8}),
                   b -> 64 * (123 - (doc_id + 3 * b) % 8)
                        * (123 - (doc_id + 3 * b) % 8))) END AS sq
  FROM s
)
SELECT doc_id AS media_id, fmt, decoded,
       CAST(n_units AS BIGINT) AS n_units,
       CAST(CASE WHEN n_units > 0 THEN su END AS BIGINT) AS sum_units,
       CASE WHEN n_units > 0 THEN CAST(su AS DOUBLE) / n_units
            END AS mean_unit,
       CASE WHEN n_units > 0 THEN sqrt(CAST(sq AS DOUBLE) / n_units)
            END AS rms_unit
FROM u""",
    # m6: decode + aHash replayed arithmetically — PNG units are the
    # document bytes (hex-pair expansion), WAV little-endian and MP4
    # big-endian PCM16 pairs; signature bit j set when unit_j*n > Σ
    # over the first-48-unit window (cross-multiplied, no float);
    # empty windows coalesce to signature 0 on both engines
    "m6_phash_dedup": """
WITH m AS (
  SELECT doc_id, text, strlen(text) AS L,
         CASE WHEN doc_id % 6 = 0 THEN 'png'
              WHEN doc_id % 3 = 1 THEN 'wav'
              ELSE 'mp4' END AS fmt
  FROM documents WHERE doc_id % 6 != 3
),
b AS (
  SELECT doc_id, fmt, L,
         list_transform(range(0, CAST(L AS INT)),
           i -> CAST(concat('0x', substr(hex(encode(text)), 2 * i + 1, 2))
                     AS INT)) AS bytes
  FROM m
),
s AS (
  SELECT doc_id, fmt,
         CASE WHEN fmt = 'png' THEN bytes
              WHEN fmt = 'wav' THEN
           list_transform(range(0, CAST(L // 2 AS INT)),
             k -> CASE WHEN bytes[2 * k + 2] >= 128
                       THEN bytes[2 * k + 1] + 256 * bytes[2 * k + 2] - 65536
                       ELSE bytes[2 * k + 1] + 256 * bytes[2 * k + 2] END)
              ELSE
           list_transform(range(0, CAST(L // 2 AS INT)),
             k -> CASE WHEN bytes[2 * k + 1] >= 128
                       THEN 256 * bytes[2 * k + 1] + bytes[2 * k + 2] - 65536
                       ELSE 256 * bytes[2 * k + 1] + bytes[2 * k + 2] END)
         END AS units
  FROM b
),
w AS (
  SELECT doc_id, fmt, units[1:48] AS win,
         len(units[1:48]) AS n,
         COALESCE(list_sum(units[1:48]), 0) AS tot
  FROM s
),
sig AS (
  SELECT doc_id, fmt,
         COALESCE(list_sum(list_transform(range(0, CAST(n AS INT)),
           j -> CASE WHEN win[j + 1] * n > tot
                     THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)), 0)
           AS signature
  FROM w
)
SELECT fmt, CAST(signature AS BIGINT) AS signature,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       MIN(doc_id) AS keeper
FROM sig GROUP BY fmt, signature""",
    # m7: the quantized-DC wheel (jpeg_qdc: -(5 + (id + 3b) % 8) over
    # nb = (w/8)*(h/8) blocks, dims from jpeg_dims) rebuilt
    # arithmetically; signature = mean-rule bits over the first 48
    # blocks, cross-multiplied exactly like the engine
    "m7_jpeg_dc_phash": """
WITH j AS (
  SELECT doc_id,
         (1 + doc_id % 6) * (1 + (doc_id * 7) % 5) AS nb
  FROM documents WHERE doc_id % 6 = 3
),
g AS (
  SELECT doc_id,
         list_transform(range(0, CAST(LEAST(nb, 48) AS INT)),
           b -> -(5 + (doc_id + 3 * b) % 8)) AS win
  FROM j
),
w AS (
  SELECT doc_id, win, len(win) AS n,
         COALESCE(list_sum(win), 0) AS tot
  FROM g
),
sig AS (
  SELECT doc_id,
         COALESCE(list_sum(list_transform(range(0, CAST(n AS INT)),
           k -> CASE WHEN win[k + 1] * n > tot
                     THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)), 0)
           AS signature
  FROM w
)
SELECT 'jpeg' AS fmt, CAST(signature AS BIGINT) AS signature,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       MIN(doc_id) AS keeper
FROM sig GROUP BY signature""",
    "t12_bpe_pairs": f"""
WITH w AS (
  SELECT unnest({_TOKS.format(c='text')}) AS w FROM documents
),
wc AS (SELECT w, COUNT(*) AS n FROM w GROUP BY w),
p AS (
  SELECT unnest(list_transform(range(1, CAST(length(w) AS INT)),
                               i -> substr(w, i, 2))) AS pair,
         n
  FROM wc
)
SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
FROM p GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT 40""",
    "t13_mixture": f"""
WITH tk AS (
  SELECT lang, CAST(len({_TOKS.format(c='text')}) AS BIGINT) AS n
  FROM documents
),
g AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens FROM tk GROUP BY lang),
tgt AS (
  SELECT * FROM (VALUES {', '.join(
      f"('{k}', {v / sum(_MIX_TARGETS.values())!r})"
      for k, v in _MIX_TARGETS.items()
  )}) t(lang, target_share)
),
j AS (
  SELECT g.lang, n_tokens, COALESCE(target_share, 0.0) AS target_share
  FROM g LEFT JOIN tgt USING (lang)
),
s AS (
  SELECT SUM(n_tokens) AS _total,
         MIN(CASE WHEN target_share > 0
                  THEN n_tokens / target_share END) AS _T
  FROM j
)
SELECT lang, n_tokens,
       ROUND(n_tokens / _total, 9) AS share,
       target_share,
       ROUND(LEAST(1.0, target_share * _T / n_tokens), 9) AS keep_frac
FROM j, s""",
    "t14_token_shards": f"""
WITH tkc AS (
  SELECT doc_id,
         CAST(len({_TOKS.format(c='text')}) AS INT) AS n_tokens,
         {hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")} % 1000000
             AS bucket
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(CAST(n_tokens AS BIGINT))
                    OVER (ORDER BY bucket, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cume
  FROM tkc
)
SELECT doc_id, n_tokens, CAST(cume // 2000 AS BIGINT) AS shard_id
FROM c""",
    # t15: shares are exact integer-count ratios; psi uses the UNROUNDED
    # shares with the 1e-6 floor, mirroring monitor.population_stability
    # term-for-term ((p - q) * ln(p / q), then one 6-dp round)
    "t15_psi": f"""
WITH d AS (
  SELECT doc_id, CAST(len({_TOKS.format(c='text')}) AS INT) AS n
  FROM documents
),
cb AS (
  SELECT CASE WHEN n < 20 THEN 0 WHEN n < 40 THEN 1 WHEN n < 60 THEN 2
              WHEN n < 80 THEN 3 WHEN n < 100 THEN 4 ELSE 5 END AS bucket
  FROM d WHERE doc_id % 2 = 0
),
rb AS (
  SELECT CASE WHEN n < 20 THEN 0 WHEN n < 40 THEN 1 WHEN n < 60 THEN 2
              WHEN n < 80 THEN 3 WHEN n < 100 THEN 4 ELSE 5 END AS bucket
  FROM d WHERE doc_id % 2 = 1
),
cs AS (
  SELECT bucket, CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM cb) AS s
  FROM cb GROUP BY bucket
),
rs AS (
  SELECT bucket, CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM rb) AS s
  FROM rb GROUP BY bucket
),
b AS (SELECT unnest(range(0, 6)) AS bucket)
SELECT CAST(b.bucket AS INT) AS bucket,
       ROUND(COALESCE(cs.s, 0.0), 6) AS share_cur,
       ROUND(COALESCE(rs.s, 0.0), 6) AS share_ref,
       ROUND((GREATEST(COALESCE(cs.s, 0.0), 1e-06)
              - GREATEST(COALESCE(rs.s, 0.0), 1e-06))
             * ln(GREATEST(COALESCE(cs.s, 0.0), 1e-06)
                  / GREATEST(COALESCE(rs.s, 0.0), 1e-06)), 6) AS psi
FROM b LEFT JOIN cs ON b.bucket = cs.bucket
       LEFT JOIN rs ON b.bucket = rs.bucket""",
    "d6_incremental_dedup": f"""
WITH fp AS (
  SELECT doc_id, {hash60_sql(_NORM_TEXT)} AS fingerprint FROM documents
),
even AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 2 = 0),
b2 AS (
  SELECT doc_id, fingerprint FROM fp WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, fingerprint FROM fp
  WHERE doc_id % 2 = 1 AND doc_id % 10 = 1
),
fresh AS (
  SELECT * FROM b2
  WHERE fingerprint NOT IN (SELECT fingerprint FROM even)
)
SELECT MIN(doc_id) AS doc_id, fingerprint
FROM fresh GROUP BY fingerprint""",
    # d7: same MinHash family / banding / verification as the Spark
    # operator, so both engines make identical (deterministic) LSH
    # decisions — the oracle checks the SAME set algebra, not ground
    # truth similarity
    "d7_incremental_neardup": f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         concat(text, ' crawled mirror banner') AS text
  FROM documents WHERE doc_id % 6 = 0
),
{_shingle_sql('corpus', 3)},
{_minhash_sql(15)},
{_band_eb_sql(5, 3)},
jh AS (
  SELECT doc_id, list_distinct(list_transform(s, x -> {hash60_sql('x')})) AS hs
  FROM sh
),
fp AS (
  SELECT doc_id, {hash60_sql(_NORM_TEXT)} AS fingerprint FROM corpus
),
seed AS (
  SELECT MIN(doc_id) AS doc_id, fingerprint FROM fp
  WHERE doc_id % 2 = 0 AND doc_id < 1000000 GROUP BY fingerprint
),
b2 AS (
  SELECT doc_id, fingerprint FROM fp
  WHERE (doc_id % 2 = 1 AND doc_id < 1000000) OR doc_id >= 1000000
),
x1 AS (
  SELECT * FROM b2 WHERE fingerprint NOT IN (SELECT fingerprint FROM seed)
),
ncand AS (
  SELECT DISTINCT n.doc_id AS id_new, s.doc_id AS id_old
  FROM eb n JOIN eb s ON n.band = s.band AND n.h = s.h
  WHERE n.doc_id IN (SELECT doc_id FROM x1)
    AND s.doc_id IN (SELECT doc_id FROM seed)
),
nver AS (
  SELECT DISTINCT ncand.id_new
  FROM ncand
  JOIN jh a ON a.doc_id = ncand.id_new
  JOIN jh b ON b.doc_id = ncand.id_old
  WHERE ROUND(CAST(len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS DOUBLE)
              / len(list_distinct(list_concat(a.hs, b.hs))), 6) >= 0.6
),
x2 AS (
  SELECT * FROM x1 WHERE doc_id NOT IN (SELECT id_new FROM nver)
)
SELECT MIN(doc_id) AS doc_id, fingerprint FROM x2 GROUP BY fingerprint""",
    "t16_bpe_merges": _bpe_merges_sql(10),
    # d8: the oracle replicates the EXACT Spark float path — unit
    # vectors first (each element one divide by the left-fold norm),
    # then a left-fold dot of the unit elements, rounded to 9 dp before
    # the max/threshold — so all 125k batch×store cosines are
    # bit-identical, not merely close (dot/(na*nb) would differ in the
    # last ulp often enough to flip a 9-dp rounding somewhere)
    "d8_embedding_store": f"""
WITH {_EMB_CORPUS_SQL},
un AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(x AS DOUBLE) /
           sqrt(list_reduce(list_transform(v, y -> CAST(y AS DOUBLE)
                                                   * CAST(y AS DOUBLE)),
                            (p, q) -> p + q))) AS u
  FROM corpus
),
store AS (
  SELECT vec_id, u FROM un WHERE vec_id % 2 = 0 AND vec_id < 1000000
),
batch AS (
  SELECT vec_id, u FROM un
  WHERE (vec_id % 2 = 1 AND vec_id < 1000000) OR vec_id >= 1000000
),
sc AS (
  SELECT b.vec_id,
         MAX(ROUND(list_reduce(
               list_transform(range(1, len(b.u) + 1), i -> b.u[i] * s.u[i]),
               (p, q) -> p + q), 9)) AS max_store_cos
  FROM batch b, store s GROUP BY b.vec_id
)
SELECT vec_id, max_store_cos FROM sc WHERE max_store_cos < 0.9""",
    "t17_tfidf": f"""
WITH tk AS (
  SELECT doc_id, unnest({_TOKS.format(c='text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tk GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
s AS (
  SELECT doc_id, term, tf, df, ROUND(tf * ln(n.n / df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term), n
),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, term) AS INT) AS rk
  FROM s
)
SELECT doc_id, term, tf, df, tfidf, rk FROM r WHERE rk <= 5""",
    "t18_unigram_nll": f"""
WITH tk AS (
  SELECT doc_id, unnest({_TOKS.format(c='text')}) AS term FROM documents
),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY term),
tv AS (
  SELECT CAST(SUM(c) + COUNT(*) AS DOUBLE) AS denom FROM c
),
m AS (
  SELECT tk.doc_id,
         CAST(FLOOR(-ln((c.c + 1.0) / tv.denom) * 1000000 + 0.5)
              AS BIGINT) AS m
  FROM tk JOIN c USING (term), tv
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(m) AS BIGINT) AS nll_micro,
       ROUND(SUM(m) / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6) AS avg_nll
FROM m GROUP BY doc_id""",
    "t19_repetition": f"""
WITH tk AS (
  SELECT doc_id, {_TOKS.format(c='text')} AS tkl FROM documents
),
g AS (
  SELECT doc_id, CAST(len(tkl) AS INT) AS n_tokens,
         CASE WHEN len(tkl) >= 2 THEN list_transform(range(0, len(tkl) - 1),
              i -> array_to_string(list_slice(tkl, i + 1, i + 2), ' '))
              ELSE [] END AS g2,
         CASE WHEN len(tkl) >= 3 THEN list_transform(range(0, len(tkl) - 2),
              i -> array_to_string(list_slice(tkl, i + 1, i + 3), ' '))
              ELSE [] END AS g3
  FROM tk
),
r AS (
  SELECT doc_id, n_tokens,
         CASE WHEN len(g2) > 0 THEN ROUND(1.0 -
              CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
              ELSE 0.0 END AS dup_bigram_ratio,
         CASE WHEN len(g3) > 0 THEN ROUND(1.0 -
              CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6)
              ELSE 0.0 END AS dup_trigram_ratio
  FROM g
),
c AS (
  SELECT doc_id, term, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(tkl) AS term FROM tk) GROUP BY doc_id, term
),
t AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top FROM c GROUP BY doc_id)
SELECT r.doc_id, n_tokens, dup_bigram_ratio, dup_trigram_ratio,
       CASE WHEN n_tokens > 0
            THEN ROUND(CAST(COALESCE(top, 0) AS DOUBLE) / n_tokens, 6)
            ELSE 0.0 END AS top_word_share
FROM r LEFT JOIN t ON r.doc_id = t.doc_id""",
    # t20: identical split/count/filter/reassemble algebra; parallel
    # unnest zips (line, pos) so reassembly order is pinned
    "t20_line_dedup": """
WITH src AS (
  SELECT doc_id,
         concat(text, chr(10), 'subscribe banner ',
                CAST(doc_id % 7 AS VARCHAR), chr(10),
                'unique tail ', CAST(doc_id AS VARCHAR)) AS text
  FROM documents
),
ls AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM src),
l AS (
  SELECT doc_id, unnest(lines) AS line,
         unnest(range(1, len(lines) + 1)) AS pos
  FROM ls
),
f AS (SELECT line FROM l GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 3),
k AS (SELECT * FROM l WHERE line NOT IN (SELECT line FROM f)),
r AS (
  SELECT doc_id,
         array_to_string(list(line ORDER BY pos), chr(10)) AS text_clean,
         COUNT(*) AS n_kept
  FROM k GROUP BY doc_id
),
t AS (SELECT doc_id, COUNT(*) AS n_lines FROM l GROUP BY doc_id)
SELECT t.doc_id, COALESCE(r.text_clean, '') AS text_clean,
       CAST(t.n_lines AS BIGINT) AS n_lines,
       CAST(t.n_lines - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN r USING (doc_id)""",
    # t21: the t16 merge-table CTE chain re-derived, then the identical
    # rank-ordered replace chain applied to every document's tokens
    "t21_bpe_encode": _bpe_encode_sql(10),
    # t22: Laplace-bigram NLL — bigram counts, per-context totals over
    # the COUNT table (vocabulary-sized), unigram-vocab denominator,
    # micro-unit quantization before the per-doc sum (t18's pattern);
    # <2-token docs restored as 0s by the left join
    "t22_bigram_nll": f"""
WITH tk AS (
  SELECT doc_id, {_TOKS.format(c='text')} AS tkl FROM documents
),
b AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tkl)), i -> tkl[i])) AS w1,
         unnest(list_transform(range(1, len(tkl)), i -> tkl[i + 1])) AS w2
  FROM tk
),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY w1, w2),
cx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS ctx FROM bc GROUP BY w1),
vv AS (
  SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS v
  FROM (SELECT unnest(tkl) AS t FROM tk)
),
m AS (
  SELECT b.doc_id,
         CAST(FLOOR(-ln((c + 1.0) / (ctx + vv.v)) * 1000000 + 0.5)
              AS BIGINT) AS m
  FROM b JOIN bc USING (w1, w2) JOIN cx USING (w1), vv
),
s AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(m) AS BIGINT) AS nll_micro
  FROM m GROUP BY doc_id
)
SELECT doc_id,
       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(nll_micro, 0) AS BIGINT) AS nll_micro,
       CASE WHEN COALESCE(n_bigrams, 0) > 0
            THEN ROUND(nll_micro / CAST(n_bigrams AS DOUBLE) / 1000000.0, 6)
            ELSE 0.0 END AS avg_nll
FROM tk LEFT JOIN s USING (doc_id)""",
    # t23: identical gram-hash/count/coverage/reassembly algebra over
    # the promo-tailed corpus; parallel unnests zip (pos, gram hash)
    "t23_span_dedup": f"""
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN concat(text,
                   ' sponsored content brought to you by our partners')
              ELSE text END AS text
  FROM documents
),
tk AS (SELECT doc_id, {_TOKS.format(c='text')} AS tkl FROM src),
g AS (
  SELECT doc_id,
         unnest(range(0, CASE WHEN len(tkl) >= 6
                              THEN len(tkl) - 5 ELSE 0 END)) AS pos,
         unnest(list_transform(
             range(0, CASE WHEN len(tkl) >= 6
                           THEN len(tkl) - 5 ELSE 0 END),
             i -> {hash60_sql(
                 "array_to_string(list_slice(tkl, i + 1, i + 6), ' ')"
             )})) AS gh
  FROM tk
),
f AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
cov AS (
  SELECT DISTINCT doc_id, tpos FROM (
    SELECT doc_id, pos + unnest(range(0, 6)) AS tpos
    FROM g WHERE gh IN (SELECT gh FROM f))
),
tp AS (
  SELECT doc_id, unnest(tkl) AS tok, unnest(range(0, len(tkl))) AS tpos
  FROM tk
),
k AS (SELECT tp.* FROM tp ANTI JOIN cov USING (doc_id, tpos)),
r AS (
  SELECT doc_id,
         array_to_string(list(tok ORDER BY tpos), ' ') AS text_clean,
         COUNT(*) AS n_kept
  FROM k GROUP BY doc_id
),
t AS (SELECT doc_id, CAST(len(tkl) AS BIGINT) AS n_tokens FROM tk)
SELECT t.doc_id, COALESCE(r.text_clean, '') AS text_clean, n_tokens,
       CAST(n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN r USING (doc_id)""",
    # x4: the x2 cell restriction with a threshold filter instead of
    # the top-k window — radius semantics are windowless in BOTH engines
    "x4_radius_search": f"""
WITH cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
         embedding AS centv
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
ccell AS (
  SELECT e.vec_id, e.embedding, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
),
qcell AS (
  SELECT e.vec_id AS query_id, e.embedding AS qv, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
  WHERE e.vec_id < 5
)
SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
       ROUND({_cos_fold_sql('q.qv', 'c.embedding')}, 9) AS cos
FROM (SELECT * FROM ccell WHERE rk = 1) c
JOIN (SELECT * FROM qcell WHERE rk <= 4) q USING (cid)
WHERE c.vec_id != q.query_id
  AND ROUND({_cos_fold_sql('q.qv', 'c.embedding')}, 9) >= 0.25""",
    # t25: the hashing-trick classifier mirrored feature-by-feature —
    # bucket = hash60(feature) % B, weight = integer milli-units from
    # hash60 of the bucket id, score = one division of exact integers
    "t25_quality_classifier": f"""
WITH tk AS (SELECT doc_id, {_TOKS.format(c='text')} AS tkl FROM documents),
f AS (
  SELECT doc_id,
         list_concat(tkl,
           list_transform(range(1, CAST(len(tkl) AS INT)),
             i -> concat(tkl[i], ' ', tkl[i + 1]))) AS fs
  FROM tk
),
a AS (
  SELECT doc_id, len(fs) AS n,
         COALESCE(list_sum(list_transform(fs,
           x -> {hash60_sql("concat('qcts-w:', CAST(" + hash60_sql('x') + " % 4096 AS VARCHAR))")}
                % 2001 - 1000)), 0) AS s
  FROM f
)
SELECT doc_id, CAST(n AS BIGINT) AS n_features,
       CAST(s AS BIGINT) AS weight_milli,
       CASE WHEN n > 0 THEN CAST(s AS DOUBLE) / (n * 1000)
            END AS quality_logit,
       CASE WHEN n > 0 THEN s >= 0 END AS keep
FROM a""",
    # t24: the global rank-<=-cap semantics the two-phase histogram
    # construction must reproduce (same seed-prefixed bucket hash)
    "t24_source_cap": f"""
WITH b AS (
  SELECT doc_id, source,
         {hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")}
             % 1000000 AS bk
  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY bk, doc_id) AS rk
  FROM b
)
SELECT doc_id, source FROM r WHERE rk <= 8""",
}

# x3 serves the IDENTICAL result from the persisted index store that
# x2 computes fresh — x2's SQL is its oracle, so the hash check pins
# the parquet persist/read roundtrip of vectors and cell assignments
DATAPIPE_ORACLE["x3_knn_persisted"] = DATAPIPE_ORACLE["x2_knn_ivf"]

# x5 = x2's algebra with the centroid seed restricted to the EVEN-id
# half (the build corpus); assignment/scoring stay corpus-wide — the
# hash pins that append-grown cells/ serve exactly like a full build
# with the same frozen centroids
DATAPIPE_ORACLE["x5_knn_index_append"] = DATAPIPE_ORACLE[
    "x2_knn_ivf"
].replace(
    "FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)",
    "FROM (SELECT * FROM embeddings WHERE vec_id % 2 = 0"
    " ORDER BY vec_id LIMIT 16)",
)
assert (
    DATAPIPE_ORACLE["x5_knn_index_append"]
    != DATAPIPE_ORACLE["x2_knn_ivf"]
)

# x7: full PQ pipeline replay — codebooks from the 16 lowest-id unit
# vectors, argmin encode (tie -> lowest codeword), per-query LUT,
# ADC fold over codes, top-50 candidate cut, exact-cosine re-rank.
# Every fold is left-to-right, matching the Spark expression chains.
DATAPIPE_ORACLE["x7_pq_knn"] = f"""
WITH u AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) / sqrt(
           list_reduce(list_transform(embedding,
             y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
             (p, q) -> p + q))) AS u
  FROM embeddings
),
seeds AS (
  SELECT u, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
  FROM u ORDER BY vec_id LIMIT 16
),
cb AS (
  SELECT t.j, s.c,
         list_transform(range(1, 9), i -> s.u[t.j * 8 + i]) AS cw
  FROM seeds s, range(0, 8) t(j)
),
enc AS (
  SELECT vec_id, j, c FROM (
    SELECT v.vec_id, b.j, b.c,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, b.j ORDER BY
             list_reduce(list_transform(range(1, 9),
               i -> (v.u[b.j*8 + i] - b.cw[i])
                    * (v.u[b.j*8 + i] - b.cw[i])),
               (p, q) -> p + q), b.c) AS rk
    FROM u v, cb b)
  WHERE rk = 1
),
codes AS (SELECT vec_id, list(c ORDER BY j) AS pq FROM enc GROUP BY vec_id),
lut AS (
  SELECT query_id, list(dot ORDER BY j, c) AS lut
  FROM (
    SELECT q.vec_id AS query_id, b.j, b.c,
           list_reduce(list_transform(range(1, 9),
             i -> q.u[b.j*8 + i] * b.cw[i]), (p, q) -> p + q) AS dot
    FROM u q, cb b WHERE q.vec_id < 5)
  GROUP BY query_id
),
sc AS (
  SELECT l.query_id, cd.vec_id AS neighbor_id,
         ROUND(list_reduce(list_transform(range(0, 8),
           j -> l.lut[j*16 + cd.pq[j+1] + 1]), (p, q) -> p + q), 9)
           AS ascore
  FROM codes cd, lut l
  WHERE cd.vec_id != l.query_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ascore DESC, neighbor_id) AS rk FROM sc)
  WHERE rk <= 50
),
r AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND({_cos_fold_sql('q.embedding', 'e.embedding')}, 9) AS cos
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.neighbor_id
  JOIN embeddings q ON q.vec_id = c.query_id
)
SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rk FROM r)
WHERE rk <= 10"""

# x8: IVF-PQ index replay — x2's centroid/probe machinery composed
# with x7's PQ codebook/encode/LUT machinery; ADC restricted to each
# query's probed cells, top-50 cut, exact-cosine re-rank.
DATAPIPE_ORACLE["x8_pq_index"] = f"""
WITH u AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) / sqrt(
           list_reduce(list_transform(embedding,
             y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
             (p, q) -> p + q))) AS u
  FROM embeddings
),
seeds AS (
  SELECT u, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
  FROM u ORDER BY vec_id LIMIT 16
),
cb AS (
  SELECT t.j, s.c,
         list_transform(range(1, 9), i -> s.u[t.j * 8 + i]) AS cw
  FROM seeds s, range(0, 8) t(j)
),
enc AS (
  SELECT vec_id, j, c FROM (
    SELECT v.vec_id, b.j, b.c,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, b.j ORDER BY
             list_reduce(list_transform(range(1, 9),
               i -> (v.u[b.j*8 + i] - b.cw[i])
                    * (v.u[b.j*8 + i] - b.cw[i])),
               (p, q) -> p + q), b.c) AS rk
    FROM u v, cb b)
  WHERE rk = 1
),
codes AS (SELECT vec_id, list(c ORDER BY j) AS pq FROM enc GROUP BY vec_id),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
         embedding AS centv
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
ccell AS (
  SELECT e.vec_id, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
),
qcell AS (
  SELECT e.vec_id AS query_id, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
  WHERE e.vec_id < 5
),
lut AS (
  SELECT query_id, list(dot ORDER BY j, c) AS lut
  FROM (
    SELECT q.vec_id AS query_id, b.j, b.c,
           list_reduce(list_transform(range(1, 9),
             i -> q.u[b.j*8 + i] * b.cw[i]), (p, q) -> p + q) AS dot
    FROM u q, cb b WHERE q.vec_id < 5)
  GROUP BY query_id
),
sc AS (
  SELECT ql.query_id, cd.vec_id AS neighbor_id,
         ROUND(list_reduce(list_transform(range(0, 8),
           j -> l.lut[j*16 + cd.pq[j+1] + 1]), (p, q) -> p + q), 9)
           AS ascore
  FROM codes cd
  JOIN (SELECT vec_id, cid FROM ccell WHERE rk = 1) home
    ON home.vec_id = cd.vec_id
  JOIN (SELECT query_id, cid FROM qcell WHERE rk <= 4) ql
    ON ql.cid = home.cid
  JOIN lut l ON l.query_id = ql.query_id
  WHERE cd.vec_id != ql.query_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ascore DESC, neighbor_id) AS rk FROM sc)
  WHERE rk <= 50
),
r AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND({_cos_fold_sql('q.embedding', 'e.embedding')}, 9) AS cos
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.neighbor_id
  JOIN embeddings q ON q.vec_id = c.query_id
)
SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rk FROM r)
WHERE rk <= 10"""

# x6: identical quantization (floor(x·127/amax + 0.5), clamp ±127;
# zero vector -> zeros) and the same integer-cosine left fold — the
# scales cancel out of the cosine, so neither engine dequantizes
DATAPIPE_ORACLE["t26_shuffle_shard"] = """
WITH h AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(concat('r8:',
           CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS hh
  FROM documents
)
SELECT doc_id, source, CAST(hh % 8 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hh % 8
                               ORDER BY hh, doc_id) - 1 AS BIGINT)
         AS shard_pos
FROM h"""

DATAPIPE_ORACLE["x6_quantized_knn"] = f"""
WITH am AS (
  SELECT vec_id, embedding,
         list_reduce(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE))), (p, q) -> greatest(p, q)) AS amax
  FROM embeddings
),
qq AS (
  SELECT vec_id,
         CASE WHEN amax = 0
              THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding,
                x -> CAST(greatest(-127, least(127,
                       floor(CAST(x AS DOUBLE) * 127 / amax + 0.5)))
                     AS INT))
         END AS qvec
  FROM am
),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_cos_fold_sql('q.qvec', 'c.qvec')}, 9) AS cos
  FROM qq c JOIN qq q ON q.vec_id < 5 AND c.vec_id != q.vec_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rk
  FROM s
)
SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rank
FROM r WHERE rk <= 10"""

from qctimeseries_spark.datapipe.text import BM25_B as _BM25_B
from qctimeseries_spark.datapipe.text import BM25_K1 as _BM25_K1

# repr() round-trips exactly, so DuckDB parses the SAME doubles the
# Spark literals carry (1.2 + 1.0 is not the literal 2.2 a priori).
DATAPIPE_ORACLE["t27_bm25"] = f"""
WITH post AS MATERIALIZED (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_TOKS.format(c='text')}) AS term
        FROM documents WHERE doc_id % 50 != 0)
  GROUP BY doc_id, term
),
dl AS (SELECT post.*, SUM(tf) OVER (PARTITION BY doc_id) AS dl FROM post),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
        WHERE doc_id % 50 != 0),
ad AS (SELECT CAST(SUM(tf) AS DOUBLE) /
              (SELECT CAST(n AS DOUBLE) FROM tot) AS avgdl FROM post),
qt AS MATERIALIZED (
  SELECT doc_id AS query_id,
         unnest(list_distinct({_TOKS.format(c='text')})) AS term
  FROM documents WHERE doc_id % 50 = 0 AND doc_id < 5000
),
qv AS (SELECT DISTINCT term FROM qt),
pr AS MATERIALIZED (SELECT dl.* FROM dl JOIN qv USING (term)),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM pr GROUP BY term),
sc AS (
  SELECT qt.query_id, pr.doc_id,
         CAST(FLOOR(
           ln(1.0 + (CAST(tot.n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * ((CAST(tf AS DOUBLE) * {_BM25_K1 + 1.0!r})
              / (CAST(tf AS DOUBLE) + {_BM25_K1!r}
                 * (1.0 - {_BM25_B!r} + {_BM25_B!r}
                    * (CAST(dl AS DOUBLE) / ad.avgdl))))
           * 1000000.0 + 0.5) AS BIGINT) AS m
  FROM pr JOIN dfreq USING (term) JOIN qt USING (term), tot, ad
),
agg AS (
  SELECT query_id, doc_id, CAST(SUM(m) AS BIGINT) AS sm,
         CAST(COUNT(*) AS INT) AS n_shared_terms
  FROM sc GROUP BY query_id, doc_id
),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY sm DESC, doc_id) AS INT) AS rank FROM agg)
SELECT query_id, doc_id, n_shared_terms,
       ROUND(sm / 1000000.0, 6) AS bm25, rank
FROM r WHERE rank <= 5"""

# Cross-corpus LSH replay: union the two sides with a disjoint id
# offset, run the standard self-join pipeline, keep only cross pairs
# (corpus ids all < the offset, so cand's a<b puts corpus in id_a).
DATAPIPE_ORACLE["d10_cross_neardup"] = f"""
WITH lk AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 50 != 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, concat('leaked copy ', text) AS text
  FROM documents WHERE doc_id % 50 = 0
),
corpus AS (
  SELECT doc_id, text FROM lk
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text
  FROM documents WHERE doc_id % 50 = 0
),
{_shingle_sql('corpus', 3)},
{_minhash_sql(15)},
{_band_sql(5, 3)},
{_JACCARD_SQL}
SELECT id_a AS corpus_id, id_b - 10000000 AS other_id, jaccard
FROM j
WHERE jaccard >= 0.6 AND id_a < 10000000 AND id_b >= 10000000"""

DATAPIPE_ORACLE["t28_safe_split"] = f"""
WITH RECURSIVE {_NEAR_CORPUS_SQL.lstrip()},
{_shingle_sql('corpus', 3)},
{_minhash_sql(15)},
{_band_sql(5, 3)},
{_JACCARD_SQL},
p AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.6),
e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b, id_a FROM p
),
nd AS (SELECT DISTINCT src AS id FROM e),
reach(a, b) AS (
  SELECT id, id FROM nd
  UNION
  SELECT reach.a, e.dst FROM reach JOIN e ON reach.b = e.src
),
cl AS (SELECT a AS id, MIN(b) AS cluster_id FROM reach GROUP BY a),
g AS (
  SELECT corpus.doc_id, COALESCE(cl.cluster_id, corpus.doc_id) AS gk
  FROM corpus LEFT JOIN cl ON corpus.doc_id = cl.id
)
SELECT doc_id,
       CASE WHEN {hash60_sql("concat('qcts-split:', CAST(gk AS VARCHAR))")}
                 % 1000000 < 800000 THEN 'train'
            WHEN {hash60_sql("concat('qcts-split:', CAST(gk AS VARCHAR))")}
                 % 1000000 < 900000 THEN 'val'
            WHEN {hash60_sql("concat('qcts-split:', CAST(gk AS VARCHAR))")}
                 % 1000000 < 1000000 THEN 'test'
       END AS split
FROM g"""

DATAPIPE_ORACLE["x9_filtered_knn"] = f"""
WITH cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
         embedding AS centv
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
ccell AS (
  SELECT e.vec_id, e.embedding, e.label, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
),
qcell AS (
  SELECT e.vec_id AS query_id, e.embedding AS qv, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
  WHERE e.vec_id < 5
),
s AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
         ROUND({_cos_fold_sql('q.qv', 'c.embedding')}, 9) AS cos
  FROM (SELECT * FROM ccell WHERE rk = 1 AND label < 3) c
  JOIN (SELECT * FROM qcell WHERE rk <= 4) q USING (cid)
  WHERE c.vec_id != q.query_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rk
  FROM s
)
SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rank
FROM r WHERE rk <= 10"""

DATAPIPE_ORACLE["d11_canonical_keep"] = f"""
WITH RECURSIVE {_NEAR_CORPUS_SQL.lstrip()},
{_shingle_sql('corpus', 3)},
{_minhash_sql(15)},
{_band_sql(5, 3)},
{_JACCARD_SQL},
p AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.6),
e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b, id_a FROM p
),
nd AS (SELECT DISTINCT src AS id FROM e),
reach(a, b) AS (
  SELECT id, id FROM nd
  UNION
  SELECT reach.a, e.dst FROM reach JOIN e ON reach.b = e.src
),
cl AS (SELECT a AS id, MIN(b) AS cluster_id FROM reach GROUP BY a),
ntok AS (
  SELECT doc_id,
         CAST(len({_TOKS.format(c='text')}) AS INT) AS n_tokens
  FROM corpus
),
mem AS (
  SELECT cl.id, cl.cluster_id, ntok.n_tokens
  FROM cl JOIN ntok ON ntok.doc_id = cl.id
),
k AS (
  SELECT cluster_id, id,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY n_tokens DESC, id) AS rk
  FROM mem
),
kp AS (SELECT cluster_id, id AS keeper_id FROM k WHERE rk = 1)
SELECT ntok.doc_id, ntok.n_tokens,
       COALESCE(cl.cluster_id, ntok.doc_id) AS cluster_id,
       COALESCE(kp.keeper_id, ntok.doc_id) AS keeper_id,
       (ntok.doc_id = COALESCE(kp.keeper_id, ntok.doc_id)) AS kept
FROM ntok
LEFT JOIN cl ON ntok.doc_id = cl.id
LEFT JOIN kp ON cl.cluster_id = kp.cluster_id"""

DATAPIPE_ORACLE["x10_cell_sample"] = f"""
WITH cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
         embedding AS centv
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
ccell AS (
  SELECT e.vec_id, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
),
a AS (SELECT vec_id, cid AS centroid_id FROM ccell WHERE rk = 1),
b AS (
  SELECT vec_id, centroid_id,
         {hash60_sql("concat('qcts:', CAST(vec_id AS VARCHAR))")}
             % 1000000 AS bk
  FROM a
),
r AS (
  SELECT vec_id, centroid_id,
         ROW_NUMBER() OVER (PARTITION BY centroid_id
                            ORDER BY bk, vec_id) AS rk
  FROM b
)
SELECT vec_id, CAST(centroid_id AS INT) AS centroid_id
FROM r WHERE rk <= 20"""

# Hybrid RRF: replay the t27 BM25 pipeline at k=10, the x1 brute
# cosine at k=10 over the %50-split embeddings, then fuse with
# integer nano-unit contributions (1e9 // (60+rank)) — exact in both
# engines because ranks are small ints.
DATAPIPE_ORACLE["t29_hybrid_rrf"] = f"""
WITH post AS MATERIALIZED (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_TOKS.format(c='text')}) AS term
        FROM documents WHERE doc_id % 50 != 0)
  GROUP BY doc_id, term
),
dl AS (SELECT post.*, SUM(tf) OVER (PARTITION BY doc_id) AS dl FROM post),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
        WHERE doc_id % 50 != 0),
ad AS (SELECT CAST(SUM(tf) AS DOUBLE) /
              (SELECT CAST(n AS DOUBLE) FROM tot) AS avgdl FROM post),
qt AS MATERIALIZED (
  SELECT doc_id AS query_id,
         unnest(list_distinct({_TOKS.format(c='text')})) AS term
  FROM documents WHERE doc_id % 50 = 0 AND doc_id < 5000
),
qv AS (SELECT DISTINCT term FROM qt),
pr AS MATERIALIZED (SELECT dl.* FROM dl JOIN qv USING (term)),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM pr GROUP BY term),
sc AS (
  SELECT qt.query_id, pr.doc_id,
         CAST(FLOOR(
           ln(1.0 + (CAST(tot.n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * ((CAST(tf AS DOUBLE) * {_BM25_K1 + 1.0!r})
              / (CAST(tf AS DOUBLE) + {_BM25_K1!r}
                 * (1.0 - {_BM25_B!r} + {_BM25_B!r}
                    * (CAST(dl AS DOUBLE) / ad.avgdl))))
           * 1000000.0 + 0.5) AS BIGINT) AS m
  FROM pr JOIN dfreq USING (term) JOIN qt USING (term), tot, ad
),
agg AS (
  SELECT query_id, doc_id, CAST(SUM(m) AS BIGINT) AS sm
  FROM sc GROUP BY query_id, doc_id
),
bm AS (SELECT query_id, doc_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sm DESC, doc_id) AS rank
       FROM agg QUALIFY rank <= 10),
dq AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id % 50 = 0 AND vec_id < 5000
),
ds AS (
  SELECT dq.query_id, e.vec_id AS doc_id,
         ROUND({_cos_fold_sql('dq.qv', 'e.embedding')}, 9) AS cos
  FROM embeddings e, dq
  WHERE e.vec_id % 50 != 0 AND e.vec_id != dq.query_id
),
dn AS (SELECT query_id, doc_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, doc_id) AS rank
       FROM ds QUALIFY rank <= 10),
u AS (
  SELECT query_id, doc_id, rank FROM bm
  UNION ALL
  SELECT query_id, doc_id, rank FROM dn
),
fs AS (
  SELECT query_id, doc_id,
         CAST(SUM(1000000000 // (60 + rank)) AS BIGINT) AS sm,
         CAST(COUNT(*) AS INT) AS n_lists
  FROM u GROUP BY query_id, doc_id
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sm DESC, doc_id) AS rk FROM fs)
SELECT query_id, doc_id, n_lists,
       ROUND(sm / 1000000000.0, 9) AS rrf, CAST(rk AS INT) AS rank
FROM r WHERE rk <= 5"""

# Weighted sample: the A-Res race replayed on the same hash axis —
# u = (bucket+1)/M over sample_bucket's 'qcts:' prefix, key =
# ln(u)/weight rounded 9dp, top-100 by key desc with id tie-break.
DATAPIPE_ORACLE["t30_weighted_sample"] = f"""
WITH b AS (
  SELECT doc_id, n_chars,
         ({hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")})
           % 1000000 AS bucket
  FROM documents
  WHERE doc_id IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
),
k AS (
  SELECT doc_id, n_chars,
         ROUND(ln((bucket + 1) / 1000000.0)
               / CAST(n_chars AS DOUBLE), 9) AS es_key
  FROM b
),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id) AS rk
      FROM k)
SELECT doc_id, n_chars, es_key, CAST(rk AS INT) AS sample_rank
FROM r WHERE rk <= 100"""

# N-gram novelty: the d2 hashed-shingle machinery, document frequency
# over distinct per-doc grams, one join back, per-doc re-aggregation.
DATAPIPE_ORACLE["t31_ngram_novelty"] = f"""
WITH tk AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
g AS (SELECT doc_id, unnest({_sh_hashed('tk', 3)}) AS gh FROM tk),
dfq AS (SELECT gh, COUNT(*) AS ndocs FROM g GROUP BY gh),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_grams,
         CAST(SUM(CASE WHEN ndocs = 1 THEN 1 ELSE 0 END) AS INT) AS n_novel
  FROM g JOIN dfq USING (gh) GROUP BY doc_id
)
SELECT doc_id, n_grams, n_novel,
       ROUND(n_novel / CAST(n_grams AS DOUBLE), 6) AS novelty
FROM per"""

# IVF cell stats: x2's rk=1 assignment replay + one aggregation with
# micro-quantized cosine sums (the t27 exactness precedent).
DATAPIPE_ORACLE["x11_cell_stats"] = f"""
WITH cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
         embedding AS centv
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
cc AS (
  SELECT e.vec_id, cents.cid,
         ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9) AS c,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
),
a AS (SELECT vec_id, cid AS centroid_id, c FROM cc WHERE rk = 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
s AS (
  SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         CAST(SUM(CAST(FLOOR(c * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sm,
         MIN(c) AS min_cos, MAX(c) AS max_cos
  FROM a GROUP BY centroid_id
)
SELECT centroid_id, n_vectors,
       ROUND(CAST(n_vectors AS DOUBLE) / tot.n, 6) AS frac,
       ROUND(sm / (CAST(n_vectors AS DOUBLE) * 1000000.0), 6) AS mean_cos,
       min_cos, max_cos
FROM s, tot"""

# Bloom prune: slot positions are pure bit ops on the shared hash60
# gram hashes (m = 2^18, k = 2: low 18 bits, next 18 bits), so the
# oracle reproduces the exact hit set INCLUDING the false positives —
# the approximation is defined semantics, not noise.
from qctimeseries_spark.datapipe.sketches import (  # noqa: E402
    BLOOM_M as _BLOOM_M,
    HLL_SUFFIX_BITS as _HLL_SB,
    hll_alpha_scaled as _hll_alpha_scaled,
)

DATAPIPE_ORACLE["t32_bloom_prune"] = f"""
WITH tk AS (SELECT doc_id, {_TOKS.format(c='text')} AS tk FROM documents),
g AS (SELECT doc_id, {_sh_hashed('tk', 8)} AS ghs FROM tk),
bpos AS (
  SELECT DISTINCT unnest([h & {_BLOOM_M - 1},
                          (h >> 18) & {_BLOOM_M - 1}]) AS slot
  FROM (SELECT unnest(ghs) AS h FROM g WHERE doc_id % 50 = 0)
),
cg AS (SELECT doc_id, len(ghs) AS n_grams, unnest(ghs) AS h FROM g),
hits AS (
  SELECT cg.doc_id, cg.n_grams
  FROM cg
  JOIN bpos b1 ON (cg.h & {_BLOOM_M - 1}) = b1.slot
  JOIN bpos b2 ON ((cg.h >> 18) & {_BLOOM_M - 1}) = b2.slot
),
per AS (
  SELECT doc_id, CAST(MAX(n_grams) AS INT) AS n_grams,
         CAST(COUNT(*) AS INT) AS n_hits
  FROM hits GROUP BY doc_id
)
SELECT doc_id, n_grams, n_hits,
       ROUND(n_hits / CAST(n_grams AS DOUBLE), 6) AS hit_frac
FROM per WHERE doc_id % 50 != 0"""

# Count-min: 4 seeded-hash rows x 1024 buckets; the estimate is the
# min over the probed cells — integers end to end.
_CMS_H = hash60_sql("concat(CAST(9100 + r.range AS VARCHAR), ':', term)")
DATAPIPE_ORACLE["t33_cms_heavyhitters"] = f"""
WITH tok AS (SELECT unnest({_TOKS.format(c='text')}) AS term
             FROM documents),
cells AS (
  SELECT CAST(r.range AS INT) AS row,
         CAST({_CMS_H} % 1024 AS INT) AS bucket
  FROM tok, range(4) r
),
sk AS (SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM cells GROUP BY row, bucket),
cand AS (SELECT DISTINCT term FROM tok),
probes AS (
  SELECT term, CAST(r.range AS INT) AS row,
         CAST({_CMS_H} % 1024 AS INT) AS bucket
  FROM cand, range(4) r
),
est AS (
  SELECT term, CAST(MIN(cnt) AS BIGINT) AS est
  FROM probes JOIN sk USING (row, bucket) GROUP BY term
),
ex AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS exact
       FROM tok GROUP BY term)
SELECT term, est, exact FROM est JOIN ex USING (term)"""

# HLL: registers are exact integers (bucket = low 10 bits, rho =
# 1 + trailing zeros of the 50-bit suffix via w & -w); the harmonic
# denominator is summed SCALED by 2^50 so it is an exact BIGINT, and
# the single-literal numerator is the same Python double Spark embeds.
DATAPIPE_ORACLE["t34_hll_distinct"] = f"""
WITH tk AS (SELECT lang, {_TOKS.format(c='text')} AS tk FROM documents),
sh AS (
  SELECT lang, unnest(list_distinct(
    CASE WHEN len(tk) >= 3
      THEN list_transform(range(0, len(tk) - 2),
                          i -> array_to_string(list_slice(tk, i + 1, i + 3), ' '))
      ELSE [array_to_string(tk, ' ')] END)) AS gram
  FROM tk
),
h AS (SELECT lang, {hash60_sql('gram')} AS h FROM sh),
r AS (
  SELECT lang, CAST(h & 1023 AS INT) AS bucket,
         CASE WHEN (h >> 10) = 0 THEN {_HLL_SB}
              ELSE LEAST(CAST(ROUND(LOG2((h >> 10) & -(h >> 10))) AS INT) + 1,
                         {_HLL_SB})
         END AS rho
  FROM h
),
m AS (SELECT lang, bucket, MAX(rho) AS M FROM r GROUP BY lang, bucket),
a AS (
  SELECT lang, CAST(COUNT(*) AS INT) AS nonzero,
         CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_SB} - M)) AS BIGINT) AS s
  FROM m GROUP BY lang
),
b AS (
  SELECT lang, nonzero,
         s + CAST(1024 - nonzero AS BIGINT)
             * (CAST(1 AS BIGINT) << {_HLL_SB}) AS rs
  FROM a
)
SELECT lang,
       CAST(1024 AS INT) AS n_registers,
       CAST(1024 - nonzero AS INT) AS n_zero,
       CAST(rs AS BIGINT) AS reg_sum_scaled,
       ROUND(CASE WHEN ({_hll_alpha_scaled(1024)!r} / CAST(rs AS DOUBLE))
                       <= 2560.0 AND nonzero < 1024
                  THEN 1024.0 * LN(1024.0 / CAST(1024 - nonzero AS DOUBLE))
                  ELSE {_hll_alpha_scaled(1024)!r} / CAST(rs AS DOUBLE)
             END, 4) AS est_distinct
FROM b"""


from qctimeseries_spark.datapipe.hashing import seeded_hash60_sql as _sh60

_D12_NEW_TEXT = (
    f"CASE WHEN {_sh60('CAST(doc_id AS VARCHAR)', 103)} % 5 = 0 "
    "THEN text || ' rev2' ELSE text END"
)

DATAPIPE_ORACLE["d12_snapshot_diff"] = f"""
WITH old AS (
  SELECT doc_id, {hash60_sql('text')} AS fp_old FROM documents
  WHERE {_sh60('CAST(doc_id AS VARCHAR)', 101)} % 10 < 9
),
new AS (
  SELECT doc_id, {hash60_sql(_D12_NEW_TEXT)} AS fp_new
  FROM documents
  WHERE {_sh60('CAST(doc_id AS VARCHAR)', 102)} % 10 < 9
)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old <> fp_new THEN 'changed' END AS status
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
WHERE (fp_old IS NULL OR fp_new IS NULL OR fp_old <> fp_new)"""


DATAPIPE_ORACLE["x12_embedding_drift"] = f"""
WITH halves AS (
  SELECT vec_id, embedding,
         {_sh60('CAST(vec_id AS VARCHAR)', 7)} % 2 AS half
  FROM embeddings
),
ex AS (
  SELECT half, i - 1 AS dim,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) AS q
  FROM halves, UNNEST(range(1, len(embedding) + 1)) AS t(i)
),
s AS (
  SELECT half, dim, SUM(q) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM ex GROUP BY half, dim
),
r AS (SELECT dim, s AS s_ref, n AS n_ref FROM s WHERE half = 0),
c AS (SELECT dim, s AS s_cur, n AS n_cur FROM s WHERE half = 1)
SELECT r.dim, n_ref, n_cur,
       ROUND(s_ref / (CAST(n_ref AS DOUBLE) * 1000000.0), 9) AS mean_ref,
       ROUND(s_cur / (CAST(n_cur AS DOUBLE) * 1000000.0), 9) AS mean_cur,
       ROUND(ABS(s_cur / (CAST(n_cur AS DOUBLE) * 1000000.0)
                 - s_ref / (CAST(n_ref AS DOUBLE) * 1000000.0)), 9) AS shift
FROM r JOIN c ON r.dim = c.dim"""


DATAPIPE_ORACLE["t35_perplexity_buckets"] = f"""
SELECT doc_id, avg_nll,
       CAST(NTILE(3) OVER (ORDER BY avg_nll, doc_id) AS INT) AS bucket
FROM ({DATAPIPE_ORACLE['t18_unigram_nll']})"""


DATAPIPE_ORACLE["t36_nfc_dedup"] = f"""
WITH corpus AS (
  SELECT doc_id, text || ' caf' || chr(233) AS text FROM documents
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         upper(text) || '  cafe' || chr(769) AS text
  FROM documents WHERE {_sh60('CAST(doc_id AS VARCHAR)', 36)} % 5 = 0
),
n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(nfc_normalize(text)),
              '[ \t\n\r]+', ' ', 'g')) AS nt
  FROM corpus
),
f AS (SELECT doc_id, {hash60_sql('nt')} AS fingerprint FROM n)
SELECT fingerprint, MIN(doc_id) AS keeper,
       COUNT(*) AS n_dups,
       array_to_string(list_sort(list(doc_id)), ',') AS ids
FROM f GROUP BY fingerprint HAVING COUNT(*) > 1"""


# ---------------------------------------------------------------------------
# round-8 continuation: chunking, temperature mixture, negative
# sampling, streaming sketch maintenance
# ---------------------------------------------------------------------------


def q_t37_chunk_docs(spark, sf_dir):
    """Sliding-window RAG chunking: every document split into
    32-token chunks overlapping by 8 (stride 24), full coverage
    guaranteed — entirely row-local (tokenize once, one posexplode,
    NO shuffle), so the plan inherits the scan's partitioning and
    scales linearly at any corpus size."""
    from qctimeseries_spark.datapipe.text import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=32, overlap=8
    )


def q_t38_temperature_mix(spark, sf_dir):
    """√-temperature mixture weights over languages (mC4/XLM-R
    rebalancing): natural token shares damped by alpha=0.5 and
    renormalized into targets, then the same no-upsampling keep-frac
    algebra as t13.  One map-side-combined corpus aggregation +
    broadcast scalars; √ is IEEE-correctly-rounded in every engine and
    the per-group weights quantize to integer nano-units before the
    normalizing sum, so the result is hash-exact."""
    from qctimeseries_spark.datapipe.sample import temperature_weights
    from qctimeseries_spark.datapipe.text import token_count

    d = _docs(spark, sf_dir).select(
        "lang", token_count(F.col("text")).alias("_ntok")
    )
    return temperature_weights(d, "lang", "_ntok", alpha=0.5)


def q_x13_negative_sample(spark, sf_dir):
    """Deterministic contrastive negative sampling: each embedding row
    draws k=4 differing-label negatives by seeded pair-hash order from
    its ONE probed hash bucket (of 8) — reproducible with no RNG, and
    never all-pairs: fan-out is n²/buckets with buckets sized to the
    corpus.  One bucket equi-join + one per-anchor window."""
    from qctimeseries_spark.datapipe.similarity import negative_sample

    return negative_sample(
        read_table(spark, sf_dir, "embeddings"),
        k=4, buckets=8, seed="neg",
    )


def q_st16_stream_heavyhitters(spark, sf_dir):
    """Streaming count-min maintenance: the documents corpus arrives
    as two planted micro-batches (even ids, then odd), each batch
    aggregates its OWN ≤4×1024-cell partial sketch into a committed
    per-batch sink dir, and the merged sketch — one grid-sized sum
    over the partials — must be bit-identical to the batch t33 sketch
    over the whole corpus, because count-min counters are plain
    integer sums (the 1000-executor / multi-day rollup algebra).
    The oracle is the batch sketch SQL."""
    import os
    import shutil
    import tempfile

    from qctimeseries_spark.streaming import (
        cms_ingest_stream,
        scoped_state_partitions,
        stage_file_batches,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="qcts_st16_")
    try:
        src = os.path.join(tmp, "src")
        stage_file_batches(
            [d.filter(F.col("doc_id") % 2 == 0),
             d.filter(F.col("doc_id") % 2 == 1)],
            src,
        )
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # each micro-batch reduces to a ≤4×1024-cell partial sketch —
        # grid-bounded shuffles where 32 partitions are task overhead;
        # measured 3.2 s → 2.2 s at 8 partitions (r13)
        with scoped_state_partitions(spark):
            out = cms_ingest_stream(
                stream,
                os.path.join(tmp, "out"),
                checkpoint_dir=os.path.join(tmp, "ckpt"),
            )
            out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


DATAPIPE_QUERIES["t37_chunk_docs"] = q_t37_chunk_docs
DATAPIPE_QUERIES["t38_temperature_mix"] = q_t38_temperature_mix
DATAPIPE_QUERIES["x13_negative_sample"] = q_x13_negative_sample
DATAPIPE_QUERIES["st16_stream_heavyhitters"] = q_st16_stream_heavyhitters

# chunking: starts 1, 1+24, … ≤ max(len-8, 1); chunk = 32-token slice;
# DuckDB range() is stop-exclusive, list_slice end-inclusive.
_T37_TOKS = _TOKS.format(c="text")
DATAPIPE_ORACLE["t37_chunk_docs"] = f"""
WITH tk AS (SELECT doc_id, {_T37_TOKS} AS tk FROM documents),
st AS (
  SELECT doc_id, tk,
         unnest(range(1, greatest(len(tk) - 8, 1) + 1, 24)) AS s
  FROM tk
)
SELECT doc_id,
       CAST((s - 1) // 24 AS INT) AS chunk_id,
       CAST(s AS INT) AS start_token,
       CAST(greatest(least(len(tk) - s + 1, 32), 0) AS INT)
         AS n_chunk_tokens,
       array_to_string(list_slice(tk, s, s + 31), ' ') AS chunk
FROM st"""

# temperature mixture: nano-unit-quantized √share weights, exact
# BIGINT normalizer, the t13 keep-frac algebra — op-for-op the Spark
# expression order so every double is bit-identical.
DATAPIPE_ORACLE["t38_temperature_mix"] = f"""
WITH g AS (
  SELECT lang, CAST(SUM(len({_T37_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM g),
w AS (
  SELECT lang, n_tokens,
         CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS share,
         CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE))
                    * 1000000000.0 + 0.5) AS BIGINT) AS w
  FROM g, tot
),
ws AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM w),
t AS (
  SELECT w.lang, w.n_tokens, w.share,
         CAST(w.w AS DOUBLE) / CAST(ws.wsum AS DOUBLE) AS target
  FROM w, ws
),
tm AS (SELECT MIN(CAST(n_tokens AS DOUBLE) / target) AS T FROM t)
SELECT lang, n_tokens,
       ROUND(share, 9) AS share,
       ROUND(target, 9) AS target_share,
       ROUND(LEAST(1.0, target * tm.T / CAST(n_tokens AS DOUBLE)), 9)
         AS keep_frac
FROM t, tm"""

_X13_AH = hash60_sql("concat('neg:a:', CAST(vec_id AS VARCHAR))")
_X13_CH = hash60_sql("concat('neg:c:', CAST(vec_id AS VARCHAR))")
_X13_PH = hash60_sql(
    "concat('neg:p:', CAST(anchor_id AS VARCHAR), ':',"
    " CAST(neg_id AS VARCHAR))"
)
DATAPIPE_ORACLE["x13_negative_sample"] = f"""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS albl,
         {_X13_AH} % 8 AS b
  FROM embeddings
),
c AS (
  SELECT vec_id AS neg_id, label AS neg_label,
         {_X13_CH} % 8 AS b
  FROM embeddings
),
p AS (
  SELECT anchor_id, neg_id, neg_label,
         ROW_NUMBER() OVER (
           PARTITION BY anchor_id
           ORDER BY {_X13_PH} ASC, neg_id ASC
         ) AS rank
  FROM a JOIN c USING (b)
  WHERE anchor_id != neg_id AND albl IS DISTINCT FROM neg_label
)
SELECT anchor_id, neg_id, neg_label, CAST(rank AS INT) AS rank
FROM p WHERE rank <= 4"""

# streaming CMS merge == the batch sketch (integer cell sums commute
# across any batch split) — the oracle is t33's sketch CTE alone.
DATAPIPE_ORACLE["st16_stream_heavyhitters"] = f"""
WITH tok AS (SELECT unnest({_T37_TOKS}) AS term
             FROM documents),
cells AS (
  SELECT CAST(r.range AS INT) AS row,
         CAST({_CMS_H} % 1024 AS INT) AS bucket
  FROM tok, range(4) r
)
SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
FROM cells GROUP BY row, bucket"""


# ---------------------------------------------------------------------------
# round-8 continuation wave 2: exact k-means, sequence packing,
# streaming HLL
# ---------------------------------------------------------------------------


def q_x14_kmeans(spark, sf_dir):
    """Exact spherical k-means (16 cells, 2 Lloyd iterations): the
    cluster model as a first-class deliverable — deterministic id
    seed, per-dim left-fold cosine assignment, micro-unit-exact cell
    means, fixed-order renormalization.  Centroids render as
    nano-quantized integer strings so the array payload hashes
    identically across engines (the d1 ids precedent)."""
    from qctimeseries_spark.datapipe.similarity import kmeans_exact

    out = kmeans_exact(
        read_table(spark, sf_dir, "embeddings"), nlist=16, iters=2
    )
    return out.select(
        "centroid_id",
        "n_members",
        F.concat_ws(
            ",",
            F.transform(
                F.col("centroid"),
                lambda x: F.floor(x * 1e9 + F.lit(0.5))
                .cast("bigint")
                .cast("string"),
            ),
        ).alias("centroid_q"),
    )


def q_t39_pack_sequences(spark, sf_dir):
    """Greedy concat-packing layout: documents concatenated per source
    shard in doc_id order and split at 128-token context boundaries —
    per-doc (start_offset, seq_first, seq_last, crosses) metadata.
    One shard shuffle + one ordered per-shard prefix sum; no global
    sort anywhere."""
    from qctimeseries_spark.datapipe.sample import pack_sequences
    from qctimeseries_spark.datapipe.text import token_count

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", token_count(F.col("text")).alias("_ntok")
    )
    out = pack_sequences(
        d, "_ntok", key_col="doc_id", ctx_len=128, shard_col="source"
    )
    return out.select(
        "source", "doc_id", "n_tokens", "start_offset",
        "seq_first", "seq_last",
        F.col("crosses_boundary").cast("int").alias("crosses"),
    )


def q_st17_stream_distinct(spark, sf_dir):
    """Streaming HyperLogLog maintenance: the corpus arrives as two
    planted micro-batches, each writing its own register partial to a
    committed per-batch dir; the drained estimate — element-wise MAX
    merge + the shared batch estimate tail — must be bit-identical to
    batch hll_distinct over the whole corpus (register max commutes).
    Counts distinct TOKENS per language."""
    import os
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.text import tokens
    from qctimeseries_spark.streaming import (
        hll_ingest_stream,
        stage_file_batches,
    )

    d = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    tmp = tempfile.mkdtemp(prefix="qcts_st17_")
    try:
        src = os.path.join(tmp, "src")
        stage_file_batches(
            [d.filter(F.col("doc_id") % 2 == 0),
             d.filter(F.col("doc_id") % 2 == 1)],
            src,
        )
        stream = (
            spark.readStream
            .schema("doc_id bigint, lang string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        toks = stream.select(
            "lang", F.explode(tokens(F.col("text"))).alias("term")
        )
        out = hll_ingest_stream(
            toks,
            os.path.join(tmp, "out"),
            "term",
            group_cols=("lang",),
            checkpoint_dir=os.path.join(tmp, "ckpt"),
        )
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


DATAPIPE_QUERIES["x14_kmeans"] = q_x14_kmeans
DATAPIPE_QUERIES["t39_pack_sequences"] = q_t39_pack_sequences
DATAPIPE_QUERIES["st17_stream_distinct"] = q_st17_stream_distinct


def _kmeans_iter_sql(k: int) -> str:
    """One unrolled exact-Lloyd iteration: assignment vs cents{k-1},
    micro-unit cell means, fixed-order renormalization → cents{k}."""
    cos = _cos_fold_sql("e.embedding", "c.centv")
    return f"""
a{k} AS (
  SELECT e.vec_id, e.embedding, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({cos}, 9) DESC, c.cid
         ) AS rk
  FROM embeddings e, cents{k - 1} c
),
m{k} AS (
  SELECT cid, i - 1 AS pos,
         CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0
                             + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM a{k}, UNNEST(range(1, len(embedding) + 1)) AS t(i)
  WHERE rk = 1 GROUP BY cid, pos
),
g{k} AS (
  SELECT cid, list(s / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY pos)
           AS mean
  FROM m{k} GROUP BY cid
),
n{k} AS (
  SELECT cid,
         list_transform(mean, m -> m / sqrt(list_reduce(
             list_transform(mean, x -> x * x), (p, q) -> p + q)))
           AS centv
  FROM g{k}
),
cents{k} AS (
  SELECT c.cid, COALESCE(n{k}.centv, c.centv) AS centv
  FROM cents{k - 1} c LEFT JOIN n{k} ON n{k}.cid = c.cid
)"""


_KM_COS_F = _cos_fold_sql("e.embedding", "c.centv")
DATAPIPE_ORACLE["x14_kmeans"] = f"""
WITH cents0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
         list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)),
           x -> x / sqrt(list_reduce(
             list_transform(list_transform(embedding,
                              y -> CAST(y AS DOUBLE)), y -> y * y),
             (p, q) -> p + q))) AS centv
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),{_kmeans_iter_sql(1)},{_kmeans_iter_sql(2)},
af AS (
  SELECT e.vec_id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_KM_COS_F}, 9) DESC, c.cid
         ) AS rk
  FROM embeddings e, cents2 c
),
sz AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members
  FROM af WHERE rk = 1 GROUP BY cid
)
SELECT c.cid AS centroid_id,
       COALESCE(sz.n_members, CAST(0 AS BIGINT)) AS n_members,
       array_to_string(list_transform(c.centv,
         x -> CAST(CAST(FLOOR(x * 1000000000.0 + 0.5) AS BIGINT)
                   AS VARCHAR)), ',') AS centroid_q
FROM cents2 c LEFT JOIN sz ON sz.cid = c.cid"""

DATAPIPE_ORACLE["t39_pack_sequences"] = f"""
WITH tk AS (
  SELECT doc_id, source, CAST(len({_T37_TOKS}) AS BIGINT) AS n
  FROM documents
),
c AS (
  SELECT doc_id, source, n,
         CAST(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM tk
)
SELECT source, doc_id, n AS n_tokens,
       CAST(cum - n AS BIGINT) AS start_offset,
       CAST(FLOOR((cum - n) / 128) AS BIGINT) AS seq_first,
       CASE WHEN n > 0 THEN CAST(FLOOR((cum - 1) / 128) AS BIGINT)
            ELSE CAST(FLOOR((cum - n) / 128) AS BIGINT)
       END AS seq_last,
       CAST(CASE WHEN n > 0
                 THEN CAST(FLOOR((cum - 1) / 128) AS BIGINT)
                 ELSE CAST(FLOOR((cum - n) / 128) AS BIGINT)
            END > CAST(FLOOR((cum - n) / 128) AS BIGINT) AS INT)
         AS crosses
FROM c"""

# streaming HLL == batch hll_distinct over tokens per lang (register
# max commutes) — the t34 estimate tail over token (not trigram) hashes
DATAPIPE_ORACLE["st17_stream_distinct"] = f"""
WITH tok AS (
  SELECT lang, unnest({_T37_TOKS}) AS term FROM documents
),
h AS (SELECT lang, {hash60_sql('term')} AS h FROM tok),
r AS (
  SELECT lang, CAST(h & 1023 AS INT) AS bucket,
         CASE WHEN (h >> 10) = 0 THEN {_HLL_SB}
              ELSE LEAST(CAST(ROUND(LOG2((h >> 10) & -(h >> 10))) AS INT) + 1,
                         {_HLL_SB})
         END AS rho
  FROM h
),
m AS (SELECT lang, bucket, MAX(rho) AS M FROM r GROUP BY lang, bucket),
a AS (
  SELECT lang, CAST(COUNT(*) AS INT) AS nonzero,
         CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_SB} - M)) AS BIGINT) AS s
  FROM m GROUP BY lang
),
b AS (
  SELECT lang, nonzero,
         s + CAST(1024 - nonzero AS BIGINT)
             * (CAST(1 AS BIGINT) << {_HLL_SB}) AS rs
  FROM a
)
SELECT lang,
       CAST(1024 AS INT) AS n_registers,
       CAST(1024 - nonzero AS INT) AS n_zero,
       CAST(rs AS BIGINT) AS reg_sum_scaled,
       ROUND(CASE WHEN ({_hll_alpha_scaled(1024)!r} / CAST(rs AS DOUBLE))
                       <= 2560.0 AND nonzero < 1024
                  THEN 1024.0 * LN(1024.0 / CAST(1024 - nonzero AS DOUBLE))
                  ELSE {_hll_alpha_scaled(1024)!r} / CAST(rs AS DOUBLE)
             END, 4) AS est_distinct
FROM b"""


def q_x15_recall_eval(spark, sf_dir):
    """ANN index evaluation: per-query recall@10 of the x2 IVF result
    (nlist=16, nprobe=4) against the x1 exact brute-force neighbors —
    the measurement that gates every nprobe/banding knob before a
    100 TB rollout.  Fully distributed: one (query, neighbor)
    equi-join + two thin groupBys, never collects."""
    from qctimeseries_spark.datapipe.similarity import (
        knn_bruteforce,
        knn_ivf,
        recall_at_k,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = knn_bruteforce(emb, queries, k=10)
    approx = knn_ivf(emb, queries, k=10, nlist=16, nprobe=4)
    return recall_at_k(exact, approx)


DATAPIPE_QUERIES["x15_recall_eval"] = q_x15_recall_eval

# recall = |approx ∩ exact| / |exact| per query, composed from the x1
# and x2 oracles verbatim (nested WITHs are subqueries here)
DATAPIPE_ORACLE["x15_recall_eval"] = f"""
WITH ex AS ({DATAPIPE_ORACLE['x1_knn_bruteforce']}),
ap AS ({DATAPIPE_ORACLE['x2_knn_ivf']}),
tot AS (SELECT query_id, COUNT(*) AS n_exact FROM ex GROUP BY query_id),
hit AS (
  SELECT ex.query_id, COUNT(*) AS n_hit
  FROM ex JOIN ap ON ex.query_id = ap.query_id
                 AND ex.neighbor_id = ap.neighbor_id
  GROUP BY ex.query_id
)
SELECT tot.query_id,
       ROUND(CAST(COALESCE(hit.n_hit, 0) AS DOUBLE) / tot.n_exact, 6)
         AS recall
FROM tot LEFT JOIN hit ON tot.query_id = hit.query_id"""


_T40_PHRASE = (
    "held out eval question answer pairs must never leak into"
    " training data"
)


def q_t40_excise_contamination(spark, sf_dir):
    """Benchmark-span EXCISION (surgical decontamination): every 7th
    corpus doc carries a verbatim 12-token benchmark phrase; the op
    must cut exactly the leaked span and keep the rest of the document
    — t7/t32 flag, t40 repairs.  Corpus grams semi-join the
    benchmark's distinct 8-gram hashes (AQE-decided, never forced
    broadcast), hits expand to covered positions, reassembly is
    position-sorted."""
    from qctimeseries_spark.datapipe.text import (
        excise_contaminated_spans,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 1,
            F.concat(F.col("text"), F.lit(" " + _T40_PHRASE)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" " + _T40_PHRASE)).alias("text"),
    )
    return excise_contaminated_spans(corpus, bench, width=8)


DATAPIPE_QUERIES["t40_excise_contamination"] = q_t40_excise_contamination

_T40_GRAM = (
    "CAST(concat('0x', substr(md5(array_to_string("
    "list_slice(tkl, i + 1, i + 8), ' ')), 1, 15)) AS BIGINT)"
)
DATAPIPE_ORACLE["t40_excise_contamination"] = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 1
              THEN concat(text, ' {_T40_PHRASE}')
              ELSE text END AS text
  FROM documents WHERE doc_id % 50 != 0
),
bench AS (
  SELECT concat(text, ' {_T40_PHRASE}') AS text
  FROM documents WHERE doc_id % 50 = 0
),
tk AS (SELECT doc_id, {_TOKS.format(c='text')} AS tkl FROM corpus),
btk AS (SELECT {_TOKS.format(c='text')} AS tkl FROM bench),
bg AS (
  SELECT DISTINCT unnest(list_transform(
      range(0, CASE WHEN len(tkl) >= 8 THEN len(tkl) - 7 ELSE 0 END),
      i -> {_T40_GRAM})) AS gh
  FROM btk
),
g AS (
  SELECT doc_id,
         unnest(range(0, CASE WHEN len(tkl) >= 8
                              THEN len(tkl) - 7 ELSE 0 END)) AS pos,
         unnest(list_transform(
             range(0, CASE WHEN len(tkl) >= 8
                           THEN len(tkl) - 7 ELSE 0 END),
             i -> {_T40_GRAM})) AS gh
  FROM tk
),
cov AS (
  SELECT DISTINCT doc_id, tpos FROM (
    SELECT doc_id, pos + unnest(range(0, 8)) AS tpos
    FROM g WHERE gh IN (SELECT gh FROM bg))
),
tp AS (
  SELECT doc_id, unnest(tkl) AS tok, unnest(range(0, len(tkl))) AS tpos
  FROM tk
),
k AS (SELECT tp.* FROM tp ANTI JOIN cov USING (doc_id, tpos)),
r AS (
  SELECT doc_id,
         array_to_string(list(tok ORDER BY tpos), ' ') AS text_clean,
         COUNT(*) AS n_kept
  FROM k GROUP BY doc_id
),
t AS (SELECT doc_id, CAST(len(tkl) AS BIGINT) AS n_tokens FROM tk)
SELECT t.doc_id, COALESCE(r.text_clean, '') AS text_clean, n_tokens,
       CAST(n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN r USING (doc_id)"""


def q_x16_mmr_rerank(spark, sf_dir):
    """MMR-diversified rerank of the x1 brute-force candidate pool:
    top-5 per query trading relevance against redundancy (lam=0.5 —
    the integer-exact mode: the selection key is the BIGINT
    rel_q − max_sim_q in nano-units, so the greedy loop is
    integer-for-integer identical in the oracle's unrolled CTE
    chain).  One applyInPandas over query groups; the corpus is never
    rescanned."""
    from qctimeseries_spark.datapipe.similarity import (
        knn_bruteforce,
        mmr_rerank,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cand = knn_bruteforce(emb, queries, k=10)
    return mmr_rerank(cand, emb, k=5, lam=0.5)


DATAPIPE_QUERIES["x16_mmr_rerank"] = q_x16_mmr_rerank


def _mmr_oracle_sql(k: int) -> str:
    """Unrolled greedy MMR as CTEs (the t16/x14 precedent): step j
    scores every unselected candidate by the INTEGER key
    rel_q − max sim_q over the selected set and takes the argmax with
    an id tie-break."""
    fold = _cos_fold_sql("a.embedding", "b.embedding")
    parts = [f"""
cand AS ({DATAPIPE_ORACLE['x1_knn_bruteforce']}),
cv AS (
  SELECT c.query_id, c.neighbor_id, e.embedding
  FROM cand c JOIN embeddings e ON e.vec_id = c.neighbor_id
),
sim AS (
  SELECT a.query_id, a.neighbor_id AS ia, b.neighbor_id AS ib,
         CAST(FLOOR({fold} * 1000000000.0 + 0.5) AS BIGINT) AS sq
  FROM cv a JOIN cv b
    ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
),
rq AS (
  SELECT query_id, neighbor_id,
         CAST(FLOOR(cos * 1000000000.0 + 0.5) AS BIGINT) AS rel_q
  FROM cand
),
sel1 AS (
  SELECT query_id, neighbor_id, 1 AS rank, rel_q AS mmr_q FROM (
    SELECT rq.*, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rel_q DESC, neighbor_id) AS rn
    FROM rq) WHERE rn = 1
),
prev2 AS (SELECT query_id, neighbor_id FROM sel1)"""]
    for j in range(2, k + 1):
        parts.append(f""",
sel{j} AS (
  SELECT query_id, neighbor_id, {j} AS rank, key AS mmr_q FROM (
    SELECT r.query_id, r.neighbor_id, r.rel_q - m.ms AS key,
           ROW_NUMBER() OVER (PARTITION BY r.query_id
             ORDER BY r.rel_q - m.ms DESC, r.neighbor_id) AS rn
    FROM rq r
    JOIN (SELECT s.query_id, s.ia, MAX(s.sq) AS ms
          FROM sim s JOIN prev{j} p
            ON p.query_id = s.query_id AND p.neighbor_id = s.ib
          GROUP BY s.query_id, s.ia) m
      ON m.query_id = r.query_id AND m.ia = r.neighbor_id
    WHERE NOT EXISTS (SELECT 1 FROM prev{j} p2
                      WHERE p2.query_id = r.query_id
                        AND p2.neighbor_id = r.neighbor_id)
  ) WHERE rn = 1
)""")
        if j < k:
            parts.append(f""",
prev{j + 1} AS (
  SELECT query_id, neighbor_id FROM prev{j}
  UNION ALL SELECT query_id, neighbor_id FROM sel{j}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, mmr_q"
        f" FROM sel{j}" for j in range(1, k + 1)
    )
    return "WITH " + "".join(parts) + "\n" + union


DATAPIPE_ORACLE["x16_mmr_rerank"] = _mmr_oracle_sql(5)


def q_x17_knn_after_delete(spark, sf_dir):
    """Index-lifecycle DELETE: build the persisted IVF store, tombstone
    every 7th-mod-3 vector (one tiny id-list write — the cells/ store
    is untouched), and serve the same five queries: the anti-join
    applies BEFORE scoring, so top-k is over live vectors only and the
    result equals an x2 run whose corpus never contained the deleted
    ids (centroids stay the full-corpus seeds — deletion must not move
    the cell layout).  purge_ivf_tombstones' physical-rewrite
    equivalence is pinned by pytest."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.similarity import (
        build_ivf_index,
        delete_from_ivf_index,
        knn_query_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="qcts_ivfdel_")
    try:
        build_ivf_index(emb, tmp + "/index", nlist=16)
        delete_from_ivf_index(
            spark, tmp + "/index",
            emb.filter(F.col("vec_id") % 7 == 3).select("vec_id"),
        )
        out = knn_query_index(
            spark, tmp + "/index", queries, k=10, nprobe=4
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


DATAPIPE_QUERIES["x17_knn_after_delete"] = q_x17_knn_after_delete

# x17 oracle: x2's SQL with the tombstoned ids excluded from the
# CORPUS side only (centroids stay full-corpus seeds; queries stay).
DATAPIPE_ORACLE["x17_knn_after_delete"] = DATAPIPE_ORACLE[
    "x2_knn_ivf"
].replace(
    "  FROM embeddings e, cents\n),\nqcell",
    "  FROM embeddings e, cents\n  WHERE e.vec_id % 7 != 3\n),\nqcell",
    1,
)
assert (
    DATAPIPE_ORACLE["x17_knn_after_delete"]
    != DATAPIPE_ORACLE["x2_knn_ivf"]
), "x17 oracle derivation no-opped — x2's ccell tail was reworded"


def q_d13_dup_rate(spark, sf_dir):
    """Per-source duplicate-rate KPI over the planted-dup corpus
    (d1's corpus shifted into a synthetic 'mirror' source): corpus-wide
    exact fingerprints, min-id keepers, per-source excess share — the
    'which feeds send us copies' dashboard.  Two thin aggregations;
    text never shuffles."""
    from qctimeseries_spark.datapipe.dedup import dup_rate_by_group

    d = _docs(spark, sf_dir).select("doc_id", "source", "text")
    dups = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.lit("mirror").alias("source"),
            F.regexp_replace(F.upper("text"), " ", "  ").alias("text"),
        )
    )
    return dup_rate_by_group(d.unionByName(dups), "source")


DATAPIPE_QUERIES["d13_dup_rate"] = q_d13_dup_rate

DATAPIPE_ORACLE["d13_dup_rate"] = f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'mirror' AS source,
         replace(upper(text), ' ', '  ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
f AS (
  SELECT doc_id, source,
         {hash60_sql("array_to_string(" + _TOKS.format(c='text') + ", ' ')")}
           AS fingerprint
  FROM corpus
),
kp AS (SELECT fingerprint, MIN(doc_id) AS keeper FROM f GROUP BY fingerprint)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN doc_id != keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS n_excess,
       ROUND(CAST(SUM(CASE WHEN doc_id != keeper THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS dup_rate
FROM f JOIN kp USING (fingerprint)
GROUP BY source"""


def q_t41_stratified_sample(spark, sf_dir):
    """Per-source weighted corpus downsample: the 10 winners of the
    Efraimidis–Vitter exponential race WITHIN each source stratum,
    weight = n_chars — "keep N docs per source, quality-biased", the
    stratified twin of t30 (same hash axis and race key, so the same
    row gets the same es_key under both operators).  The per-group
    ranking is a window PARTITIONED by source — parallel across
    strata, no global sort, no single-task stage."""
    from qctimeseries_spark.datapipe.sample import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "source", "n_chars"),
        "n_chars",
        10,
        group_col="source",
        key_col="doc_id",
    )


DATAPIPE_QUERIES["t41_stratified_sample"] = q_t41_stratified_sample

# Stratified weighted sample: t30's A-Res race replayed per stratum —
# same u = (bucket+1)/M uniform over the 'qcts:' hash axis, key =
# ln(u)/weight rounded 9dp, top-10 per source by key desc with id
# tie-break (ROW_NUMBER PARTITION BY source).
DATAPIPE_ORACLE["t41_stratified_sample"] = f"""
WITH b AS (
  SELECT doc_id, source, n_chars,
         ({hash60_sql("concat('qcts:', CAST(doc_id AS VARCHAR))")})
           % 1000000 AS bucket
  FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL
    AND CAST(n_chars AS DOUBLE) > 0
),
k AS (
  SELECT doc_id, source, n_chars,
         ROUND(ln((bucket + 1) / 1000000.0)
               / CAST(n_chars AS DOUBLE), 9) AS es_key
  FROM b
),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY es_key DESC, doc_id) AS rk
      FROM k)
SELECT doc_id, source, n_chars, es_key, CAST(rk AS INT) AS sample_rank
FROM r WHERE rk <= 10"""


def q_st20_stream_stratified(spark, sf_dir):
    """Streaming stratified-sample maintenance: the documents corpus
    arrives as two planted micro-batches (even ids, then odd), each
    batch commits only its own per-source top-10 A-Res winners
    (sink_batch dirs — replay-exact), and the drained re-rank of the
    tiny union must be bit-identical to batch t41 over the whole
    corpus: the race key is a pure function of (seed, key, weight),
    so the global per-group top-n is contained in the union of
    per-batch top-ns (the _topk_exact inclusion argument with batches
    as shards).  The oracle is t41's SQL."""
    import os
    import shutil
    import tempfile

    from qctimeseries_spark.streaming import (
        stage_file_batches,
        stratified_sample_ingest_stream,
    )

    d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    tmp = tempfile.mkdtemp(prefix="qcts_st20_")
    try:
        src = os.path.join(tmp, "src")
        stage_file_batches(
            [d.filter(F.col("doc_id") % 2 == 0),
             d.filter(F.col("doc_id") % 2 == 1)],
            src,
        )
        stream = (
            spark.readStream
            .schema("doc_id bigint, source string, n_chars bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stratified_sample_ingest_stream(
            stream,
            os.path.join(tmp, "out"),
            weight_col="n_chars",
            n_per_group=10,
            group_col="source",
            key_col="doc_id",
            checkpoint_dir=os.path.join(tmp, "ckpt"),
        )
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


DATAPIPE_QUERIES["st20_stream_stratified"] = q_st20_stream_stratified
# drained streaming winner set == batch t41 over the union of batches
DATAPIPE_ORACLE["st20_stream_stratified"] = DATAPIPE_ORACLE[
    "t41_stratified_sample"
]


def q_x19_ivfpq_residual(spark, sf_dir):
    """RESIDUAL IVF-PQ (IVFADC, Jégou et al. PAMI'11 — FAISS's
    canonical IVFx,PQy layout), built then served: the coarse
    quantizer's unit centroid explains each vector's cell and the 8
    nibbles quantize only the within-cell residual û − ĉ — the
    clustered-corpus production layout (tight cells ⇒ small
    residuals; the uniform-data caveat is measured and pinned in
    test_ivfpq_residual_serve_and_tighter_reconstruction).
    ADC = the query's coarse dot against the cell's unit centroid
    PLUS the residual LUT chain (coarse term first — the oracle
    replays the identical left-to-right sum).  Candidate scan stays
    DPP-pruned at ~9 bytes/row; top-50 survivors re-rank at exact
    cosine."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.similarity import (
        build_ivfpq_residual_index,
        knn_query_ivfpq_residual,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="qcts_rpqidx_")
    try:
        build_ivfpq_residual_index(
            emb, tmp + "/idx", nlist=16, m=8, ksub=16
        )
        out = knn_query_ivfpq_residual(
            spark, tmp + "/idx", queries, k=10, nprobe=4, candidates=50
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


DATAPIPE_QUERIES["x19_ivfpq_residual"] = q_x19_ivfpq_residual

# x19: x8's oracle with the codebooks moved to RESIDUAL space — cells
# and probes are identical; seeds' residuals (unit vector minus the
# unit vector of the assigned centroid) become the codewords, codes
# quantize each vector's residual, and the ADC score prepends the
# query x unit-centroid coarse dot to the unrolled 8-term LUT chain
# (left-to-right, mirroring the engine's fold order exactly).
DATAPIPE_ORACLE["x19_ivfpq_residual"] = f"""
WITH u AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) / sqrt(
           list_reduce(list_transform(embedding,
             y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
             (p, q) -> p + q))) AS u
  FROM embeddings
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cid,
         embedding AS centv, vec_id AS seed_vid
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
ucent AS (
  SELECT c.cid, uu.u AS ucv
  FROM cents c JOIN u uu ON uu.vec_id = c.seed_vid
),
ccell AS (
  SELECT e.vec_id, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
),
home AS (SELECT vec_id, cid FROM ccell WHERE rk = 1),
res AS (
  SELECT v.vec_id,
         list_transform(range(1, 65),
                        i -> v.u[i] - uc.ucv[i]) AS r
  FROM u v
  JOIN home h ON h.vec_id = v.vec_id
  JOIN ucent uc ON uc.cid = h.cid
),
seeds AS (
  SELECT r.r, ROW_NUMBER() OVER (ORDER BY r.vec_id) - 1 AS c
  FROM res r ORDER BY r.vec_id LIMIT 16
),
cb AS (
  SELECT t.j, s.c,
         list_transform(range(1, 9), i -> s.r[t.j * 8 + i]) AS cw
  FROM seeds s, range(0, 8) t(j)
),
enc AS (
  SELECT vec_id, j, c FROM (
    SELECT v.vec_id, b.j, b.c,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, b.j ORDER BY
             list_reduce(list_transform(range(1, 9),
               i -> (v.r[b.j*8 + i] - b.cw[i])
                    * (v.r[b.j*8 + i] - b.cw[i])),
               (p, q) -> p + q), b.c) AS rk
    FROM res v, cb b)
  WHERE rk = 1
),
codes AS (SELECT vec_id, list(c ORDER BY j) AS pq FROM enc GROUP BY vec_id),
qcell AS (
  SELECT e.vec_id AS query_id, cents.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND({_cos_fold_sql('e.embedding', 'cents.centv')}, 9)
                    DESC, cents.cid) AS rk
  FROM embeddings e, cents
  WHERE e.vec_id < 5
),
lut AS (
  SELECT query_id, list(dot ORDER BY j, c) AS lut
  FROM (
    SELECT q.vec_id AS query_id, b.j, b.c,
           list_reduce(list_transform(range(1, 9),
             i -> q.u[b.j*8 + i] * b.cw[i]), (p, q) -> p + q) AS dot
    FROM u q, cb b WHERE q.vec_id < 5)
  GROUP BY query_id
),
cdot AS (
  SELECT q.vec_id AS query_id, uc.cid,
         list_reduce(list_transform(range(1, 65),
           i -> q.u[i] * uc.ucv[i]), (p, q) -> p + q) AS cd
  FROM u q, ucent uc WHERE q.vec_id < 5
),
sc AS (
  SELECT ql.query_id, cd.vec_id AS neighbor_id,
         ROUND(ct.cd
               + l.lut[0*16 + cd.pq[1] + 1]
               + l.lut[1*16 + cd.pq[2] + 1]
               + l.lut[2*16 + cd.pq[3] + 1]
               + l.lut[3*16 + cd.pq[4] + 1]
               + l.lut[4*16 + cd.pq[5] + 1]
               + l.lut[5*16 + cd.pq[6] + 1]
               + l.lut[6*16 + cd.pq[7] + 1]
               + l.lut[7*16 + cd.pq[8] + 1], 9) AS ascore
  FROM codes cd
  JOIN home ON home.vec_id = cd.vec_id
  JOIN (SELECT query_id, cid FROM qcell WHERE rk <= 4) ql
    ON ql.cid = home.cid
  JOIN lut l ON l.query_id = ql.query_id
  JOIN cdot ct ON ct.query_id = ql.query_id AND ct.cid = home.cid
  WHERE cd.vec_id != ql.query_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ascore DESC, neighbor_id) AS rk FROM sc)
  WHERE rk <= 50
),
r AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND({_cos_fold_sql('q.embedding', 'e.embedding')}, 9) AS cos
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.neighbor_id
  JOIN embeddings q ON q.vec_id = c.query_id
)
SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rk FROM r)
WHERE rk <= 10"""
