"""Similarity search over an embedding column (``array<float>``).

- :func:`knn_bruteforce` — exact top-k cosine per query.  The query set
  is broadcast (it is small by definition); the big side streams —
  one narrow pass + a per-query top-k shuffle.  This is the correctness
  baseline and the right plan whenever |queries| × |corpus| work fits
  the cluster.
- :func:`ivf_assign` / :func:`knn_ivf` — the scale path: partition the
  corpus into ``nlist`` Voronoi cells around deterministic centroids
  (IVF); a query probes only ``nprobe`` nearest cells, cutting scanned
  rows by ~nlist/nprobe.  Centroid assignment is a broadcast argmin —
  no shuffle beyond the final top-k.

Everything is pure Catalyst (``zip_with``/``aggregate`` fold for the
dot product) — no Python on the scan path.  A vectorized pandas_udf
drop-in would only pay off once SIMD beats codegen on very wide
vectors; for d ≤ a few hundred the HOF fold stays JVM-side and wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qctimeseries_spark.datapipe.dedup import cosine


def _norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``broadcast(queries)`` makes the join a map-side nested loop over
    the corpus partitions (no shuffle of the big side); ranking is a
    per-query window — one shuffle on query_id, each group holding at
    most |corpus| rows locally reduced by the window's top-k sort.
    Rank on the 9-dp-rounded cosine with id tie-break so ordering is
    reproducible across engines and float summation orders.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 9))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids (cosine).

    Centroids are broadcast (nlist is small); the argmin is a row-local
    fold over the collected centroid array — zero shuffle.  With
    ``nprobe=1`` this is the build-side cell assignment; with
    ``nprobe>1`` it is the query-side multi-probe expansion.
    """
    cent = centroids.select(
        F.col(centroid_id_col).alias("cid"), F.col(vec_col).alias("centv")
    )
    # collect centroids into one array column via a broadcast single-row
    # frame — keeps the argmin row-local instead of a join+window.
    carr = cent.agg(
        F.collect_list(F.struct("cid", "centv")).alias("cents")
    )
    scored = df.crossJoin(F.broadcast(carr)).select(
        F.col(id_col),
        F.col(vec_col),
        F.slice(
            F.array_sort(
                F.transform(
                    F.col("cents"),
                    lambda c: F.struct(
                        (-F.round(cosine(F.col(vec_col), c["centv"]), 9)).alias(
                            "neg_cos"
                        ),
                        c["cid"].alias("cid"),
                    ),
                )
            ),
            1,
            nprobe,
        ).alias("probes"),
    )
    return scored.select(
        id_col,
        vec_col,
        F.explode(F.transform(F.col("probes"), lambda p: p["cid"])).alias(
            "centroid_id"
        ),
    )


def take_centroids(corpus: DataFrame, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", nlist: int = 16,
                   refine: int = 0) -> DataFrame:
    """Centroids for the IVF index: deterministic id seed, optionally
    Lloyd-refined.

    ``refine=0`` (default) returns the ``nlist`` lowest-id vectors —
    fully reproducible, which is what lets the x2 query keep a complete
    DuckDB oracle.  ``refine=N`` runs N spherical-k-means iterations:
    assign every vector to its nearest centroid (broadcast argmin, no
    shuffle), recompute each cell's element-wise mean (one
    posexplode + groupBy(cell, dim) aggregation — the shuffle payload
    is nlist × d doubles regardless of corpus size), renormalize to the
    unit sphere, and keep the previous centroid for any emptied cell.
    Refinement's measured effect depends on the data: on clustered
    corpora it tightens cells around real modes (higher recall at fixed
    ``nprobe``); on the near-uniform synthetic test embeddings recall
    is flat while cell-size spread shrinks (sf0.01, 3 iterations:
    min/max 20/42 → 23/38) — at scale that balance IS the win, since
    the per-cell pairing join's skew follows the largest cell.  Note
    per-cell float-mean summation order makes refined centroids
    runtime-dependent in the last bits, so refined indexes are for
    production quality, not the bit-exact oracle path.
    """
    cents = (
        corpus.orderBy(id_col)
        .limit(nlist)
        .select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .cast("int")
            .alias("centroid_id"),
            F.col(id_col).alias("seed_id"),
            F.col(vec_col),
        )
    )
    for _ in range(refine):
        assigned = ivf_assign(
            corpus, cents, id_col=id_col, vec_col=vec_col, nprobe=1
        )
        dims = assigned.select(
            "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "x")
        )
        means = (
            dims.groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "centroid_id",
                F.transform(F.col("pm"), lambda s: s["m"]).alias("_mean"),
            )
        )
        norm = F.sqrt(
            F.aggregate(
                F.col("_mean"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        moved = means.select(
            "centroid_id",
            F.transform(F.col("_mean"), lambda x: x / norm).alias("_new"),
        )
        cents = (
            cents.join(F.broadcast(moved), "centroid_id", "left")
            .select(
                "centroid_id",
                "seed_id",
                F.coalesce(
                    F.col("_new"), F.col(vec_col).cast("array<double>")
                ).alias(vec_col),
            )
        )
    return cents


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    refine: int = 0,
) -> DataFrame:
    """Approximate top-k: IVF cell restriction, then exact rank within
    probed cells.

    Plan: corpus→cell assignment (broadcast argmin, narrow);
    query→nprobe cells (same); equi-join on ``centroid_id`` replaces
    the all-pairs join — scanned work drops to ~nprobe/nlist of brute
    force, the recall/cost dial of a classic IVF index.  ``refine``
    passes through to :func:`take_centroids` (Lloyd iterations).
    """
    cents = take_centroids(
        corpus, id_col=id_col, vec_col=vec_col, nlist=nlist, refine=refine
    )
    c_cells = ivf_assign(
        corpus, cents, id_col=id_col, vec_col=vec_col, nprobe=1
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "centroid_id",
    )
    q_cells = ivf_assign(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col)),
        cents,
        id_col="query_id",
        vec_col=vec_col,
        nprobe=nprobe,
    ).select("query_id", F.col(vec_col).alias("qv"), "centroid_id")
    scored = (
        c_cells.join(F.broadcast(q_cells), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 9))
        # a vector probed via several cells appears once per cell
        .select("query_id", "neighbor_id", "cos")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    *,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall of an approximate kNN result against the exact
    one: ``|approx ∩ exact| / |exact|`` over the neighbor sets.

    The evaluation an IVF/LSH index needs before its ``nprobe``/banding
    knobs can be trusted at scale.  Fully distributed — an equi-join on
    (query, neighbor) plus two thin groupBys; never collects, so it
    runs over millions of held-out queries as easily as five.  Corpus
    recall = ``result.agg(F.avg("recall"))``.
    """
    e = exact.select(query_col, neighbor_col)
    a = approx.select(query_col, neighbor_col)
    totals = e.groupBy(query_col).agg(F.count(F.lit(1)).alias("_n_exact"))
    hits = (
        e.join(a, [query_col, neighbor_col])
        .groupBy(query_col)
        .agg(F.count(F.lit(1)).alias("_n_hit"))
    )
    return totals.join(hits, query_col, "left").select(
        query_col,
        F.round(
            F.coalesce(F.col("_n_hit"), F.lit(0)).cast("double")
            / F.col("_n_exact"),
            6,
        ).alias("recall"),
    )
