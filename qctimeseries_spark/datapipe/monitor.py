"""Distribution drift monitoring between corpus snapshots.

The production question "did this week's crawl shift?" is asked of
every continuously-ingested training corpus; the standard screen is
the Population Stability Index over a bucketed feature distribution:

    PSI = Σ_buckets (p_cur − p_ref) · ln(p_cur / p_ref)

with the conventional reading ≲0.1 stable / 0.1–0.25 drifting / >0.25
shifted.  PSI is computed per feature bucket, so it is two thin
aggregations regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: share floor for empty buckets — the conventional PSI epsilon, keeps
#: ln() finite when a bucket is present in one snapshot only
PSI_EPS = 1e-6


def _bucketize(col, edges: list[float]):
    """Bucket id by explicit edges: 0 for x < e0, i for e_{i-1} ≤ x <
    e_i, len(edges) for x ≥ last.  Explicit edges (not quantiles) keep
    the bucketing deterministic across snapshots and engines."""
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        expr = F.when(col < F.lit(float(edges[i])), F.lit(i)).otherwise(expr)
    return expr


def population_stability(
    current: DataFrame,
    reference: DataFrame,
    value_col: str,
    edges: list[float],
    *,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-bucket PSI contributions of ``current`` vs ``reference``
    over ``value_col``, bucketed by the explicit ``edges``.

    Returns one row per bucket: ``bucket``, ``share_cur``,
    ``share_ref`` (6-dp), and ``psi`` (6-dp contribution; total PSI =
    ``sum(psi)``).  NULL values are excluded from both sides (they are
    a separate completeness signal — track them with the A-family
    progress checks).  Empty buckets take the conventional ``PSI_EPS``
    share floor so a bucket present in only one snapshot contributes a
    large-but-finite term.

    Scale shape: one groupBy per snapshot over ≤ len(edges)+1 groups,
    a broadcast-sized join, and pure projections — corpus size only
    affects the two counting scans.  Shares are exact integer-count
    ratios; ``ln`` is the one libm call, so cross-engine comparisons
    round to 6 dp (the repo's float-compare discipline).
    """

    def shares(df: DataFrame, out: str) -> DataFrame:
        b = df.filter(F.col(value_col).isNotNull()).select(
            _bucketize(F.col(value_col), edges).alias(bucket_col)
        )
        counts = b.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("_n"))
        total = counts.agg(F.sum("_n").alias("_tot"))
        return counts.crossJoin(F.broadcast(total)).select(
            bucket_col,
            (F.col("_n").cast("double") / F.col("_tot")).alias(out),
        )

    cur = shares(current, "share_cur")
    ref = shares(reference, "share_ref")
    all_buckets = current.sparkSession.range(0, len(edges) + 1).select(
        F.col("id").cast("int").alias(bucket_col)
    )
    eps = F.lit(PSI_EPS)
    p = F.greatest(F.coalesce(F.col("share_cur"), F.lit(0.0)), eps)
    q = F.greatest(F.coalesce(F.col("share_ref"), F.lit(0.0)), eps)
    return (
        all_buckets.join(F.broadcast(cur), bucket_col, "left")
        .join(F.broadcast(ref), bucket_col, "left")
        .select(
            bucket_col,
            F.round(F.coalesce(F.col("share_cur"), F.lit(0.0)), 6).alias(
                "share_cur"
            ),
            F.round(F.coalesce(F.col("share_ref"), F.lit(0.0)), 6).alias(
                "share_ref"
            ),
            F.round((p - q) * F.log(p / q), 6).alias("psi"),
        )
    )


def embedding_drift(
    reference: DataFrame,
    current: DataFrame,
    vec_col: str = "embedding",
    *,
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-dimension embedding drift between two snapshots: the mean
    vector of each snapshot and the absolute per-dimension shift.

    The embedding-space counterpart of :func:`population_stability`:
    a retrained/swapped encoder, a crawl-source mix change, or a
    pipeline bug (zeroed dims, scale change) all move the mean vector
    long before they show up in downstream evals.  Dimensions with
    large ``shift`` localize the change.

    Scale shape: ``posexplode`` fans each vector into (dim, value)
    pairs that partial-aggregate map-side into at most ``dim`` groups
    per task, so the one shuffle carries ~dim rows per partition no
    matter the corpus size; the snapshot join is dim-rows wide.
    Cross-engine exactness: values quantize to integer
    ``1/quant``-units (round-half-up) BEFORE the sum, so the grouped
    sum is exact integer math and each mean is one correctly-rounded
    division (the x11/t27 precedent).
    """

    def dim_sums(df: DataFrame, tag: str) -> DataFrame:
        v = F.col("_v").cast("double")
        return (
            df.select(F.posexplode(F.col(vec_col)).alias("dim", "_v"))
            .select(
                "dim",
                F.floor(v * F.lit(float(quant)) + F.lit(0.5))
                .cast("bigint")
                .alias("_q"),
            )
            .groupBy("dim")
            .agg(
                F.sum("_q").alias(f"_s_{tag}"),
                F.count(F.lit(1)).cast("bigint").alias(f"n_{tag}"),
            )
        )

    ref = dim_sums(reference, "ref")
    cur = dim_sums(current, "cur")
    mean_ref = F.col("_s_ref") / (
        F.col("n_ref").cast("double") * F.lit(float(quant))
    )
    mean_cur = F.col("_s_cur") / (
        F.col("n_cur").cast("double") * F.lit(float(quant))
    )
    return (
        ref.join(cur, "dim")
        .select(
            "dim",
            "n_ref",
            "n_cur",
            F.round(mean_ref, 9).alias("mean_ref"),
            F.round(mean_cur, 9).alias("mean_cur"),
            F.round(F.abs(mean_cur - mean_ref), 9).alias("shift"),
        )
    )
