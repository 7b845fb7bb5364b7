"""Time-series joins Spark lacks as built-ins: as-of (nearest-prior)
join.

The reference package has no join operators (single-table model), but
any QC workflow that needs "the calibration/config/deployment record in
effect at each observation" reaches for an as-of join.  DuckDB ships it
natively (``ASOF JOIN``), which doubles as the oracle.

Scale design — the union trick, not a range self-join: a naive
``l JOIN r ON r.t <= l.t`` explodes to O(|l|·|r|) per key before
picking the max.  Instead both sides are unioned with a side tag and
sorted once per key; ``last(value, ignorenulls=True)`` over a
rows-unbounded-preceding window carries each right row's payload
forward to every later left row.  One shuffle on the ``by`` key, one
sort, zero row amplification — the plan a native as-of operator would
produce.  Skewed ``by`` keys behave like any windowed aggregation —
detect them with :func:`qctimeseries_spark.windows.hot_keys` and split
hot keys upstream (e.g. sub-key by coarse time range, as
:func:`~qctimeseries_spark.windows.sessionize_salted` does for
sessionization) if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    *,
    time_col: str,
    lo_col: str,
    hi_col: str,
    by: list[str] | str | None = None,
    bucket_hours: float = 24.0,
) -> DataFrame:
    """Point-in-interval join: left rows × intervals with
    ``lo <= t <= hi`` (plus optional ``by`` key equality).

    A raw inequality join degenerates to a (per-key) nested loop.  The
    bucketing trick turns it into an equi-join: every interval explodes
    to the coarse time buckets it overlaps (tiny — intervals/bucket
    span, not rows), left rows carry their single bucket, and the join
    key becomes (by, bucket) with the exact BETWEEN as a post-filter.
    Each (row, interval) pair meets in exactly one bucket — the row's
    own — so no dedup stage is needed.  Shuffle volume is bounded by
    bucket co-location instead of |left| × |intervals|; pick
    ``bucket_hours`` ≈ the typical interval length.
    """
    from qctimeseries_spark.windows import _floor_div_sql

    by = [by] if isinstance(by, str) else list(by or [])
    width_us = round(float(bucket_hours) * 3600.0 * 1_000_000)
    l_bucket = F.expr(_floor_div_sql(f"unix_micros(`{time_col}`)", width_us))
    i_lo = F.expr(_floor_div_sql(f"unix_micros(`{lo_col}`)", width_us))
    i_hi = F.expr(_floor_div_sql(f"unix_micros(`{hi_col}`)", width_us))
    lb = left.withColumn("_rj_bucket", l_bucket)
    ib = intervals.withColumn(
        "_rj_bucket", F.explode(F.sequence(i_lo, i_hi))
    )
    out = lb.join(ib, [*by, "_rj_bucket"]).filter(
        F.col(time_col).between(F.col(lo_col), F.col(hi_col))
    )
    return out.drop("_rj_bucket")


#: row cap for the keyless (global-window) as-of path — with no ``by``
#: key the carry-forward window has no partitioning and the entire
#: union funnels through ONE task; fine for reference tables, a
#: scale-killer on fact-sized inputs.
MAX_GLOBAL_ASOF_ROWS = 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | str | None = None,
    tolerance_seconds: float | None = None,
    right_prefix: str = "r_",
    allow_global: bool = False,
    max_global_rows: int = MAX_GLOBAL_ASOF_ROWS,
) -> DataFrame:
    """Left as-of join: each left row gains the payload of the most
    recent right row with ``right.on <= left.on`` (per ``by`` key).

    Right payload columns are prefixed with ``right_prefix``; a
    ``<prefix><on>`` column carries the matched right timestamp.  With
    ``tolerance_seconds``, matches older than the tolerance are nulled
    (pandas ``merge_asof(tolerance=...)`` semantics).  Ties on the time
    column match (at-or-before).

    Without ``by`` the ordered window is GLOBAL — one task sorts the
    whole union, the same single-partition funnel the two-phase rowid
    design avoids elsewhere.  That path is therefore guarded like
    ``embedding_dup_pairs``: above ``max_global_rows`` it raises unless
    ``allow_global=True``, pointing at a ``by`` key as the scale path.
    The probe is a ``limit(cap+1)`` scan of one thin column, so it
    stops as soon as the cap is exceeded instead of counting the world.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if not by and not allow_global:
        probe = left.select(F.lit(1).alias("_1")).unionAll(
            right.select(F.lit(1).alias("_1"))
        )
        if probe.limit(max_global_rows + 1).count() > max_global_rows:
            raise ValueError(
                f"asof_join without a `by` key sorts the entire union in a"
                f" single task and the input exceeds {max_global_rows} rows;"
                " pass a `by` key to partition the work, or"
                " allow_global=True to accept the single-partition sort"
            )
    payload = [c for c in right.columns if c != on and c not in by]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns {sorted(overlap)} collide with left;"
            f" rename or rely on right_prefix before joining"
        )

    # tag sides; right rows sort BEFORE left rows at equal timestamps so
    # an exact-time record matches its own instant (at-or-before)
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        F.col(on).alias(f"{right_prefix}{on}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
    )
    l = left.withColumn("_side", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
        if by
        else Window.orderBy(F.col(on).asc(), F.col("_side").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    carried = [f"{right_prefix}{on}"] + [f"{right_prefix}{c}" for c in payload]
    for c in carried:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = merged.filter(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        # one projection: the staleness test reads the ORIGINAL matched
        # timestamp for every column (sequential withColumn would null
        # the timestamp first and blind the later checks)
        age = F.unix_micros(F.col(on)) - F.unix_micros(
            F.col(f"{right_prefix}{on}")
        )
        stale: Column = age > int(tolerance_seconds * 1_000_000)
        out = out.select(
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                if c in carried
                else F.col(c)
                for c in out.columns
            ]
        )
    return out
