"""Persisted QC session state: partitioned Parquet + pruned slice reads.

The reference mutates a data.table in place and saves RData snapshots
(`R/qc_window_app.R:363`, `vignettes/overall_workflow.Rmd:162-165`).
Our equivalent (SURVEY.md §4): flag updates are lazy ``when()`` overlays
on an immutable DataFrame; ``checkpoint_state`` materializes the
accumulated overlays to Parquet and returns a fresh lineage — the
commit point of the interactive session.

Scale design: state is written partitioned by a coarse time bucket
(``qc_part``, default 30 days), so the app's one-window-at-a-time reads
(`R/qc_window_app.R:4-6` — "smooth interaction even with millions of
rows") become partition-pruned scans: a 168 h window touches at most
two partitions of a 100 TB table, and Parquet row-group min/max stats
on the time column prune within them.  Writes co-partition flags with
values, so no join is ever needed to reassemble state.
"""

from __future__ import annotations

import datetime as _dt
import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "qc_part"


def _part_expr(time_col: str, part_hours: int):
    """Partition bucket = FLOOR division of µs by the bucket width.

    Floor (via :func:`~qctimeseries_spark.windows._floor_div_sql`), not
    ``DIV``: ``slice_state`` derives its pruning range with Python
    ``//`` (floor), and the two must agree for pre-1970 timestamps —
    ``DIV`` truncates toward zero and lands those rows one bucket off,
    silently excluding them from pruned reads.
    """
    from qctimeseries_spark.windows import _floor_div_sql

    width_us = part_hours * 3600 * 1_000_000
    return F.expr(
        _floor_div_sql(f"unix_micros(`{time_col}`)", width_us)
    ).cast("int")


def save_state(
    df: DataFrame,
    path: str,
    *,
    time_col: str,
    part_hours: int = 720,
    mode: str = "overwrite",
) -> None:
    """Write QC state partitioned by a coarse epoch-anchored time bucket.

    ``part_hours=720`` (30 days) keeps partition counts sane at decade
    spans while still letting week-scale window reads prune >97% of a
    long series.  Epoch-anchored (unlike the min(t)-anchored QC windows)
    so appends never re-bucket existing data.
    """
    (
        df.withColumn(PART_COL, _part_expr(time_col, part_hours))
        .write.partitionBy(PART_COL)
        .mode(mode)
        .option("compression", "zstd")
        .parquet(path)
    )


def load_state(spark: SparkSession, path: str) -> DataFrame:
    """Reload persisted state (keeps ``qc_part`` for pruned slicing)."""
    return spark.read.parquet(path)


def slice_state(
    df: DataFrame,
    time_col: str,
    lo: _dt.datetime,
    hi: _dt.datetime,
    *,
    part_hours: int = 720,
    whole_partitions: bool = False,
) -> DataFrame:
    """Time-range slice with explicit partition pruning.

    Spark does not infer partition predicates from data-column
    predicates, so the ``qc_part`` range filter is derived here from the
    same arithmetic ``save_state`` used — ``.explain`` shows it under
    PartitionFilters while the ``time_col`` bounds push to row-group
    stats.  ``whole_partitions=True`` keeps EVERY row of the touched
    partitions (no row-level time filter) — what a partition-rewriting
    merge needs to collect the survivors it must re-write.
    """
    width_us = part_hours * 3600 * 1_000_000
    lo_us = int(lo.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
    hi_us = int(hi.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
    p_lo, p_hi = lo_us // width_us, hi_us // width_us
    pred = F.col(PART_COL).between(int(p_lo), int(p_hi))
    if not whole_partitions:
        t = F.col(time_col)
        pred = pred & (t >= F.lit(lo)) & (t < F.lit(hi))
    return df.filter(pred)


def commit_state(
    df: DataFrame,
    path: str,
    *,
    time_col: str,
    part_hours: int = 720,
    changed: list[tuple[_dt.datetime, _dt.datetime]] | None = None,
) -> None:
    """Incremental state commit: rewrite ONLY the partitions whose time
    range intersects ``changed`` (MERGE-lite via Spark's dynamic
    partition overwrite).

    A full overwrite re-writes every partition of a 100 TB table to
    persist a one-window flag edit; here the staged frame is filtered
    to the touched ``qc_part`` buckets and
    ``partitionOverwriteMode=dynamic`` replaces exactly the partitions
    present in it, leaving every other partition's files untouched.
    Falls back to a full :func:`save_state` when ``changed`` is None
    (unknown extent) or the target does not exist yet.

    Correctness relies on an engine invariant: QC updates only rewrite
    flag columns, never ``time_col``, so a row can never migrate
    between partitions.
    """
    if changed is None or not _os.path.isdir(path):
        save_state(df, path, time_col=time_col, part_hours=part_hours)
        return
    if not changed:
        return  # clean session: nothing to write
    width_us = part_hours * 3600 * 1_000_000
    parts: set[int] = set()
    for lo, hi in changed:
        lo_us = int(lo.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
        hi_us = int(hi.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
        parts.update(range(lo_us // width_us, hi_us // width_us + 1))
    staged = df.withColumn(PART_COL, _part_expr(time_col, part_hours)).filter(
        F.col(PART_COL).isin(sorted(parts))
    )
    (
        staged.write.partitionBy(PART_COL)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", "zstd")
        .parquet(path)
    )


def checkpoint_state(
    df: DataFrame,
    path: str,
    *,
    time_col: str,
    part_hours: int = 720,
    changed: list[tuple[_dt.datetime, _dt.datetime]] | None = None,
) -> DataFrame:
    """Materialize accumulated flag-update overlays and restart lineage.

    The interactive session's U-ops stack ``when()`` overlays; hundreds
    of stacked projections slow planning and executor codegen.  A
    checkpoint compacts them into files and returns a plan one scan
    deep — the reference's "return the mutated table" moment
    (`R/qc_window_app.R:445`) made durable.  Pass ``changed`` time
    ranges to commit incrementally (:func:`commit_state`).
    """
    commit_state(
        df, path, time_col=time_col, part_hours=part_hours, changed=changed
    )
    return load_state(df.sparkSession, path).drop(PART_COL)
