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
import json as _json
import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "qc_part"

#: commit manifest sitting next to the partition directories — records a
#: monotonically increasing table version plus the version that last
#: wrote each partition, so interleaved writers can DETECT clobbering
#: (optimistic concurrency).  Detection, not transactions: the
#: read-check-write itself is not atomic — a table format with ACID
#: MERGE (Delta/Iceberg) is the production answer; this closes the
#: silent-clobber hole for the reference's save/resume workflow.
MANIFEST = "_qc_commit.json"


class StaleCommitError(RuntimeError):
    """A commit's base version predates another writer's commit to one
    of the partitions it touches."""


def _read_manifest(path: str) -> dict:
    f = _os.path.join(path, MANIFEST)
    if not _os.path.isfile(f):
        return {"version": 0, "full_version": 0, "parts": {}}
    with open(f) as fh:
        return _json.load(fh)


def _write_manifest(path: str, m: dict) -> None:
    tmp = _os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        _json.dump(m, fh)
    _os.replace(tmp, _os.path.join(path, MANIFEST))  # atomic on POSIX


def _part_version(m: dict, part: int) -> int:
    """Version that last wrote ``part`` (full rewrites count for all)."""
    return max(int(m["parts"].get(str(part), 0)), int(m["full_version"]))


def _check_part_hours(m: dict, part_hours: int, path: str) -> None:
    """Refuse an incremental commit whose bucket width disagrees with
    the table's recorded one: ``qc_part`` values from a different
    ``part_hours`` never collide with the existing partitions, so
    dynamic partition overwrite would ADD a parallel layout instead of
    replacing rows — every committed row silently duplicated (found by
    the r10 contended-commit test: a 720 h commit onto a 48 h table
    doubled the edited rows).  Tables saved before the manifest carried
    ``part_hours`` skip the check."""
    saved = m.get("part_hours")
    if saved is not None and int(saved) != int(part_hours):
        raise ValueError(
            f"state table {path} is bucketed at part_hours={saved} but the"
            f" commit was staged at part_hours={part_hours}; mismatched"
            " widths write a second partition layout (duplicating rows) —"
            " pass the table's width, or save_state a full rewrite to"
            " re-bucket"
        )


def state_version(path: str) -> int:
    """Current table version — pass as ``base_version`` to a later
    :func:`commit_state` to detect concurrent-writer clobbering."""
    return int(_read_manifest(path)["version"])


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
    prev = _read_manifest(path) if _os.path.isdir(path) else None
    (
        df.withColumn(PART_COL, _part_expr(time_col, part_hours))
        .write.partitionBy(PART_COL)
        .mode(mode)
        .option("compression", "zstd")
        .parquet(path)
    )
    # a full overwrite wipes the directory (manifest included) — carry
    # the counter forward so versions stay monotonic across rewrites.
    # part_hours is recorded so incremental commits can refuse a
    # mismatched bucket width (see _check_part_hours).
    v = (int(prev["version"]) if prev else 0) + 1
    _write_manifest(
        path,
        {"version": v, "full_version": v, "parts": {},
         "part_hours": int(part_hours)},
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
    base_version: int | None = None,
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

    Concurrent-writer detection: pass ``base_version`` (from
    :func:`state_version` at session load) and the commit fails with
    :class:`StaleCommitError` if another writer has since committed to
    any of the partitions this commit touches — two sessions editing
    DISJOINT time ranges still both land.  With the default
    ``base_version=None`` the check is off (single-writer, reference
    semantics).

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
    manifest = _read_manifest(path)
    _check_part_hours(manifest, part_hours, path)
    if base_version is not None:
        conflicts = {
            p for p in parts if _part_version(manifest, p) > base_version
        }
        if conflicts:
            raise StaleCommitError(
                f"commit based on version {base_version} touches partitions"
                f" {sorted(conflicts)} already rewritten at version"
                f" {manifest['version']}; reload the state and re-apply"
            )
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
    v = int(manifest["version"]) + 1
    manifest["version"] = v
    for p in parts:
        manifest["parts"][str(p)] = v
    _write_manifest(path, manifest)


def checkpoint_state(
    df: DataFrame,
    path: str,
    *,
    time_col: str,
    part_hours: int = 720,
    changed: list[tuple[_dt.datetime, _dt.datetime]] | None = None,
    base_version: int | None = None,
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
        df, path, time_col=time_col, part_hours=part_hours, changed=changed,
        base_version=base_version,
    )
    return load_state(df.sparkSession, path).drop(PART_COL)


# ---------------------------------------------------------------------------
# bucketed state tables: shuffle-free rowid joins
# ---------------------------------------------------------------------------


def save_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str = "rowid",
    buckets: int = 256,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist a table hash-bucketed (and per-file sorted) on
    ``bucket_col`` so every later equi-join or groupBy on that key reads
    pre-partitioned, pre-sorted files instead of shuffling.

    This is the scale answer to SURVEY.md §4's flag-state sidecar: keep
    the immutable base series bucketed by ``rowid`` and the compact
    ``(rowid, flag)`` sidecar bucketed the same way, and the
    reassembling join plans as a zero-Exchange sort-merge join — the
    100 TB base table is never shuffled to apply a flag overlay, and
    with ``sort=True`` not even re-sorted (sort elision additionally
    needs ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``;
    exchange elision is unconditional).  The same layout serves the
    U-op selection joins (P10 brushed-rowid sets) and any periodic
    compaction merge.

    Bucketing metadata lives in the session catalog (``saveAsTable``) —
    a plain ``.parquet(path)`` write cannot record it.  Pass ``path``
    to control file placement (external table); both sides of a join
    must use the SAME bucket count for the exchange-free plan.

    The write repartitions on ``bucket_col`` first, for two reasons
    that only matter at scale: without it every task writes a file per
    bucket it sees (10k tasks × 256 buckets = 2.5M files), and Spark
    only trusts the ``sortBy`` layout on read — eliding the join-side
    Sort — when each bucket is exactly one file.  ``repartition`` and
    ``bucketBy`` share Spark's Murmur3 bucketing hash, so each write
    task holds exactly one bucket's rows.
    """
    w = (
        df.repartition(buckets, F.col(bucket_col))
        .write.format("parquet")
        .mode("overwrite")
        .option("compression", "zstd")
        .bucketBy(buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a :func:`save_bucketed` table with its bucket layout intact
    (``spark.table`` — a raw ``read.parquet`` of the same files would
    drop the bucketing metadata and re-shuffle on join)."""
    return spark.table(table)


def compact_state(
    spark: SparkSession,
    path: str,
    *,
    files_per_partition: int = 1,
    parts: list[int] | None = None,
    base_version: int | None = None,
) -> None:
    """Rewrite state partitions down to ``files_per_partition`` files
    each — the maintenance pass that keeps scan efficiency after many
    incremental commits or streaming upserts have fragmented a
    partition into small files (at scale, file-open overhead and
    row-group fragmentation dominate reads long before data volume
    does).

    ``parts`` limits the rewrite to specific ``qc_part`` buckets (e.g.
    the recent hot ones); None compacts every partition.  Runs through
    the same dynamic-partition-overwrite + manifest path as
    :func:`commit_state`, so untouched partitions keep their files
    byte-identical, the table version advances, and concurrent-writer
    detection (``base_version``) applies.  Row content is preserved
    exactly — this only re-buckets bytes into fewer files.
    """
    df = load_state(spark, path)
    if parts is not None:
        df = df.filter(F.col(PART_COL).isin([int(p) for p in parts]))
    manifest = _read_manifest(path)
    touched = (
        [int(p) for p in parts]
        if parts is not None
        else [int(r[0]) for r in df.select(PART_COL).distinct().collect()]
    )
    if base_version is not None:
        conflicts = {
            p for p in touched if _part_version(manifest, p) > base_version
        }
        if conflicts:
            raise StaleCommitError(
                f"compaction based on version {base_version} touches"
                f" partitions {sorted(conflicts)} already rewritten at"
                f" version {manifest['version']}; reload and retry"
            )
    (
        df.repartition(
            max(1, len(touched) * files_per_partition), F.col(PART_COL)
        )
        .write.partitionBy(PART_COL)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", "zstd")
        .parquet(path)
    )
    v = int(manifest["version"]) + 1
    manifest["version"] = v
    for p in touched:
        manifest["parts"][str(p)] = v
    _write_manifest(path, manifest)
