"""Export sinks: CSV(.gz) / Parquet / chunked XLSX / checksums.

Reference: ``qc_write_exports`` ``R/qc_exports.R:25-148`` (S3–S9 in
SURVEY.md §2.1).  Writes the "qc" variant (with flags) and the "clean"
variant (flags applied per P4, flag columns dropped).
"""

from __future__ import annotations

import hashlib
import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qctimeseries_spark.flags import apply_flags
from qctimeseries_spark.schema import DEFAULT_SUFFIX

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def smart_stem(name: str) -> str:
    """S9 export stem: strip trailing ``_qc`` / ``_clean``
    (``R/qc_exports.R:45-52``)."""
    return re.sub(r"(_qc|_clean)+$", "", name)


def iso_utc(df: DataFrame, time_col: str) -> DataFrame:
    """F5: render the time column as ISO-8601 UTC text
    (``R/qc_exports.R:61-66``).  Session timezone should be UTC; the
    engine stores UTC and converts at edges only (SURVEY.md §7.4)."""
    return df.withColumn(time_col, F.date_format(F.col(time_col), ISO_FMT))


def write_exports(
    df: DataFrame,
    out_dir: str,
    stem: str,
    *,
    time_col: str,
    suffix: str = DEFAULT_SUFFIX,
    write_csv: bool = True,
    csv_compress: bool = True,
    na_csv: str = "NA",
    write_parquet: bool = True,
    parquet_compression: str = "zstd",
    write_xlsx: bool = False,
    xlsx_order_by: list[str] | None = None,
    checksums: bool = True,
) -> dict[str, list[str]]:
    """Write qc + clean variants in the requested formats; returns
    {format: [paths]}.  CSV renders time as ISO-8601 UTC with a
    configurable NA marker (S3, ``R/qc_exports.R:71-79``); Parquet
    defaults to zstd (S4, ``R/qc_exports.R:35,82-89``); XLSX chunks at
    1,048,576 rows/sheet (S5, ``R/qc_exports.R:92-122``) via a
    driver-side pandas writer — an out-of-engine sink by nature."""
    stem = smart_stem(stem)
    variants = {
        "qc": df,
        "clean": apply_flags(df, suffix=suffix, drop_flags=True),
    }
    written: dict[str, list[str]] = {}
    for tag, data in variants.items():
        base = os.path.join(out_dir, f"{stem}_{tag}")
        if write_csv:
            path = base + "_csv"
            (
                iso_utc(data, time_col)
                .write.mode("overwrite")
                .option("header", True)
                .option("nullValue", na_csv)
                .option("compression", "gzip" if csv_compress else "none")
                .csv(path)
            )
            written.setdefault("csv", []).append(path)
        if write_parquet:
            path = base + "_parquet"
            data.write.mode("overwrite").option(
                "compression", parquet_compression
            ).parquet(path)
            written.setdefault("parquet", []).append(path)
        if write_xlsx:
            written.setdefault("xlsx", []).extend(
                _write_xlsx(data, base, xlsx_order_by)
            )
    if checksums:
        written["checksums"] = [_write_checksums(out_dir, stem, written)]
    return written


_XLSX_MAX_ROWS = 1_048_576  # per-sheet cap, R/qc_exports.R:99


def _with_chunk_ids(
    df: DataFrame, order_by: list[str] | None, cap: int = _XLSX_MAX_ROWS
) -> tuple[DataFrame, DataFrame]:
    """Assign ``_chunk = floor(global_rank / cap)`` without a
    single-task global sort (the two-phase discipline of
    ``with_rowid``, ``windows.py``).

    Phase 1 range-shuffles on the sort key (ascending partition ids =
    ascending key ranges) and counts rows per partition — a
    #partitions-sized frame collected to the driver, where the prefix
    sum becomes each partition's starting offset.  Phase 2 numbers
    within each partition and adds the offset; every heavy stage runs
    across all executors.  The shuffled frame is persisted so the count
    job and the numbering/export jobs see the SAME (sampled) range
    boundaries.  Returns ``(chunked, pinned)``; callers must
    ``pinned.unpersist()`` when done.

    Without ``order_by`` the input's own partitioning is kept and rows
    are numbered in per-partition arrival order
    (``monotonically_increasing_id``), matching the old fallback
    semantics: stable per run, re-chunked if the source repartitions.
    """
    if order_by:
        order = [F.col(c) for c in order_by]
        part = df.repartitionByRange(*order)
        extra: list[str] = []
    else:
        part = df.withColumn("_mid", F.monotonically_increasing_id())
        order = [F.col("_mid")]
        extra = ["_mid"]
    from pyspark.sql import Window

    bucketed = part.withColumn("_pid", F.spark_partition_id()).persist()
    counts = {
        r["_pid"]: r["count"]
        for r in bucketed.groupBy("_pid").count().collect()
    }
    running, offsets = 0, []
    for pid in sorted(counts):
        offsets.append((pid, running))
        running += counts[pid]
    off = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long"
    )
    within = Window.partitionBy("_pid").orderBy(*order)
    chunked = (
        bucketed.join(F.broadcast(off), "_pid")
        .withColumn(
            "_chunk",
            F.floor((F.col("_off") + F.row_number().over(within) - 1) / cap),
        )
        .drop("_pid", "_off", *extra)
    )
    return chunked, bucketed


def _write_xlsx(
    df: DataFrame, base: str, order_by: list[str] | None = None
) -> list[str]:
    """S5 chunked XLSX: ≤1,048,576 rows per sheet (``R/qc_exports.R:
    92-122``).  Chunk id = floor(global_rank/cap) via the two-phase
    numbering of :func:`_with_chunk_ids` — never a single-task global
    sort; each chunk streams to the driver via toPandas (XLSX is an
    out-of-engine sink by nature).  Gated on openpyxl availability.

    Pass ``order_by`` for deterministic chunk boundaries across retries.
    An empty DataFrame writes a single header-only sheet (the reference
    writes one empty sheet for n == 0).
    """
    try:
        import openpyxl  # noqa: F401
        import pandas as pd  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(f"xlsx export needs openpyxl: {exc}") from exc

    chunked, pinned = _with_chunk_ids(df, order_by)
    mx = chunked.agg(F.max("_chunk")).collect()[0][0]
    n_chunks = int(mx) + 1 if mx is not None else 1
    path = base + ".xlsx"
    import pandas as pd

    try:
        with pd.ExcelWriter(path, engine="openpyxl") as writer:
            for k in range(n_chunks):
                pdf = (
                    chunked.filter(F.col("_chunk") == k)
                    .drop("_chunk")
                    .toPandas()
                )
                pdf.to_excel(writer, sheet_name=f"sheet{k + 1}", index=False)
    finally:
        pinned.unpersist()
    return [path]


def _write_checksums(out_dir: str, stem: str, written: dict) -> str:
    """S7: MD5 per written file → ``<stem>_checksums.md5``
    (``R/qc_exports.R:135-145``)."""
    lines = []
    for fmt, paths in written.items():
        if fmt == "checksums":
            continue
        for p in paths:
            files = (
                [os.path.join(p, f) for f in sorted(os.listdir(p))]
                if os.path.isdir(p)
                else [p]
            )
            for fp in files:
                if os.path.basename(fp).startswith(("_", ".")):
                    continue
                h = hashlib.md5()
                with open(fp, "rb") as fh:
                    for block in iter(lambda: fh.read(1 << 20), b""):
                        h.update(block)
                lines.append(f"{h.hexdigest()}  {os.path.relpath(fp, out_dir)}")
    out = os.path.join(out_dir, f"{stem}_checksums.md5")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return out
