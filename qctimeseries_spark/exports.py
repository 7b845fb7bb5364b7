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


def write_jsonl(
    df: DataFrame, path: str, *, compression: str | None = None
) -> None:
    """JSON-Lines sink (one object per line) — the de-facto exchange
    format for training corpora.  Lossless for string/integer/boolean
    columns; ``compression='gzip'`` produces ``.json.gz`` part files.
    Writes distributed part files like every other sink here — a
    downstream consumer globs the directory."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


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
    df: DataFrame,
    base: str,
    order_by: list[str] | None = None,
    max_rows: int = _XLSX_MAX_ROWS,
) -> list[str]:
    """S5 chunked XLSX: ≤1,048,576 rows per sheet (``R/qc_exports.R:
    92-122``).  Chunk id = floor(global_rank/cap) via the two-phase
    numbering of :func:`_with_chunk_ids` — never a single-task global
    sort; each chunk streams to the driver via toPandas (XLSX is an
    out-of-engine sink by nature).

    Writes through openpyxl when installed; otherwise falls back to
    :func:`_write_xlsx_builtin`, a dependency-free OOXML writer (XLSX
    is a zip of XML parts), so the sink runs end-to-end in bare
    environments too.

    Pass ``order_by`` for deterministic chunk boundaries across retries.
    An empty DataFrame writes a single header-only sheet (the reference
    writes one empty sheet for n == 0).
    """
    import pandas as pd

    try:
        import openpyxl  # noqa: F401

        engine = "openpyxl"
    except ImportError:
        engine = "builtin"

    chunked, pinned = _with_chunk_ids(df, order_by, cap=max_rows)
    mx = chunked.agg(F.max("_chunk")).collect()[0][0]
    n_chunks = int(mx) + 1 if mx is not None else 1
    path = base + ".xlsx"

    def chunk_pdf(k: int):
        return chunked.filter(F.col("_chunk") == k).drop("_chunk").toPandas()

    try:
        if engine == "openpyxl":
            with pd.ExcelWriter(path, engine="openpyxl") as writer:
                for k in range(n_chunks):
                    chunk_pdf(k).to_excel(
                        writer, sheet_name=f"sheet{k + 1}", index=False
                    )
        else:
            _write_xlsx_builtin(
                path,
                (
                    (f"sheet{k + 1}", chunk_pdf(k))
                    for k in range(n_chunks)
                ),
            )
    finally:
        pinned.unpersist()
    return [path]


def _xlsx_col_ref(i: int) -> str:
    """0-based column index → spreadsheet letters (0→A, 26→AA)."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _xlsx_cell(ref: str, v) -> str:
    """One ``<c>`` element: numeric for real numbers, boolean for
    bools, inline string otherwise (no shared-string table — inline
    strings keep the writer single-pass and dependency-free)."""
    import math as _math
    from xml.sax.saxutils import escape

    if v is None or (isinstance(v, float) and _math.isnan(v)):
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)) and not (
        isinstance(v, float) and _math.isinf(v)
    ):
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'


def _write_xlsx_builtin(path: str, sheets) -> None:
    """Dependency-free XLSX writer: the minimal OOXML package
    (content types, package/workbook rels, workbook, one worksheet
    part per sheet) via stdlib ``zipfile``.

    ``sheets`` yields ``(name, pandas.DataFrame)`` lazily so only one
    chunk's rows are in memory at a time.  Values use inline strings /
    raw numerics with no style part — readable by Excel, LibreOffice,
    and openpyxl.
    """
    import zipfile

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        names = []
        for idx, (name, pdf) in enumerate(sheets, start=1):
            names.append(name)
            rows_xml = []
            header = f"<row r=\"1\">" + "".join(
                _xlsx_cell(f"{_xlsx_col_ref(c)}1", col)
                for c, col in enumerate(pdf.columns)
            ) + "</row>"
            rows_xml.append(header)
            for r, rec in enumerate(
                pdf.itertuples(index=False, name=None), start=2
            ):
                rows_xml.append(
                    f'<row r="{r}">'
                    + "".join(
                        _xlsx_cell(f"{_xlsx_col_ref(c)}{r}", v)
                        for c, v in enumerate(rec)
                    )
                    + "</row>"
                )
            z.writestr(
                f"xl/worksheets/sheet{idx}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
                + "".join(rows_xml)
                + "</sheetData></worksheet>",
            )
        sheet_tags = "".join(
            f'<sheet name="{n}" sheetId="{i}" r:id="rId{i}"/>'
            for i, n in enumerate(names, start=1)
        )
        sheet_rels = "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            f'worksheet" Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(names) + 1)
        )
        sheet_types = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(1, len(names) + 1)
        )
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/'
            '2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.sheet.main+xml"/>' + sheet_types + "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{sheet_rels}</Relationships>',
        )


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
