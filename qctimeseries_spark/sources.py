"""Sources: CSV / Parquet readers with QC-friendly time handling.

Reference: S1/S2 in SURVEY.md §2.1 (``read.csv`` + ``as.POSIXct`` in
the vignette workflow; RData save/load ≙ Parquet state round-trip).
"""

from __future__ import annotations

import os
import tempfile
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fetch_url(url: str) -> str:
    """Download a CSV URL to a driver-local temp file and return its
    path.

    Driver-side by design: the vignette's ``read.csv("https://…")`` is
    a BOOTSTRAP step for a single modest file, and Spark executors
    cannot read http(s) — there is no distributed http data source.
    The whole payload passes through (and stays on) the driver's disk,
    so this is bounded by driver storage; for repeated or large-scale
    ingestion, land the data on a shared filesystem / object store
    first and read it there.
    """
    suffix = os.path.splitext(urllib.parse.urlparse(url).path)[1] or ".csv"
    fd, tmp = tempfile.mkstemp(prefix="qcts_url_", suffix=suffix)
    try:
        with os.fdopen(fd, "wb") as out, urllib.request.urlopen(url) as resp:
            while True:
                block = resp.read(1 << 20)
                if not block:
                    break
                out.write(block)
    except BaseException:
        os.unlink(tmp)
        raise
    return tmp


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    time_col: str | None = None,
    time_format: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """S1 CSV source (vignette ``read.csv`` + POSIXct cast,
    ``overall_workflow.Rmd:97-108``).  Header on, schema inference on
    unless an explicit schema is given (always prefer explicit schemas
    at scale — inference is an extra full scan).

    http(s) URLs are accepted (the vignette imports straight from a
    URL, ``overall_workflow.Rmd:97-99,331``): the file is fetched once
    to driver-local temp storage and read from there — see
    :func:`_fetch_url` for the driver-size bound.  Every other path
    goes straight to ``spark.read.csv`` (local, HDFS, s3a, …).
    """
    if urllib.parse.urlparse(path).scheme in ("http", "https"):
        path = _fetch_url(path)
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    if time_col is not None:
        cast = (
            F.to_timestamp(F.col(time_col), time_format)
            if time_format
            else F.to_timestamp(F.col(time_col))
        )
        df = df.withColumn(time_col, cast)
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S2 state source — Parquet replaces the reference's RData
    save/load (``overall_workflow.Rmd:162-165``)."""
    return spark.read.parquet(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-Lines source — the de-facto exchange format for training
    corpora (one JSON object per line; newlines inside strings are
    escaped by construction, so files split cleanly at any byte
    boundary and scale out like CSV).  Pass an explicit ``schema`` to
    skip the inference scan (a full extra read of the data) and to pin
    column order; without one, Spark infers and alphabetizes."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


#: resolved table HANDLES (lazy scan plans: file listing + footer
#: schema, never any rows), keyed per (application, path).  Catalog
#: semantics: a production engine resolves a table once and every
#: query still reads the parquet bytes at execution — without this,
#: every one of the ~170 per-bench read_table calls re-listed the
#: directory and re-read the footer (~0.1-0.2 s each, measured r13).
_TABLE_HANDLES: dict[tuple[str, str], DataFrame] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table, normalizing timestamp physical types.

    The driver's ``events`` table stores TIMESTAMP(NANOS), which Spark's
    Parquet reader rejects by default; we read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and convert to a proper
    timestamp at microsecond precision — exactly what DuckDB's reader
    does, keeping both engines value-identical.

    The returned frame is an immutable LAZY plan memoized per
    (application, path) — see ``_TABLE_HANDLES``; no row ever caches
    here, and executions always scan the live parquet files.

    CONTRACT (staleness invariant): the memoized handle pins Spark's
    FILE LISTING of the path for the application's lifetime, so no
    caller may write under ``sf_dir`` tables — an appended or
    rewritten file would be invisible (or a deleted one fatal) to
    every later execution.  No registry query does;
    ``tools/check_correctness.py`` snapshots the source directory
    around its full-registry sweep and fails if anything changed, and
    ``tests/test_sources.py::test_read_table_handle_memo_contract``
    pins the memo semantics.  An operator that must ingest into a
    source table should write elsewhere and read via a fresh
    ``spark.read.parquet`` (or clear the memo for that path).
    """
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path)
    cached = _TABLE_HANDLES.get(key)
    if cached is not None:
        return cached
    _TABLE_HANDLES[key] = df = _read_table_fresh(spark, path, name)
    return df


def _read_table_fresh(spark: SparkSession, path: str, name: str) -> DataFrame:
    if name != "events":
        return spark.read.parquet(path)
    # Leave the conf set for the session: execution re-reads it at plan
    # time, and it only affects NANOS columns that are otherwise
    # unreadable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        # integer DIV, not float /: ns values (~1.7e18) exceed double's
        # exact-integer range and float division drifts by ±1 µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif t == "timestamp_ntz":
        # newer readers surface NANOS as TIMESTAMP_NTZ (µs-truncated)
        # instead of honoring nanosAsLong; the session tz is pinned UTC,
        # so this cast reproduces the same epoch-µs instants the bigint
        # path derives — and keeps every downstream unix_micros() legal
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
