"""Paired Spark / DuckDB-oracle query definitions — the correctness gate.

Every operator from SURVEY.md §2 appears here as a named query: a Spark
callable ``(spark, sf_dir) -> DataFrame`` built from the engine's public
API, plus an ANSI-SQL oracle string DuckDB runs over the same parquet
tables.  The driver compares row count + schema + order-insensitive
value hash, so every computed column is aliased identically on both
sides, numeric types are pinned (INT/BIGINT/DOUBLE), and anything
float-sensitive is computed with exact integer or decimal arithmetic
before a final cast.

The QC queries derive a deterministic flagged table from ``events``
(the time-series surrogate: ts + value): NULLs are injected at
``event_id % 17 == 0`` and a mixed flag state is seeded with the
engine's own update ops — so the seed itself exercises U1 semantics.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qctimeseries_spark.flags import add_flags, apply_flags, remove_flags, strict_clean, transfer_flags
from qctimeseries_spark.exports import iso_utc
from qctimeseries_spark.sources import read_table
from qctimeseries_spark.summary import consistency_check, flag_domain_check, progress
from qctimeseries_spark.updates import (
    approve_window,
    flag_and_approve_window,
    flag_window,
    reset_all,
    reset_window,
    set_flag,
)
from qctimeseries_spark.viz import (
    approved_overlay,
    check_panel,
    downsample_minmax,
    flagged_overlay,
    main_trace,
    secondary_trace,
)
from qctimeseries_spark.windows import (
    admitted_windows,
    assign_windows,
    window_range,
    with_rowid,
)

WIN_HOURS = 48
_WIDTH_US = WIN_HOURS * 3600 * 1_000_000

_SCRATCH = os.path.join(tempfile.gettempdir(), "qcts_spark_scratch")

# ---------------------------------------------------------------------------
# deterministic QC derivation (shared by Spark and oracle)
# ---------------------------------------------------------------------------


def _qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with NULLs injected into value at event_id % 17 == 0."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.when(F.col("event_id") % 17 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )


def _seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed flag state {−1, −2, 1, 0} seeded via the engine's own ops."""
    df = add_flags(_qc(spark, sf_dir), "value")
    df = set_flag(df, "value", -2, selection=F.col("event_id") % 11 == 0)
    df = set_flag(
        df,
        "value",
        1,
        selection=(F.col("event_id") % 5 == 0) & (F.col("value_qcflag") == 0),
    )
    return df


_QC_SQL = """
qc AS (
  SELECT event_id, ts, user_id, event_type,
         CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS value
  FROM events
)"""

_SEEDED_SQL = (
    _QC_SQL
    + """,
seeded AS (
  SELECT event_id, ts, user_id, event_type, value,
         CAST(CASE WHEN value IS NULL THEN -1
                   WHEN event_id % 11 = 0 THEN -2
                   WHEN event_id % 5 = 0 THEN 1
                   ELSE 0 END AS INT) AS value_qcflag
  FROM qc
)"""
)

_WIN_SQL = (
    _SEEDED_SQL
    + f""",
w AS (
  SELECT *, CAST((epoch_us(ts) - (SELECT MIN(epoch_us(ts)) FROM events))
                 // {_WIDTH_US} AS INT) AS win_id
  FROM seeded
)"""
)


def _events_anchor(sf_dir: str):
    """The windowing anchor ``min(events.ts)`` from PARQUET FOOTER
    STATISTICS — zero Spark jobs (guide §6: let metadata answer what a
    scan would).  ``assign_windows(anchor=None)`` otherwise runs a
    driver collect per CONSTRUCTION, and profiling showed that one job
    was ~60% of u6's construction time across the ~19 windowed fixture
    queries.  Exact-value safety:

    - parquet int64 timestamp min/max stats are exact (not truncated);
      verified equal to the engine's ``F.min(ts)`` on every SF;
    - the seeded fixture chains are row-preserving projections of
      ``events`` with ``ts`` untouched, so min over the chain ≡ min
      over the file;
    - stats skip NULLs, exactly like ``F.min``.

    Returns None (→ the collect path) when anything is off: missing
    stats, unexpected physical type, or a non-datetime min.  Re-read
    from the live file every call — no result memo.
    """
    import datetime as _dt

    try:
        import pyarrow.parquet as _pq

        md = _pq.ParquetFile(f"{sf_dir}/events.parquet").metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ti = names.index("ts")
        mins = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ti).statistics
            if st is None or not st.has_min_max:
                return None
            mins.append(st.min)
        lo = min(mins)
        if isinstance(lo, _dt.datetime):
            return lo
        if isinstance(lo, int) and lo > 0:  # TIMESTAMP(NANOS) raw int
            # engine path is `ts DIV 1000` (truncation); positive-only
            return _dt.datetime.utcfromtimestamp(0) + _dt.timedelta(
                microseconds=lo // 1000
            )
        return None
    except Exception:
        return None


def _windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign_windows(
        _seeded(spark, sf_dir), "ts", WIN_HOURS,
        anchor=_events_anchor(sf_dir),
    )


def _app_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded table + materialized rowid (F2) + win_id — the app's
    working state (SURVEY.md §3.2)."""
    return assign_windows(
        with_rowid(_seeded(spark, sf_dir), "ts", ties=["event_id"]),
        "ts",
        WIN_HOURS,
        anchor=_events_anchor(sf_dir),
    )


_APP_SQL = (
    _SEEDED_SQL
    + f""",
app AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) AS rowid,
         CAST((epoch_us(ts) - (SELECT MIN(epoch_us(ts)) FROM events))
              // {_WIDTH_US} AS INT) AS win_id
  FROM seeded
)"""
)


def _two_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two QC'd variables with distinct null/flag patterns (A1/A8)."""
    df = _qc(spark, sf_dir).withColumn(
        "value2",
        F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(
            F.col("user_id").cast("double")
        ),
    )
    df = add_flags(df, ["value", "value2"])
    df = set_flag(df, "value", -2, selection=F.col("event_id") % 11 == 0)
    df = set_flag(
        df, "value", 1,
        selection=(F.col("event_id") % 5 == 0) & (F.col("value_qcflag") == 0),
    )
    df = set_flag(
        df, "value2", 1,
        selection=(F.col("event_id") % 7 == 0) & (F.col("value2_qcflag") == 0),
        suffix="_qcflag",
    )
    df = set_flag(
        df, "value2", -2,
        selection=(F.col("event_id") % 9 == 0) & (F.col("value2_qcflag") == 0),
    )
    return df


_TWO_VAR_SQL = (
    _QC_SQL
    + """,
two AS (
  SELECT event_id, ts, value,
         CASE WHEN event_id % 13 = 0 THEN NULL
              ELSE CAST(user_id AS DOUBLE) END AS value2,
         CAST(CASE WHEN value IS NULL THEN -1
                   WHEN event_id % 11 = 0 THEN -2
                   WHEN event_id % 5 = 0 THEN 1
                   ELSE 0 END AS INT) AS value_qcflag,
         CAST(CASE WHEN event_id % 13 = 0 THEN -1
                   WHEN event_id % 7 = 0 THEN 1
                   WHEN event_id % 9 = 0 THEN -2
                   ELSE 0 END AS INT) AS value2_qcflag
  FROM qc
)"""
)

_PROGRESS_VAR_SQL = """
  SELECT '{var}' AS variable,
         COUNT({var}) AS total,
         ROUND(100.0 * SUM(CASE WHEN {var} IS NOT NULL
                                 AND {flag} NOT IN (0, -1) THEN 1 ELSE 0 END)
               / COUNT({var}), 2) AS pct_checked,
         ROUND(100.0 * SUM(CASE WHEN {flag} = 1 THEN 1 ELSE 0 END) / COUNT(*), 2)
             AS pct_approved,
         ROUND(100.0 * SUM(CASE WHEN {flag} = 0 THEN 1 ELSE 0 END) / COUNT(*), 2)
             AS pct_unchecked,
         ROUND(100.0 * SUM(CASE WHEN {flag} = -1 THEN 1 ELSE 0 END) / COUNT(*), 2)
             AS pct_missing,
         ROUND(100.0 * SUM(CASE WHEN {flag} = -2 THEN 1 ELSE 0 END) / COUNT(*), 2)
             AS pct_flagged
  FROM two"""


def _progress_sql(*vars: str, where: str = "") -> str:
    parts = [
        _PROGRESS_VAR_SQL.format(var=v, flag=f"{v}_qcflag") for v in vars
    ]
    body = " UNION ALL ".join(parts)
    return f"WITH {_TWO_VAR_SQL} SELECT * FROM ({body}) p {where}"


# ---------------------------------------------------------------------------
# QC-core queries (SURVEY.md §2 operator ids in the comments)
# ---------------------------------------------------------------------------


def q_f1_add_flags(spark, sf_dir):
    """F1/U7: flag init -1 on NULL else 0 (R/qc_flags.R:69-73)."""
    df = add_flags(_qc(spark, sf_dir), "value")
    return df.select("event_id", "value", "value_qcflag")


def q_u1_seeded_flags(spark, sf_dir):
    """U1 chained predicate updates with the -1 guard (R/qc_window_app.R:359-363)."""
    return _seeded(spark, sf_dir).select("event_id", "value", "value_qcflag")


def q_p4_apply_flags(spark, sf_dir):
    """P4: mask value where flag < 0 (R/qc_flags.R:193-219)."""
    df = apply_flags(_seeded(spark, sf_dir), "value")
    return df.select("event_id", "value", "value_qcflag")


def q_p5_strict_clean(spark, sf_dir):
    """P5: mask value where flag < 1 (R/qc_plots.R:51-53)."""
    df = strict_clean(_seeded(spark, sf_dir), "value")
    return df.select("event_id", "value", "value_qcflag")


def q_p1_remove_flags(spark, sf_dir):
    """P1/U8: drop flag columns (R/qc_flags.R:107-145)."""
    return remove_flags(_seeded(spark, sf_dir))


def q_f4_transfer_flags(spark, sf_dir):
    """F4/U9: copy flag column to another variable (R/qc_flags.R:159-182)."""
    df = _seeded(spark, sf_dir).withColumn("value2", F.col("value") * 2.0)
    df = transfer_flags(df, "value", "value2")
    return df.select("event_id", "value2", "value2_qcflag")


def q_p3_filter_conjunction(spark, sf_dir):
    """P3: equality-conjunction row filter (overall_workflow.Rmd:102-105)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 3 == 0)
    ).select("event_id", "user_id", "value")


def q_p8_flag_class_filters(spark, sf_dir):
    """P6+P7+P8: display filters — kept rows (flag>=0, non-null) tagged
    with their class membership (R/qc_window_app.R:255-295)."""
    df = _seeded(spark, sf_dir)
    f = F.col("value_qcflag")
    return (
        df.filter((f >= 0) & F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_id",
            (f == 1).alias("is_approved"),
            (f <= -2).alias("is_manual"),
        )
    )


def q_a1_progress(spark, sf_dir):
    """A1/A7/A8: per-variable progress, dual denominators (R/qc_summary.R:68-93)."""
    return progress(_two_var(spark, sf_dir), ["value", "value2"])


def q_p11_hide_complete(spark, sf_dir):
    """P11: hide variables with pct_checked == 100 (R/qc_summary.R:95-97)."""
    df = _qc(spark, sf_dir).withColumn(
        "value2",
        F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(
            F.col("user_id").cast("double")
        ),
    )
    df = add_flags(df, ["value", "value2"])
    df = set_flag(df, "value2", 1, selection=F.col("value2_qcflag") == 0)
    return progress(df, ["value", "value2"], hide_complete=True)


def q_a2_consistency(spark, sf_dir):
    """A2: NULL-count vs flag==-1 count invariant (R/qc_summary.R:51-58)."""
    return consistency_check(_seeded(spark, sf_dir), "value")


def q_a3_flag_domain(spark, sf_dir):
    """A3: values outside {-2,-1,0,1} (R/qc_summary.R:60-66)."""
    df = set_flag(
        _seeded(spark, sf_dir),
        "value",
        9,
        selection=(F.col("event_id") % 97 == 0) & (F.col("value_qcflag") == 0),
    )
    return flag_domain_check(df, "value")


def q_w1_assign_windows(spark, sf_dir):
    """W1/F3: min(t)-anchored tumbling bucket id (R/qc_window_app.R:69-70)."""
    return _windowed(spark, sf_dir).select("event_id", "win_id")


def q_w3_admitted_windows(spark, sf_dir):
    """W3+W5: admission (non-null y AND flag in include-set) + dense
    renumbering (R/qc_window_app.R:74-76)."""
    return admitted_windows(_windowed(spark, sf_dir), "value", include=(0,))


def q_w4_viewer_windows(spark, sf_dir):
    """W4: viewer admission — non-null y only (R/ts_viewer.R:67-68)."""
    return admitted_windows(_windowed(spark, sf_dir), "value", include=None)


def q_w8_window_range(spark, sf_dir):
    """W8+A5: per-window time range + count (R/qc_window_app.R:337)."""
    return window_range(_windowed(spark, sf_dir), "ts")


def q_u2_flag_window(spark, sf_dir):
    """U2: whole window -> -2, guard -1 (R/qc_window_app.R:389-393)."""
    return flag_window(_windowed(spark, sf_dir), "value", 3).select(
        "event_id", "value_qcflag"
    )


def q_u3_approve_window(spark, sf_dir):
    """U3: unchecked non-null in window -> 1 (R/qc_window_app.R:394-398)."""
    return approve_window(_windowed(spark, sf_dir), "value", 3).select(
        "event_id", "value_qcflag"
    )


def q_u4_reset_window(spark, sf_dir):
    """U4: window -> 0, guard -1 (R/qc_window_app.R:399-403)."""
    return reset_window(_windowed(spark, sf_dir), "value", 3).select(
        "event_id", "value_qcflag"
    )


def q_u5_reset_all(spark, sf_dir):
    """U5: all -> 0, guard -1 (R/qc_window_app.R:417-419)."""
    return reset_all(_seeded(spark, sf_dir), "value").select(
        "event_id", "value_qcflag"
    )


def q_u6_flag_approve_advance(spark, sf_dir):
    """U6 compound: selected -> -2, then window remainder unchecked
    non-null -> 1 (R/qc_window_app.R:406-413)."""
    return flag_and_approve_window(
        _windowed(spark, sf_dir), "value", 3, selection=F.col("event_id") % 13 == 0
    ).select("event_id", "value_qcflag")


def q_f2_rowid(spark, sf_dir):
    """F2: stable row identity materialized at ingest
    (``.rowid := .I``, R/qc_window_app.R:65)."""
    return _app_state(spark, sf_dir).select("event_id", "rowid")


def q_p2_projection(spark, sf_dir):
    """P2: keep-subset column projection at import
    (overall_workflow.Rmd:111)."""
    return read_table(spark, sf_dir, "events").select("ts", "value")


def q_p10_rowid_semijoin(spark, sf_dir):
    """P10/U1: brushed-selection update where the selection is an ids
    DataFrame — broadcast left-semi-join path, the scalable form of the
    reference's plotly-key row-id sets (R/qc_window_app.R:211-213)."""
    df = _app_state(spark, sf_dir)
    ids = df.filter(F.col("event_id") % 23 == 0).select("rowid")
    out = set_flag(df, "value", -2, selection=ids)
    return out.select("event_id", "value_qcflag")


def q_a4_anchor(spark, sf_dir):
    """A4: global min(t) — the window anchor (R/qc_window_app.R:68)."""
    return read_table(spark, sf_dir, "events").agg(F.min("ts").alias("t0"))


def q_a5_axis_range(spark, sf_dir):
    """A5: min/max of displayed y in the current window, ±2% pad
    (R/qc_window_app.R:259-263)."""
    sl = _app_state(spark, sf_dir).filter(
        (F.col("win_id") == 3) & F.col("value").isNotNull()
    )
    agg = sl.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    pad = (F.col("mx") - F.col("mn")) * 0.02
    return agg.select(
        (F.col("mn") - pad).alias("y_lo"), (F.col("mx") + pad).alias("y_hi")
    )


def q_v1_main_trace(spark, sf_dir):
    """V1: main-trace slice of window 3 with hide-flagged (P6) + P7
    non-null filters (build_plot R/qc_window_app.R:251-297)."""
    return main_trace(
        _app_state(spark, sf_dir), "value", "ts", 3, hide_flagged=True
    )


def q_v2_approved_overlay(spark, sf_dir):
    """V2: approved (flag==1) overlay of window 3 (R/qc_window_app.R:293)."""
    return approved_overlay(_app_state(spark, sf_dir), "value", "ts", 3)


def q_v3_flagged_overlay(spark, sf_dir):
    """V3: manual-flag (flag<-1) overlay of window 3
    (R/qc_window_app.R:294-295)."""
    return flagged_overlay(_app_state(spark, sf_dir), "value", "ts", 3)


def q_v4_secondary_trace(spark, sf_dir):
    """V4/P9: secondary-series slice — non-null AND (flag col exists →
    flag >= 0) (R/qc_window_app.R:307-312)."""
    return secondary_trace(_app_state(spark, sf_dir), "value", "ts", 3)


def q_v6_viewer_slice(spark, sf_dir):
    """V6: read-only viewer slice — V1 without the hide-flagged filter
    (R/ts_viewer.R:262-303)."""
    return main_trace(
        _app_state(spark, sf_dir), "value", "ts", 3, hide_flagged=False
    )


def q_v5_check_panel(spark, sf_dir):
    """V5: raw∪clean panel union with tag (R/qc_plots.R:45-56)."""
    return check_panel(_seeded(spark, sf_dir), "value", "ts")


def q_v1_downsample(spark, sf_dir):
    """Per-bucket min/max/open/close downsampling (SURVEY.md §4)."""
    return downsample_minmax(_qc(spark, sf_dir), "value", "ts", n_buckets=100)


def q_f5_iso_export(spark, sf_dir):
    """F5/S3: ISO-8601 UTC text render (R/qc_exports.R:61-66)."""
    df = iso_utc(read_table(spark, sf_dir, "events").select("event_id", "ts"), "ts")
    return df.withColumnRenamed("ts", "ts_iso")


def q_s1_csv_roundtrip(spark, sf_dir):
    """S1+S3: CSV sink then source, µs timestamps preserved
    (overall_workflow.Rmd:97-108, R/qc_exports.R:71-79)."""
    path = os.path.join(_SCRATCH, "csv_roundtrip")
    df = read_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", fmt)
        .csv(path)
    )
    return (
        spark.read.option("header", True)
        .option("timestampFormat", fmt)
        .schema("event_id bigint, ts timestamp, value double")
        .csv(path)
    )


def q_st15_stream_knn_serve(spark, sf_dir):
    """Online ANN serving: build the IVF index ONCE from the
    embeddings table, then answer a STREAM of query-vector batches
    against the persisted store (two source files in mtime order:
    vec_id < 5, then 5 ≤ vec_id < 10).  Serving is deterministic
    (seeded centroids, 9-dp rounding, id tie-breaks), so the drained
    result equals the batch x2 algebra over the union of streamed
    queries — which is the oracle."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.similarity import build_ivf_index
    from qctimeseries_spark.sources import read_table as _rt
    from qctimeseries_spark.streaming import knn_serve_stream, stage_file_batches

    emb = _rt(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="qcts_st15_")
    try:
        build_ivf_index(emb, os.path.join(tmp, "index"), nlist=16)
        src = os.path.join(tmp, "src")
        # one-job staging (shared helper): the hand-rolled per-batch
        # coalesce(1) loop both single-threaded each scan and paid one
        # write job per batch
        stage_file_batches(
            [
                emb.filter(F.col("vec_id") < 5).select(
                    F.col("vec_id").alias("query_id"), "embedding"
                ),
                emb.filter(
                    (F.col("vec_id") >= 5) & (F.col("vec_id") < 10)
                ).select(F.col("vec_id").alias("query_id"), "embedding"),
            ],
            src,
        )
        stream = (
            spark.readStream.schema("query_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = knn_serve_stream(
            stream,
            os.path.join(tmp, "index"),
            os.path.join(tmp, "out"),
            k=10,
            nprobe=4,
            checkpoint_dir=os.path.join(tmp, "ckpt"),
        )
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select("query_id", "neighbor_id", "cos", "rank")


def q_s10_jsonl_roundtrip(spark, sf_dir):
    """JSONL sink then source over the documents corpus — the standard
    training-data exchange format; explicit read schema pins types and
    column order, and the roundtrip must be lossless (the oracle reads
    the original table)."""
    from qctimeseries_spark.exports import write_jsonl
    from qctimeseries_spark.sources import read_jsonl

    path = os.path.join(_SCRATCH, "jsonl_roundtrip")
    write_jsonl(read_table(spark, sf_dir, "documents"), path)
    return read_jsonl(
        spark,
        path,
        schema="doc_id bigint, text string, lang string,"
        " source string, n_chars bigint",
    )


def q_s4_parquet_roundtrip(spark, sf_dir):
    """S2+S4: zstd parquet sink then source (R/qc_exports.R:82-89)."""
    path = os.path.join(_SCRATCH, "parquet_roundtrip")
    _seeded(spark, sf_dir).write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(path)
    return spark.read.parquet(path).select("event_id", "value", "value_qcflag")


# ---------------------------------------------------------------------------
# relational / time-series breadth (engine capability + bench anchors)
# ---------------------------------------------------------------------------


def _dec(c, scale=2):
    return F.col(c).cast(f"decimal(18,{scale})")


def q_h1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style conditional aggregation over lineitem.  Money sums
    in exact decimal, cast to double at the edge."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_h3_segment_revenue(spark, sf_dir):
    """Join breadth: customer ⋈ orders ⋈ lineitem, revenue per market
    segment.  Small dimension (customer) broadcast — no shuffle for it."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_h5_nation_revenue(spark, sf_dir):
    """Join chain lineitem ⋈ supplier ⋈ nation ⋈ region with broadcast
    dims; revenue per region/nation."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = read_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


def q_h4_order_priority(spark, sf_dir):
    """Order-priority count (TPC-H Q4 shape, adapted to this schema's
    columns): 1996-Q1 orders having at least one lineitem shipped
    AFTER the order date, counted per priority.  The plan shape this
    adds to the suite: a LEFT SEMI join whose condition correlates
    BOTH sides (key equality + l_shipdate > o_orderdate) — existence
    semantics with no row duplication and no post-join dedup, the
    fact side streamed once."""
    ords = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    ).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        ords.join(
            li,
            (ords.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > ords.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_h6_forecast_revenue(spark, sf_dir):
    """Forecast-revenue delta (TPC-H Q6 shape): one pushed-down
    range-filter scan — ship year 1996, discount in [0.05, 0.07],
    quantity < 24 — and a single global money agg.  Every predicate
    reaches the parquet scan (PushedFilters); decimal money math casts
    to double only at the end."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 2))
            .cast("double")
            .alias("revenue")
        )
    )


def q_h7_top_unshipped(spark, sf_dir):
    """Shipping-priority top-k (TPC-H Q3 shape): revenue of orders
    taken before the cutoff but with lineitems still shipping after
    it, for one market segment; the 10 largest.  The segment dim
    broadcasts; both date filters reach the scans (PushedFilters); the
    final top-10 is `TakeOrderedAndProject` — per-partition heaps, no
    global sort of the aggregate.  Deterministic across engines: the
    decimal revenue sums are exact, ties break on the order key."""
    cust = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    ords = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).filter(F.col("o_orderdate") < "1996-03-15")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    ).filter(F.col("l_shipdate") > "1996-03-15")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_h8_local_nation_revenue(spark, sf_dir):
    """Local-supplier revenue (TPC-H Q5 shape): 1996 revenue per
    nation counting only lineitems whose customer and supplier share
    that nation.  supplier/nation broadcast (10/25 rows at any SF);
    the customer attach carries the c_nationkey = s_nationkey
    correlation in its join condition and stays AQE-decided — at
    100 TB customer is fact-sized and this becomes the plan's one
    key-shuffle join alongside lineitem ⋈ orders."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    ords = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(
            cust,
            (ords.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            )
            .cast("double")
            .alias("revenue")
        )
    )


def q_h9_big_orders(spark, sf_dir):
    """Large-volume-order report (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds 250, with their customer.  The plan
    shape this adds: an aggregate-then-HAVING derived table joined
    back to its own fact's dimension chain — the filtered aggregate is
    ~1% of orders, so AQE turns both attach joins into broadcasts at
    runtime (statically unknowable, exactly what adaptive planning is
    for).  Quantity sums run in exact decimal; cross-engine
    determinism needs no tie-breaks because nothing is ranked."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > 250)
    )
    ords = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        ords.join(big, ords.o_orderkey == big.l_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_sq").cast("double").alias("sum_qty"),
        )
    )


def q_st1_stream_flag_counts(spark, sf_dir):
    """Structured Streaming end-to-end (SURVEY.md §7.2/9): file-source
    stream → stateless flag init → watermarked 24 h tumbling-window flag
    counts → availableNow drain.  Oracle = the identical batch SQL with
    epoch-anchored buckets (streaming windows cannot anchor at min(t))."""
    from qctimeseries_spark.streaming import (
        scoped_state_partitions,
        streaming_flag_counts,
    )

    # windowed-count state is (window × flag) counters — dozens of
    # keys; measured 2.4 s → 1.0 s at 8 partitions (r13)
    with scoped_state_partitions(spark):
        return streaming_flag_counts(spark, sf_dir)


def q_st2_stream_gaps(spark, sf_dir):
    """Custom STATEFUL streaming operator (``applyInPandasWithState``):
    per-user cadence gaps > 1 day.  On an in-order bounded source this
    matches the batch ``lag() OVER (PARTITION BY user_id ORDER BY ts)``
    exactly, which is the oracle."""
    from qctimeseries_spark.streaming import (
        detect_gaps_stateful,
        run_available_now,
        stream_events,
    )

    gaps = detect_gaps_stateful(
        stream_events(spark, sf_dir), key_col="user_id", gap_seconds=86400.0
    )
    return run_available_now(gaps, output_mode="append")


def q_j1_asof_join(spark, sf_dir):
    """As-of join: every event gains the most recent prior calibration
    record for its user (union + last-carry-forward — one shuffle, no
    row amplification).  Oracle = DuckDB's native ASOF LEFT JOIN."""
    from qctimeseries_spark.joins import asof_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    cal = (
        ev.filter(F.col("event_id") % 97 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cal_value"))
    )
    out = asof_join(ev, cal, on="ts", by="user_id")
    return out.select(
        "event_id",
        F.col("r_ts").alias("cal_ts"),
        F.col("r_cal_value").alias("cal_value"),
    )


def q_st3_stream_dedup(spark, sf_dir):
    """Streaming ingestion dedup: a source with every 5th event
    redelivered (at-least-once simulation) drained through
    ``dropDuplicatesWithinWatermark`` — output must equal the clean
    batch table, which is the oracle."""
    from qctimeseries_spark.streaming import (
        dedup_stream,
        run_available_now,
        scoped_state_partitions,
        stream_events,
    )

    src = stream_events(spark, sf_dir)
    redelivered = stream_events(spark, sf_dir).filter(
        F.col("event_id") % 5 == 0
    )
    merged = src.unionByName(redelivered)
    deduped = dedup_stream(merged, key_cols=["event_id"], time_col="ts")
    # JVM dedup state machinery dominates the one-batch drain:
    # measured 2.7 s → 1.3 s at 8 partitions (r13)
    with scoped_state_partitions(spark):
        return run_available_now(
            deduped.select("event_id", "ts", "value"), output_mode="append"
        )


def q_j2_range_join(spark, sf_dir):
    """Point-in-interval join: events counted inside per-user 2 h
    incident windows (every 200th event opens one).  Bucketed
    equi-join — never a nested-loop inequality join."""
    from qctimeseries_spark.joins import range_join

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    iv = ev.filter(F.col("event_id") % 200 == 0).select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("hi"),
    )
    joined = range_join(
        ev.select("user_id", "ts"),
        iv,
        time_col="ts",
        lo_col="lo",
        hi_col="hi",
        by="user_id",
        bucket_hours=24,
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


def q_a9_percentiles(spark, sf_dir):
    """Exact discrete percentiles of value per event type — engines
    pick the same data element, so equality is exact (interpolated
    percentiles differ in last-ulp arithmetic across engines)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
        F.count("value").alias("n"),
    )


def q_t1_sessionize(spark, sf_dir):
    """Event sessionization: a new session starts after a >30 min gap;
    sessions per user = max session_id from the sessionize operator."""
    from qctimeseries_spark.windows import sessionize

    ev = read_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30.0, ties=["event_id"])
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions")
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_REV = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

from qctimeseries_spark.datapipe.hashing import hash60_sql
from qctimeseries_spark.datapipe.queries import (
    DATAPIPE_ORACLE,
    DATAPIPE_QUERIES,
    _NORM_TEXT,
)

QUERIES = {
    "f1_add_flags": q_f1_add_flags,
    "u1_seeded_flags": q_u1_seeded_flags,
    "p4_apply_flags": q_p4_apply_flags,
    "p5_strict_clean": q_p5_strict_clean,
    "p1_remove_flags": q_p1_remove_flags,
    "f4_transfer_flags": q_f4_transfer_flags,
    "p3_filter_conjunction": q_p3_filter_conjunction,
    "p8_flag_class_filters": q_p8_flag_class_filters,
    "a1_progress": q_a1_progress,
    "p11_hide_complete": q_p11_hide_complete,
    "a2_consistency": q_a2_consistency,
    "a3_flag_domain": q_a3_flag_domain,
    "w1_assign_windows": q_w1_assign_windows,
    "w3_admitted_windows": q_w3_admitted_windows,
    "w4_viewer_windows": q_w4_viewer_windows,
    "w8_window_range": q_w8_window_range,
    "u2_flag_window": q_u2_flag_window,
    "u3_approve_window": q_u3_approve_window,
    "u4_reset_window": q_u4_reset_window,
    "u5_reset_all": q_u5_reset_all,
    "u6_flag_approve_advance": q_u6_flag_approve_advance,
    "f2_rowid": q_f2_rowid,
    "p2_projection": q_p2_projection,
    "p10_rowid_semijoin": q_p10_rowid_semijoin,
    "a4_anchor": q_a4_anchor,
    "a5_axis_range": q_a5_axis_range,
    "v1_main_trace": q_v1_main_trace,
    "v2_approved_overlay": q_v2_approved_overlay,
    "v3_flagged_overlay": q_v3_flagged_overlay,
    "v4_secondary_trace": q_v4_secondary_trace,
    "v6_viewer_slice": q_v6_viewer_slice,
    "v5_check_panel": q_v5_check_panel,
    "v1_downsample": q_v1_downsample,
    "f5_iso_export": q_f5_iso_export,
    "s1_csv_roundtrip": q_s1_csv_roundtrip,
    "s4_parquet_roundtrip": q_s4_parquet_roundtrip,
    "h1_pricing_summary": q_h1_pricing_summary,
    "h3_segment_revenue": q_h3_segment_revenue,
    "h5_nation_revenue": q_h5_nation_revenue,
    "h4_order_priority": q_h4_order_priority,
    "h7_top_unshipped": q_h7_top_unshipped,
    "h8_local_nation_revenue": q_h8_local_nation_revenue,
    "h9_big_orders": q_h9_big_orders,
    "h6_forecast_revenue": q_h6_forecast_revenue,
    "t1_sessionize": q_t1_sessionize,
    "j1_asof_join": q_j1_asof_join,
    "st1_stream_flag_counts": q_st1_stream_flag_counts,
    "st2_stream_gaps": q_st2_stream_gaps,
    "st3_stream_dedup": q_st3_stream_dedup,
    **DATAPIPE_QUERIES,
}

# Tail-only entries: distinct operators that did not displace a driver
# slot — they are covered by pytest and the local oracle replica, and
# sit after the driver's 50-entry window by construction.
def q_a15_cusum(spark, sf_dir):
    """Per-user two-sided CUSUM drift screen over integer centi-units
    (value × 100 — exact prefix sums, bit-equal cross-engine), target
    100.00 / slack 5.00 / alarm threshold 50.00.  Two partitioned
    window passes; the oracle is the same prefix-sum closed form in
    SQL."""
    from qctimeseries_spark.windows import cusum

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cv"),
    )
    out = cusum(
        ev,
        "cv",
        "ts",
        target=10000,
        slack=500,
        threshold=5000,
        key_col="user_id",
        ties=["event_id"],
    )
    return out.select(
        "user_id", "event_id", "cusum_pos", "cusum_neg", "cusum_alarm"
    )


def q_st10_stream_cusum(spark, sf_dir):
    """Streaming per-key CUSUM over integer centi-units, drained
    append-mode — must hash-equal the batch closed form (a15's oracle):
    the stateful recurrence and the prefix-sum formulation are the
    same function, computed two ways."""
    from qctimeseries_spark.streaming import (
        cusum_stateful,
        run_available_now,
        stream_events,
    )

    s = stream_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cv"),
    )
    return run_available_now(
        cusum_stateful(
            s,
            value_col="cv",
            target=10000,
            slack=500,
            threshold=5000,
        ),
        output_mode="append",
    )


#: st11 drift-screen bucket edges over the events value distribution
_PSI_EDGES = [60.0, 90.0, 110.0, 140.0, 200.0]


def _psi_bucket_sql(col: str) -> str:
    """DuckDB mirror of monitor._bucketize over _PSI_EDGES."""
    out = f"CASE WHEN {col} < {_PSI_EDGES[0]!r} THEN 0"
    for i, e in enumerate(_PSI_EDGES[1:], start=1):
        out += f" WHEN {col} < {e!r} THEN {i}"
    return out + f" ELSE {len(_PSI_EDGES)} END"


def q_st11_stream_psi(spark, sf_dir):
    """Streaming windowed drift screen: per daily window, the
    per-bucket PSI of the live value distribution vs a fixed reference
    snapshot (even event ids), drained append-mode.  The oracle
    recomputes each watermark-closed window's PSI batch-side with the
    identical shares/eps/rounding arithmetic."""
    from qctimeseries_spark.streaming import (
        run_available_now,
        scoped_state_partitions,
        stream_events,
        stream_psi,
    )

    ref = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 2 == 0)
        .select("value")
    )
    s = stream_events(spark, sf_dir).select("ts", "value")
    # per-(window, bucket) counter state — dozens of keys; measured
    # 4.8 s → 2.8 s at 8 partitions (r13)
    with scoped_state_partitions(spark):
        return run_available_now(
            stream_psi(
                s, ref, edges=_PSI_EDGES, window_minutes=1440.0,
            ),
            output_mode="append",
        )


def q_st12_stream_ingest_dedup(spark, sf_dir):
    """Streaming ingestion dedup against the persistent fingerprint
    store: the d6 crawl scenario re-played as a stream.  Two source
    files arrive in mtime order — batch 1 the even-id docs, batch 2 the
    odd docs ∪ re-crawled copies of every 10th odd doc — and each
    micro-batch pays one anti-join against the store via
    ``foreachBatch`` (``ingest_dedup_stream``).  The drained survivor
    table must equal the batch set algebra: min-id keeper per
    fingerprint, first-arrived batch wins — which is the oracle."""
    import shutil
    import tempfile

    from qctimeseries_spark.streaming import (
        ingest_dedup_stream,
        scoped_state_partitions,
        stage_file_batches,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    even = d.filter(F.col("doc_id") % 2 == 0)
    odd = d.filter(F.col("doc_id") % 2 == 1)
    recrawl = odd.filter(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    tmp = tempfile.mkdtemp(prefix="qcts_st12_")
    try:
        src = os.path.join(tmp, "src")
        # one file per planted batch via the shared one-job helper;
        # mtimes pin the file-source processing order (oldest first)
        # so batch 1 seeds the store
        stage_file_batches([even, odd.unionByName(recrawl)], src)
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # each micro-batch is a short chain of store-sized batch jobs
        # (anti-join + store append); 2.5k-doc batches make 32-way
        # shuffles pure task overhead — measured 6.6 s → 6.0 s at 8
        # partitions (r13)
        with scoped_state_partitions(spark):
            out = ingest_dedup_stream(
                stream,
                os.path.join(tmp, "store"),
                os.path.join(tmp, "out"),
                checkpoint_dir=os.path.join(tmp, "ckpt"),
            )
            # the survivor table must outlive the per-invocation temp
            # dir
            out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select("doc_id", "fingerprint")


def q_st13_stream_ingest_neardup(spark, sf_dir):
    """Streaming NEAR-dup ingestion: the d7 crawl scenario re-played as
    a stream.  Two source files arrive in mtime order — batch 1 the
    even-id docs, batch 2 the odd docs ∪ boilerplate-drifted re-crawls
    of every 6th doc — and each micro-batch pays the signature-store
    tiers via ``foreachBatch`` (``ingest_neardup_stream``).  The
    drained survivor table must equal the batch set algebra: d7's
    result plus the seed batch's own survivors, which is the oracle
    (same MinHash family, banding and verification, so both engines
    make identical LSH decisions)."""
    import shutil
    import tempfile

    from qctimeseries_spark.streaming import (
        ingest_neardup_stream,
        scoped_state_partitions,
        stage_file_batches,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    even = d.filter(F.col("doc_id") % 2 == 0)
    odd = d.filter(F.col("doc_id") % 2 == 1)
    drift = d.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" crawled mirror banner")).alias("text"),
    )
    tmp = tempfile.mkdtemp(prefix="qcts_st13_")
    try:
        src = os.path.join(tmp, "src")
        stage_file_batches([even, odd.unionByName(drift)], src)
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # per micro-batch the LSH tiers run ~10 store-sized batch jobs
        # (signatures, banding join, verify, store appends); 2.5k-doc
        # batches make 32-way shuffles pure task overhead — measured
        # 14.0 s → 4.7 s at 8 partitions (r13)
        with scoped_state_partitions(spark):
            out = ingest_neardup_stream(
                stream,
                os.path.join(tmp, "store"),
                os.path.join(tmp, "out"),
                k=15,
                bands=5,
                ngram=3,
                threshold=0.6,
                checkpoint_dir=os.path.join(tmp, "ckpt"),
            )
            out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select("doc_id", "fingerprint")


def q_st14_stream_ingest_embedding(spark, sf_dir):
    """Streaming SEMANTIC dedup ingestion: the d8 scenario re-played
    as a stream, completing the streaming ingestion triad (st12 exact,
    st13 lexical, st14 embedding).  Two source files arrive in mtime
    order — batch 1 the even-id vectors (seeding the unit-vector
    store), batch 2 the odd vectors ∪ perturbed re-encodes of every
    10th vector — and each micro-batch scores against the persistent
    store via ``foreachBatch`` (``ingest_embedding_stream``).  The
    drained survivor table must equal the batch set algebra: every
    seed vector (NULL max cosine — the store did not exist yet) plus
    d8's batch-2 survivors, which is the oracle (same left-fold
    cosine, same 9-dp rounding, so both engines make identical
    threshold decisions)."""
    import shutil
    import tempfile

    from qctimeseries_spark.datapipe.queries import _emb_corpus
    from qctimeseries_spark.streaming import (
        ingest_embedding_stream,
        scoped_state_partitions,
        stage_file_batches,
    )

    c = _emb_corpus(spark, sf_dir)
    even = c.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 1000000))
    batch = c.filter(
        ((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 1000000))
        | (F.col("vec_id") >= 1000000)
    )
    tmp = tempfile.mkdtemp(prefix="qcts_st14_")
    try:
        src = os.path.join(tmp, "src")
        stage_file_batches([even, batch], src)
        stream = (
            spark.readStream.schema("vec_id bigint, v array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # per micro-batch: brute cosine vs the store + store append —
        # ~1k-vector batches make 32-way shuffles pure task overhead;
        # measured 9.1 s → 6.1 s at 8 partitions (r13)
        with scoped_state_partitions(spark):
            out = ingest_embedding_stream(
                stream,
                os.path.join(tmp, "store"),
                os.path.join(tmp, "out"),
                id_col="vec_id",
                vec_col="v",
                threshold=0.9,
                # exact tier through sf1 for the oracle hash (see q_d8)
                max_store_brute=32768,
                checkpoint_dir=os.path.join(tmp, "ckpt"),
            )
            out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select(
        "vec_id", F.round("max_store_cos", 9).alias("max_store_cos")
    )


def q_st9_stream_asof(spark, sf_dir):
    """Streaming as-of enrichment: every event in the stream gains the
    most recent prior calibration record for its user, via the
    broadcast sorted-array resolution (stateless, stream-side
    shuffle-free), drained append-mode.  Oracle = the same DuckDB ASOF
    LEFT JOIN that checks the batch operator (j1) — the stream must
    converge to the batch answer."""
    from qctimeseries_spark.streaming import (
        asof_enrich_stream,
        run_available_now,
        stream_events,
    )

    cal = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 97 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cal_value"))
    )
    s = stream_events(spark, sf_dir).select("event_id", "user_id", "ts")
    out = run_available_now(
        asof_enrich_stream(s, cal, on="ts", by="user_id"),
        output_mode="append",
    )
    return out.select(
        "event_id",
        F.col("r_ts").alias("cal_ts"),
        F.col("r_cal_value").alias("cal_value"),
    )


def q_st4_session_windows(spark, sf_dir):
    """Streaming session windows: gap-merged per-user sessions drained
    via availableNow; oracle = batch lag/cumsum sessionization with a
    gap >= 30 min cut (session_window's [start, end) boundary)."""
    from qctimeseries_spark.streaming import (
        run_available_now,
        scoped_state_partitions,
        session_counts,
        stream_events,
    )

    # per-user session state (~5k keys); JVM session_window machinery
    # — measured 1.95 s → 1.48 s at 8 partitions (r13)
    with scoped_state_partitions(spark):
        return run_available_now(
            session_counts(stream_events(spark, sf_dir)),
            output_mode="complete",
        )


def q_t9_sessionize_salted(spark, sf_dir):
    """Skew-hardened two-phase sessionization (per-(key, time-block)
    sort + boundary merge) — per-session row counts, oracled against
    the plain lag/cumsum formulation: the salted path must reproduce
    the per-key-sort ids exactly, cross-engine."""
    from qctimeseries_spark.windows import sessionize_salted

    ev = read_table(spark, sf_dir, "events")
    s = sessionize_salted(
        ev, "user_id", "ts", gap_minutes=30.0, ties=["event_id"],
        block_hours=24.0,
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )


def q_st5_stream_enrich(spark, sf_dir):
    """Stream-static enrichment: the events stream joined map-side to
    broadcast customer + nation dimensions (re-read per micro-batch),
    drained append-mode.  Oracle = the equivalent batch left joins."""
    from qctimeseries_spark.streaming import (
        enrich_stream,
        run_available_now,
        stream_events,
    )

    ev = stream_events(spark, sf_dir)
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    enriched = enrich_stream(
        enrich_stream(ev, cust, "user_id"), nation, "c_nationkey"
    ).select("event_id", "user_id", "c_mktsegment", "n_name", "value")
    return run_available_now(enriched, output_mode="append")


def q_w9_regularize(spark, sf_dir):
    """Fixed-cadence grid materialization with gap rows: user 7's
    series (deduped per instant) regularized to a 6 h cadence; oracle
    = DuckDB generate_series + left join."""
    from qctimeseries_spark.windows import regularize

    s = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .groupBy("ts")
        .agg(F.max("value").alias("value"))
    )
    return regularize(s, "ts", step_minutes=360.0).select(
        "grid_ts", "value", "is_gap"
    )


def q_w10_ffill(spark, sf_dir):
    """Regularize user 7's series to 6 h cadence, then forward-fill the
    gap rows with the two-phase (block + boundary-carry) LOCF — must
    equal the oracle's single global ignore-nulls window."""
    from qctimeseries_spark.windows import fill_forward, regularize

    s = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .groupBy("ts")
        .agg(F.max("value").alias("value"))
    )
    reg = regularize(s, "ts", step_minutes=360.0)
    return fill_forward(
        reg, "grid_ts", "value", block_hours=48.0
    ).select("grid_ts", "value", "is_gap", "value_filled")


def q_w18_ffill_maxgap(spark, sf_dir):
    """w10's forward fill with the QC-integrity knob under the driver
    hash: ``max_gap_seconds=43200`` (12 h) bounds how far a value
    carries, so grid rows more than two 6-h steps past their source
    observation stay NULL instead of inventing data across day-long
    holes — the behavior that separates production LOCF from the
    textbook one.  Same two-phase (block + boundary-carry) plan; the
    cap is one extra projection on the carried source timestamp."""
    from qctimeseries_spark.windows import fill_forward, regularize

    s = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .groupBy("ts")
        .agg(F.max("value").alias("value"))
    )
    reg = regularize(s, "ts", step_minutes=360.0)
    return fill_forward(
        reg, "grid_ts", "value", block_hours=48.0,
        max_gap_seconds=43200.0,
    ).select("grid_ts", "value", "is_gap", "value_filled")


def q_a10_rolling_outliers(spark, sf_dir):
    """Trailing 48 h rolling mean/std/count + z-score outlier
    candidates over user 7's series, via the halo-block range window —
    must equal the oracle's single global RANGE BETWEEN window."""
    from qctimeseries_spark.windows import flag_outlier_candidates

    s = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .groupBy("ts")
        .agg(F.max("value").alias("value"))
    )
    return flag_outlier_candidates(
        s, "ts", "value", window_seconds=48 * 3600.0, z=3.0, min_n=5
    ).select("ts", "value", "roll_mean", "roll_std", "roll_n", "is_outlier")


def q_w11_interpolate(spark, sf_dir):
    """Bucket user 7's series to 6 h averages, regularize the grid,
    then linearly interpolate across the holes with the two-phase
    directional-carry — oracle = global IGNORE NULLS windows both
    directions + the same time-weighted blend."""
    from qctimeseries_spark.windows import interpolate_linear, regularize

    width_us = 6 * 3600 * 1_000_000
    s = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .groupBy(
            F.expr(
                f"timestamp_micros((unix_micros(ts) DIV {width_us}L)"
                f" * {width_us}L)"
            ).alias("ts")
        )
        .agg(F.round(F.avg("value"), 6).alias("value"))
    )
    reg = regularize(s, "ts", step_minutes=360.0)
    return interpolate_linear(reg, "grid_ts", "value").select(
        "grid_ts", "value", "is_gap", "value_interp"
    )


def q_st6_stream_anomalies(spark, sf_dir):
    """Streaming per-key expanding z-score anomalies (custom stateful
    operator) drained append-mode; oracle = batch expanding-window SQL
    over strictly-prior observations."""
    from qctimeseries_spark.streaming import (
        detect_anomalies_stateful,
        run_available_now,
        stream_events,
    )

    return run_available_now(
        detect_anomalies_stateful(
            stream_events(spark, sf_dir), z=2.0, min_n=10
        ),
        output_mode="append",
    )


def q_a11_qc_rules(spark, sf_dir):
    """Range/spike/flatline screening over user 7's series; lag comes
    from the block-carried shift_global, oracle = plain global lag."""
    from qctimeseries_spark.rules import apply_qc_rules

    s = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .groupBy("ts")
        .agg(F.max("value").alias("value"))
    )
    return apply_qc_rules(
        s, "value", "ts", lo=5.0, hi=400.0, max_step=300.0, flatline_n=2
    ).select(
        "ts", "value", "rule_range", "rule_spike", "rule_flatline", "any_rule"
    )


def q_w12_resample(spark, sf_dir):
    """Epoch-anchored 24 h downsampling per user: avg/min/max/count of
    value — one map-side-combinable shuffle on (user, bucket)."""
    from qctimeseries_spark.windows import resample

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return resample(
        ev, "ts", step_minutes=1440.0,
        aggs={"value": ["avg", "min", "max", "count"]},
        key_cols=["user_id"],
    )


def q_w13_regularize_by_key(spark, sf_dir):
    """Per-user 12 h grid materialization over each user's own extent
    (users 0–9, per-instant dedup); oracle = per-row generate_series."""
    from qctimeseries_spark.windows import regularize_by_key

    s = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return regularize_by_key(
        s, "ts", step_minutes=720.0, key_cols="user_id"
    ).select("user_id", "grid_ts", "value", "is_gap")


def q_st8_stream_ewma(spark, sf_dir):
    """Streaming per-key EWMA drained append-mode; oracle = batch
    per-key sequential fold — identical fold order on both engines, so
    values are bit-equal even before the 6-dp rounding."""
    from qctimeseries_spark.streaming import (
        ewma_stateful,
        run_available_now,
        stream_events,
    )

    return run_available_now(
        ewma_stateful(stream_events(spark, sf_dir), alpha=0.3),
        output_mode="append",
    )


def q_a14_ewma(spark, sf_dir):
    """Batch per-key exponential smoothing over 6 h-bucketed per-user
    series (users < 10).  The per-key path folds sequentially — the
    SAME order as the oracle's per-key list_reduce — so values are
    bit-equal before the 6-dp rounding at any scale factor.  (The
    keyless affine block fold regroups the float arithmetic, which can
    land the occasional value on the other side of a rounding grid
    line; it is pytest-verified against pandas instead of hash-pinned —
    see tests/test_windows.py and tests/test_properties.py.)"""
    from qctimeseries_spark.windows import ewma

    width_us = 6 * 3600 * 1_000_000
    s = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .groupBy(
            "user_id",
            F.expr(
                f"timestamp_micros((unix_micros(ts) DIV {width_us}L)"
                f" * {width_us}L)"
            ).alias("ts"),
        )
        .agg(F.round(F.avg("value"), 6).alias("value"))
    )
    return ewma(
        s, "ts", "value", alpha=0.5, key_col="user_id"
    ).select("user_id", "ts", "value", "value_ewma")


def q_a13_progress_by_window(spark, sf_dir):
    """A1's dual-denominator progress at window granularity — the
    navigator's 'which windows still need eyes' dashboard."""
    from qctimeseries_spark.summary import progress_by_window

    return progress_by_window(_windowed(spark, sf_dir), "value")


def q_j3_asof_forward(spark, sf_dir):
    """Forward as-of: every event gains the EARLIEST calibration record
    at-or-after it per user; oracle = union + first-following window
    (DuckDB's native ASOF is backward-only)."""
    from qctimeseries_spark.joins import asof_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    cal = (
        ev.filter(F.col("event_id") % 97 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cal_value"))
    )
    out = asof_join(ev, cal, on="ts", by="user_id", direction="forward")
    return out.select(
        "event_id",
        F.col("r_ts").alias("cal_ts"),
        F.col("r_cal_value").alias("cal_value"),
    )


def q_st7_stream_resample(spark, sf_dir):
    """Streaming resample drained APPEND-mode: equals the batch w12
    aggregation bucket-for-bucket for every watermark-closed bucket —
    the oracle mirrors the eviction horizon (bucket end ≤ max event
    time − watermark), so the production emission semantics themselves
    are what the hash pins."""
    from qctimeseries_spark.streaming import (
        run_available_now,
        scoped_state_partitions,
        stream_events,
        stream_resample,
    )

    ev = stream_events(spark, sf_dir).select("user_id", "ts", "value")
    # per-(user, day) aggregate state; JVM windowed-agg machinery —
    # measured 2.5 s → 1.25 s at 8 partitions (r13)
    with scoped_state_partitions(spark):
        return run_available_now(
            stream_resample(
                ev, "ts", step_minutes=1440.0,
                aggs={"value": ["avg", "min", "max", "count"]},
                key_cols=["user_id"],
            ),
            output_mode="append",
        )


def q_st19_stream_sessions(spark, sf_dir):
    """Streaming sessionization on the engine's NATIVE session_window
    (no Python in the loop — Spark itself maintains the merging
    per-key session state): 30-min gap like t1, drained append-mode,
    emitting every watermark-finalized session as (user, start,
    end = last event + gap, first/last event, n_events).  The oracle
    replays the same gap-merge as an integer-µs island detection and
    mirrors the emission horizon (session_end <= max event time −
    watermark — the st7 precedent), so the hash pins the engine's own
    session semantics, boundary rule (the merge boundary is INCLUSIVE:
    an event AT exactly last+gap EXTENDS the session — measured on
    Spark's session_window and pinned by
    test_stream_sessions_native_session_window) and eviction contract.

    The corpus timestamps are µs-random, so a same-user gap of exactly
    1800.000000 s never occurs naturally; to keep the hash check
    honest about the boundary, a synthetic user -1 with exactly that
    gap (two events 1800 s apart, anchored at event_id 1's ts) is
    unioned into the stream and mirrored row-for-row by the oracle —
    the inclusive rule merges the pair into ONE 2-event session, the
    old exclusive rule would split it."""
    from qctimeseries_spark.streaming import (
        run_available_now,
        scoped_state_partitions,
        stream_events,
        stream_sessions,
    )

    ev = stream_events(spark, sf_dir).select("user_id", "ts")
    # exact-gap boundary fixture: user -1, two events exactly 1800 s
    # apart (anchored at event_id 1 — ~720 h before max(ts) at every
    # SF, so the session always clears the 1-hour emission horizon)
    anchor = stream_events(spark, sf_dir).filter(F.col("event_id") == 1)
    pair = anchor.select(
        F.lit(-1).cast("bigint").alias("user_id"), F.col("ts")
    ).unionByName(
        anchor.select(
            F.lit(-1).cast("bigint").alias("user_id"),
            (F.col("ts") + F.expr("INTERVAL 1800 SECONDS")).alias("ts"),
        )
    )
    # native session_window keeps per-user merging state in the JVM
    # store — measured 2.9 s → 1.5 s at 8 partitions (r13)
    with scoped_state_partitions(spark):
        return run_available_now(
            stream_sessions(ev.unionByName(pair), gap_minutes=30.0),
            output_mode="append",
        )


def q_a12_rolling_by_key(spark, sf_dir):
    """Per-key trailing 48 h rolling outlier candidates over ALL users
    — the partitioned-window path (no halo needed across keys)."""
    from qctimeseries_spark.windows import flag_outlier_candidates

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return flag_outlier_candidates(
        ev, "ts", "value",
        window_seconds=96 * 3600.0, z=2.0, min_n=5, key_col="user_id",
    ).filter(F.col("is_outlier") == 1).select(
        "user_id", "ts", "value", "roll_mean", "roll_std", "roll_n"
    )


def q_j4_skew_join(spark, sf_dir):
    """Skew-hardened fact⋈dimension join: ~75% of events collapse onto
    ONE synthetic account key (the power-law shape that turns a
    shuffled join's hot reducer into the stage straggler at 100 TB).
    `skew_join` samples the key frequencies, routes the hot key
    through a deterministic-salted replicated leg (cold keys join
    normally, AQE free to choose), and unions — row-identical to the
    plain join for ANY probe estimate, so the oracle is the plain SQL
    join."""
    from qctimeseries_spark.joins import skew_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.when(F.col("user_id") % 4 < 3, F.lit(1).cast("bigint"))
        .otherwise(F.col("user_id"))
        .alias("account_id"),
    )
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("account_id"), "c_mktsegment"
    )
    out = skew_join(
        ev, cust, "account_id", how="left", strategy="salt", salt=8
    )
    return out.select("event_id", "account_id", "c_mktsegment", "value")


def q_a16_seasonal(spark, sf_dir):
    """Seasonal-profile anomaly screen: each event vs the exact
    discrete median / IQR of its (event_type, hour-of-day) bucket —
    Tukey fences on robust per-phase statistics (catches the reading
    that is normal at 3 p.m. but anomalous at 3 a.m., which a trailing
    rolling window averages away).  Profile agg shuffles only three
    projected columns; the profile (|types| × 24 rows) broadcasts
    back.  percentile_disc picks data elements, so every emitted
    number is an IEEE op over engine-identical inputs — bit-exact
    cross-engine with no rounding."""
    from qctimeseries_spark.windows import seasonal_baseline

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    out = seasonal_baseline(
        ev, "ts", "value", by=["event_type"], season="hour", iqr_mult=1.5
    )
    return out.select(
        "event_id",
        "event_type",
        F.col("season").alias("hod"),
        "value",
        "seasonal_med",
        "seasonal_iqr",
        "seasonal_dev",
        "is_anomaly",
    )


QUERIES.update(
    {
        "a16_seasonal": q_a16_seasonal,
        "j4_skew_join": q_j4_skew_join,
        "j2_range_join": q_j2_range_join,
        "a9_percentiles": q_a9_percentiles,
        "st4_session_windows": q_st4_session_windows,
        "t9_sessionize_salted": q_t9_sessionize_salted,
        "st5_stream_enrich": q_st5_stream_enrich,
        "w9_regularize": q_w9_regularize,
        "w10_ffill": q_w10_ffill,
        "w18_ffill_maxgap": q_w18_ffill_maxgap,
        "a10_rolling_outliers": q_a10_rolling_outliers,
        "w11_interpolate": q_w11_interpolate,
        "st6_stream_anomalies": q_st6_stream_anomalies,
        "a11_qc_rules": q_a11_qc_rules,
        "a12_rolling_by_key": q_a12_rolling_by_key,
        "w12_resample": q_w12_resample,
        "st7_stream_resample": q_st7_stream_resample,
        "st19_stream_sessions": q_st19_stream_sessions,
        "w13_regularize_by_key": q_w13_regularize_by_key,
        "j3_asof_forward": q_j3_asof_forward,
        "a13_progress_by_window": q_a13_progress_by_window,
        "a14_ewma": q_a14_ewma,
        "st8_stream_ewma": q_st8_stream_ewma,
        "st9_stream_asof": q_st9_stream_asof,
        "a15_cusum": q_a15_cusum,
        "st10_stream_cusum": q_st10_stream_cusum,
        "st11_stream_psi": q_st11_stream_psi,
        "st12_stream_ingest_dedup": q_st12_stream_ingest_dedup,
        "st13_stream_ingest_neardup": q_st13_stream_ingest_neardup,
        "st14_stream_ingest_embedding": q_st14_stream_ingest_embedding,
        "st15_stream_knn_serve": q_st15_stream_knn_serve,
        "s10_jsonl_roundtrip": q_s10_jsonl_roundtrip,
    }
)

# ---------------------------------------------------------------------------
# round-8 continuation: SCD2 interval compression + ORC roundtrip
# ---------------------------------------------------------------------------


def q_a17_change_intervals(spark, sf_dir):
    """SCD-type-2 history build: each user's event_type change log
    compressed into validity intervals (valid_from, valid_to, dense
    version) — consecutive same-value rows collapse, NULL valid_to
    marks the current run.  One key shuffle, two window passes (the
    second over the already-collapsed changepoints)."""
    from qctimeseries_spark.windows import change_intervals

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    return change_intervals(
        ev, "ts", "user_id", "event_type", tiebreak_col="event_id"
    )


def q_s11_orc_roundtrip(spark, sf_dir):
    """ORC sink then source over the documents corpus (zstd) — the
    second columnar interchange format next to parquet (S4); the
    roundtrip must be lossless, so the oracle reads the original
    table."""
    path = os.path.join(_SCRATCH, "orc_roundtrip")
    read_table(spark, sf_dir, "documents").write.mode(
        "overwrite"
    ).option("compression", "zstd").orc(path)
    return spark.read.orc(path).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


QUERIES["a17_change_intervals"] = q_a17_change_intervals
QUERIES["s11_orc_roundtrip"] = q_s11_orc_roundtrip


def q_j5_interval_join(spark, sf_dir):
    """Interval-OVERLAP join: per-user DAILY activity intervals
    [min ts, max ts] x 4-hour maintenance windows (every 997th event)
    -- which activity runs a maintenance window touched.  Both sides
    explode to 24 h buckets and meet on bucket equality; a pair is
    kept only in its overlap's FIRST bucket, so the emission is
    exactly-once with NO dedup shuffle (see joins.interval_join)."""
    from qctimeseries_spark.joins import interval_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    act = (
        ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("_d"))
        .agg(F.min("ts").alias("a_lo"), F.max("ts").alias("a_hi"))
        .select("user_id", "a_lo", "a_hi")
    )
    maint = ev.filter(F.col("event_id") % 997 == 0).select(
        F.col("event_id").alias("m_id"),
        F.col("ts").alias("m_lo"),
        (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("m_hi"),
    )
    out = interval_join(
        act, maint,
        left_lo="a_lo", left_hi="a_hi",
        right_lo="m_lo", right_hi="m_hi",
        bucket_hours=24.0,
    )
    return out.select("user_id", "a_lo", "a_hi", "m_id", "m_lo", "m_hi")


def q_h10_returned_revenue(spark, sf_dir):
    """TPC-H-Q10 shape: top-20 customers by revenue lost to returned
    items in a quarter.  Both date bounds and the returnflag filter
    push to the scans; nation broadcasts; the top-20 runs as
    TakeOrderedAndProject (per-partition heaps, no global sort);
    money sums in exact decimal, double at the edge; c_custkey
    tie-break pins the cut deterministically."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    rev = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


QUERIES["j5_interval_join"] = q_j5_interval_join
QUERIES["h10_returned_revenue"] = q_h10_returned_revenue


def q_h11_nation_volume(spark, sf_dir):
    """TPC-H-Q7 shape: yearly shipping volume between a nation PAIR in
    both directions (supplier nation x customer nation).  The two
    nation dims broadcast with their name filters applied BEFORE the
    join, so only the two nations' keys ever reach the fact-side
    joins; the pair condition lives in the join output (either
    direction), volume sums in exact decimal, and year() is exact
    integer extraction."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        F.year("l_shipdate").alias("l_year"),
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    s = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.filter(F.col("n_name").isin("NATION_3", "NATION_7")).select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin("NATION_3", "NATION_7")).select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    vol = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cnk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(vol.alias("revenue"))
    )


def q_h12_promo_share(spark, sf_dir):
    """TPC-H-Q14 shape: monthly promo-revenue share.  The part dim
    joins on partkey (broadcastable); promo membership is a p_type
    prefix test resolved in the aggregation as a conditional decimal
    sum — one pass over the date-filtered fact, two exact sums, one
    division at the edge."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    joined = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        F.month("l_shipdate").alias("ship_month"),
        rev.alias("_rev"),
        F.when(
            F.col("p_type").startswith("PROMO"), rev
        ).otherwise(F.lit(0).cast("decimal(18,2)")).alias("_promo"),
    )
    return joined.groupBy("ship_month").agg(
        F.sum("_promo").cast("double").alias("promo_revenue"),
        F.sum("_rev").cast("double").alias("total_revenue"),
        F.round(
            F.lit(100.0)
            * F.sum("_promo").cast("double")
            / F.sum("_rev").cast("double"),
            6,
        ).alias("promo_share_pct"),
    )


def q_h13_disjunctive_filter(spark, sf_dir):
    """TPC-H-Q19 shape: revenue under an OR-of-ANDs predicate (brand x
    size x quantity bands).  The partkey equi-join carries the
    disjunction; the p_size/p_brand legs reach the part scan and the
    quantity bounds reach the lineitem scan as pushed filters (the
    union of the OR legs' ranges), Catalyst splitting the residual OR
    above — the disjunctive-pushdown stress test."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 15))
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & (F.col("p_size").between(5, 20))
            & (F.col("l_quantity").between(10, 30))
        )
    )
    rev = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("double")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            rev.alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def q_h14_order_distribution(spark, sf_dir):
    """TPC-H-Q13 shape: the customer order-count DISTRIBUTION — the
    one relational pattern h1-h13 didn't cover: a LEFT OUTER join
    aggregated twice (per-customer count, then a histogram of those
    counts), where customers with NO qualifying orders must surface
    as c_count = 0 (the outer join's whole point — an inner join
    silently drops them).  The filter (exclude 1-URGENT, Q13's
    comment-filter stand-in) sits in the JOIN CONDITION, not a WHERE,
    so a customer whose every order is urgent still lands in the 0
    bucket.  Both aggregations key on grouping columns bounded by the
    customer count; the orders side reaches its scan with the
    priority filter pushed."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


QUERIES["h14_order_distribution"] = q_h14_order_distribution

QUERIES["h11_nation_volume"] = q_h11_nation_volume
QUERIES["h12_promo_share"] = q_h12_promo_share
QUERIES["h13_disjunctive_filter"] = q_h13_disjunctive_filter


def q_h15_small_qty_revenue(spark, sf_dir):
    """TPC-H-Q17 shape (adapted: the avg ranges over lineitem — this
    schema has no partsupp): revenue locked in small-quantity orders
    of one brand's parts, where a lineitem qualifies if its quantity
    is below 20% of its part's average quantity.  Q17's correlated
    scalar subquery is re-expressed as a per-part window over the
    SAME brand-filtered join (one fact scan, no self-join), and the
    20%-of-average comparison cross-multiplies in exact decimal
    (5·qty·n < Σqty) so no float average or division exists anywhere.
    The window partitions by partkey — bounded per-part frames, never
    a global sort."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    w = Window.partitionBy("p_partkey")
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("_sq", F.sum(_dec("l_quantity")).over(w))
        .withColumn("_nq", F.count(F.lit(1)).over(w))
    )
    small = joined.filter(
        _dec("l_quantity") * F.col("_nq") * F.lit(5) < F.col("_sq")
    )
    return small.agg(
        (
            F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


def q_h16_important_parts(spark, sf_dir):
    """TPC-H-Q11 shape (adapted: value from lineitem revenue — no
    partsupp): parts whose revenue from NATION_3's suppliers exceeds
    a fixed fraction of that nation's total.  The global threshold is
    a single-row aggregate broadcast back over the per-part frame
    (the t38 scalar-crossJoin pattern — a 1-row nested-loop join,
    never a corpus product), and the fraction test cross-multiplies
    in exact decimal (value·10000 > total) so no division exists."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    per_part = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("_val"))
    )
    total = per_part.agg(F.sum("_val").alias("_tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_val") * F.lit(10000) > F.col("_tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("_val").cast("double").alias("part_value"),
        )
    )


def q_h17_top_supplier(spark, sf_dir):
    """TPC-H-Q15 shape: the supplier(s) with the maximum revenue over
    a fixed ship-date quarter.  Q15's view-with-max becomes a
    per-supplier aggregate whose single-row MAX broadcasts back over
    it (scalar crossJoin); the equality filter runs on the EXACT
    decimal revenue, so ties are exact, not float-fuzzy.  The
    supplier dim broadcasts for the name attach."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum(rev).alias("_rev"))
    top = per_supp.agg(F.max("_rev").alias("_maxrev"))
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.crossJoin(F.broadcast(top))
        .filter(F.col("_rev") == F.col("_maxrev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.col("_rev").cast("double").alias("total_revenue"),
        )
    )


def q_h18_supplier_part_counts(spark, sf_dir):
    """TPC-H-Q16 shape (lineitem stands in for partsupp): distinct
    supplier counts per (brand, size) for a part subset, EXCLUDING
    one brand and excluding suppliers from a denylist (negative
    account balance — Q16's complaints list), expressed as a
    broadcast LEFT ANTI join, never a NOT IN subquery that would
    re-scan per row.  The distinct-count shuffles once on the
    (brand, size) grouping key after a local distinct."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_size") <= 25)
    ).select("p_partkey", "p_brand", "p_size")
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )


def q_h19_waiting_supplier(spark, sf_dir):
    """TPC-H-Q21 shape (l_shipdate stands in for commit/receipt):
    suppliers from one nation who shipped the LAST item of a
    finalized multi-supplier order — EXISTS (another supplier in the
    order) as a LEFT SEMI join and NOT EXISTS (another supplier
    shipped later) as a LEFT ANTI join, both correlating key equality
    plus a cross-side predicate, so existence resolves with no row
    duplication and no post-join dedup.  The nation/supplier dims
    broadcast; the order-key self-joins shuffle on l_orderkey."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    f_orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    ).select("n_nationkey")
    s_nat = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    l1 = (
        li.join(F.broadcast(s_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("_ok3"),
        F.col("l_suppkey").alias("_sk3"),
        F.col("l_shipdate").alias("_sd3"),
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("_ok2"))
            & (F.col("l_suppkey") != F.col("_sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("_ok3"))
            & (F.col("l_suppkey") != F.col("_sk3"))
            & (F.col("_sd3") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return waited.groupBy("s_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("numwait")
    )


def q_h20_balance_gate(spark, sf_dir):
    """TPC-H-Q22 shape: customers with above-average positive account
    balance and NO recent orders, counted per nation.  The global
    average is a single-row (Σ, n) aggregate broadcast back (scalar
    crossJoin) with the comparison cross-multiplied in exact decimal
    (bal·n > Σ) — no float average; the "no recent orders" test is a
    LEFT ANTI join against the date-filtered orders scan (the filter
    reaches the parquet scan, so the anti-join state is only the
    recent keys)."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("_tot"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    recent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(_dec("c_acctbal") * F.col("_cnt") > F.col("_tot"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


def q_h21_min_cost_supplier(spark, sf_dir):
    """TPC-H-Q2 shape (min lineitem price stands in for supplycost):
    for each large part, the EUROPE supplier(s) quoting the minimum
    price.  The per-(part, supplier) min aggregates once; the
    per-part minimum is a window over that aggregate PARTITIONED by
    partkey (bounded frames — Q2's correlated MIN subquery with no
    self-join and no global sort); the argmin filter compares exact
    decimals so ties surface exactly as Q2's does."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_size") >= 40
    ).select("p_partkey")
    s = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    s_eur = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    costs = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s_eur), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name")
        .agg(F.min(_dec("l_extendedprice")).alias("_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("_min", F.min("_cost").over(w))
        .filter(F.col("_cost") == F.col("_min"))
        .select(
            "p_partkey", "s_suppkey", "s_name",
            F.col("_cost").cast("double").alias("cost"),
        )
    )


def q_a18_trend(spark, sf_dir):
    """Per-key least-squares trend (slope + r²) of value over time —
    computed EXACTLY: x is the per-user µs offset from the user's
    first event (centered so Σx² fits 128-bit integer math at any
    corpus size), y is the 2-dp value in exact integer cents, and all
    five regression sums accumulate in DECIMAL(38,0) (DuckDB:
    HUGEINT).  Only the final slope/r² divisions run in double, with
    the operand order pinned on both engines, so the hash compare is
    bit-exact.  Two aggregations, both keyed on user_id — no window,
    no global sort; the min(us) attach is an agg-side join AQE sizes."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("_us"),
        (F.col("value").cast("decimal(18,2)") * F.lit(100))
        .cast("decimal(20,0)")
        .alias("_y"),
    )
    mins = ev.groupBy("user_id").agg(F.min("_us").alias("_us0"))
    b = ev.join(mins, "user_id").select(
        "user_id",
        (F.col("_us") - F.col("_us0")).cast("decimal(20,0)").alias("_x"),
        "_y",
    )
    s = b.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    deny = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    return (
        s.withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn("_deny", deny)
        .filter((F.col("_n") >= 2) & (F.col("_den") != 0))
        .select(
            "user_id",
            F.col("_n").cast("bigint").alias("n"),
            (
                (F.col("_num").cast("double") / F.col("_den").cast("double"))
                * F.lit(10000.0)
            ).alias("slope_per_sec"),
            F.when(
                F.col("_deny") > 0,
                (F.col("_num").cast("double") * F.col("_num").cast("double"))
                / (
                    F.col("_den").cast("double")
                    * F.col("_deny").cast("double")
                ),
            ).alias("r2"),
        )
    )


def q_h22_rollup_revenue(spark, sf_dir):
    """Hierarchical aggregate (GROUP BY ROLLUP — the TPC-H Q1 shape
    one level up): revenue and row counts at (returnflag, linestatus),
    per returnflag, and grand-total levels in ONE pass.  Spark plans
    rollup as a single Expand + hash aggregate — the fact scans once
    and each level is a map-side partial, no per-level re-scan or
    union; super-aggregate rows carry NULL group keys on both engines.
    Money sums in exact decimal, cast to double at the edge."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"
    )
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def q_s12_partitioned_roundtrip(spark, sf_dir):
    """Partitioned sink then partition-PRUNED source: the seeded QC
    table writes day-partitioned parquet (the 100 TB layout — one
    directory per day), and the read-back filters on the partition
    column, which must prune to that day's directory (PartitionFilters
    in the scan, pinned by pytest — the data files of 29 other days
    are never opened).  Partition values round-trip through directory
    names; the explicit int cast pins the inferred type."""
    path = os.path.join(_SCRATCH, "partitioned_roundtrip")
    seeded = _seeded(spark, sf_dir).withColumn(
        "qc_day", F.dayofmonth("ts").cast("int")
    )
    seeded.write.mode("overwrite").partitionBy("qc_day").parquet(path)
    return (
        spark.read.parquet(path)
        .filter(F.col("qc_day") == 15)
        .select(
            "event_id", "value", "value_qcflag",
            F.col("qc_day").cast("int").alias("qc_day"),
        )
    )


def q_a19_autocorr(spark, sf_dir):
    """Per-key lag-1 autocorrelation, computed EXACTLY: consecutive
    (y_t, y_{t+1}) pairs per user (ordered by ts then event_id, the
    engine-wide tie rule) feed the same integer-cent / DECIMAL(38,0)
    machinery as a18 — Pearson correlation of the pair series with
    only the final divide-by-sqrt in double, operand order pinned on
    both engines (sqrt is correctly rounded IEEE on both).  One keyed
    window for the lead, one keyed aggregation — no global sort."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * F.lit(100))
        .cast("decimal(20,0)")
        .alias("_y"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    pairs = ev.withColumn("_ylead", F.lead("_y").over(w)).filter(
        F.col("_ylead").isNotNull()
    )
    s = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("_n"),
        F.sum("_y").alias("_sx"),
        F.sum("_ylead").alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_ylead")).alias("_sxy"),
        F.sum(F.col("_ylead") * F.col("_ylead")).alias("_syy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    return (
        s.withColumn("_num", num)
        .withColumn("_dx", dx)
        .withColumn("_dy", dy)
        .filter((F.col("_n") >= 2) & (F.col("_dx") > 0) & (F.col("_dy") > 0))
        .select(
            "user_id",
            F.col("_n").cast("bigint").alias("n_pairs"),
            (
                F.col("_num").cast("double")
                / F.sqrt(F.col("_dx").cast("double") * F.col("_dy").cast("double"))
            ).alias("acf1"),
        )
    )


QUERIES["h22_rollup_revenue"] = q_h22_rollup_revenue
QUERIES["s12_partitioned_roundtrip"] = q_s12_partitioned_roundtrip
QUERIES["a19_autocorr"] = q_a19_autocorr
QUERIES["h15_small_qty_revenue"] = q_h15_small_qty_revenue
QUERIES["h16_important_parts"] = q_h16_important_parts
QUERIES["h17_top_supplier"] = q_h17_top_supplier
QUERIES["h18_supplier_part_counts"] = q_h18_supplier_part_counts
QUERIES["h19_waiting_supplier"] = q_h19_waiting_supplier
QUERIES["h20_balance_gate"] = q_h20_balance_gate
QUERIES["h21_min_cost_supplier"] = q_h21_min_cost_supplier
QUERIES["a18_trend"] = q_a18_trend




def q_st18_stream_scd2(spark, sf_dir):
    """Streaming SCD2 maintenance: the events change log arrives as
    two in-order micro-batches (split at a fixed timestamp so no key's
    equal-ts rows straddle batches); each key carries ONE open
    interval as state and emits intervals as they CLOSE.  The drained
    output must equal the batch a17 operator's closed rows
    (valid_to IS NOT NULL) — which is the oracle."""
    import shutil
    import tempfile

    from qctimeseries_spark.streaming import (
        run_available_now,
        stage_file_batches,
        stream_change_intervals,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    tmp = tempfile.mkdtemp(prefix="qcts_st18_")
    # NOTE: deliberately NOT scoping shuffle partitions down here (the
    # st23 treatment): this drain's cost is the PYTHON stateful
    # operator (applyInPandasWithState), which wants parallelism —
    # measured 8 partitions = 14.8 s best-of vs 32 = ~5 s.  The st23
    # case is the opposite because its join is pure JVM machinery.
    try:
        src = os.path.join(tmp, "src")
        stage_file_batches(
            [ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)],
            src,
        )
        stream = (
            spark.readStream
            .schema(
                "event_id bigint, user_id bigint, ts timestamp,"
                " event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = run_available_now(
            stream_change_intervals(stream), output_mode="append"
        )
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


QUERIES["st18_stream_scd2"] = q_st18_stream_scd2


def q_w14_bfill(spark, sf_dir):
    """w10's fixture run through the NOCB mirror: regularize user 7's
    series to a 6 h grid, then BACKWARD-fill the gap rows with the
    two-phase (block + boundary-carry) fill run in reverse —
    fill_backward existed since round 5 but was pytest-only; this
    puts it under the driver hash against the oracle's single global
    ignore-nulls FOLLOWING window.  Rows after the last observation
    stay NULL (no next observation to carry)."""
    from qctimeseries_spark.windows import fill_backward, regularize

    s = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .groupBy("ts")
        .agg(F.max("value").alias("value"))
    )
    reg = regularize(s, "ts", step_minutes=360.0)
    return fill_backward(
        reg, "grid_ts", "value", block_hours=48.0
    ).select("grid_ts", "value", "is_gap", "value_bfilled")


QUERIES["w14_bfill"] = q_w14_bfill


def q_j6_asof_tolerance(spark, sf_dir):
    """As-of join with a staleness TOLERANCE: j1's most-recent-prior
    calibration lookup, but matches older than 6 hours are nulled
    (pandas merge_asof(tolerance=...) semantics — a calibration that
    stale is no calibration).  Exercises the tolerance projection of
    asof_join under the driver hash (previously pytest-only): the
    staleness test is exact integer µs on the ORIGINAL matched
    timestamp, applied to every carried column in one projection.
    Oracle = DuckDB ASOF LEFT JOIN with the same µs cutoff."""
    from qctimeseries_spark.joins import asof_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    cal = (
        ev.filter(F.col("event_id") % 97 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cal_value"))
    )
    out = asof_join(
        ev, cal, on="ts", by="user_id", tolerance_seconds=6 * 3600.0
    )
    return out.select(
        "event_id",
        F.col("r_ts").alias("cal_ts"),
        F.col("r_cal_value").alias("cal_value"),
    )


QUERIES["j6_asof_tolerance"] = q_j6_asof_tolerance


def q_j7_nearest_join(spark, sf_dir):
    """Nearest-in-time join: every event gains its user's CLOSEST
    calibration record in either direction (tie → the earlier
    record).  Both directional carries resolve in ONE keyed window
    pass (one shuffle); oracle = two DuckDB ASOF joins (>= and <=)
    with the distance tie-break replayed in exact integer µs."""
    from qctimeseries_spark.joins import nearest_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    cal = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 97 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cal_value"))
    )
    out = nearest_join(ev, cal, on="ts", by="user_id")
    return out.select(
        "event_id",
        F.col("r_ts").alias("cal_ts"),
        F.col("r_cal_value").alias("cal_value"),
    )


QUERIES["j7_nearest_join"] = q_j7_nearest_join


def q_st21_stream_stream_join(spark, sf_dir):
    """Watermarked stream-STREAM join (the symmetric stateful join —
    clicks attributed to the purchase they preceded): purchases and
    clicks replay as two streams over the same source, each purchase
    matching the same user's clicks within the prior 4 hours.  Both
    sides buffer in the state store with eviction driven by the
    watermark + time-range condition; drained append-mode.  Oracle =
    the equivalent DuckDB range join."""
    from qctimeseries_spark.streaming import (
        run_available_now,
        scoped_state_partitions,
        stream_events,
        stream_stream_join,
    )

    purch = stream_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "ts")
    clicks = stream_events(spark, sf_dir).filter(
        F.col("event_type") == "click"
    ).select("event_id", "user_id", "ts")
    joined = stream_stream_join(
        purch, clicks, by="user_id", lookback_seconds=4 * 3600.0
    )
    # the symmetric join's drain cost is store machinery × partitions
    # (4 stores per partition per side per batch); ~20k keys make the
    # batch-sized session default pure overhead — measured 16.0 s at
    # 32 partitions vs 3.2 s at 8 (r13; the st23 precedent)
    with scoped_state_partitions(spark):
        out = run_available_now(joined, output_mode="append")
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("r_ts").alias("click_ts"),
    )


QUERIES["st21_stream_stream_join"] = q_st21_stream_stream_join


def q_w15_time_weighted(spark, sf_dir):
    """Time-WEIGHTED resample: 6-hour buckets per user where each
    value HOLDS until the next observation (bucket end for the last),
    weighted by held µs — the correct downsample for irregular step
    signals, where a plain avg over-weights chatty regimes.  Exact
    integer accumulation (µs weights × integer cents, DECIMAL(38,0));
    only the final division is double, operand order pinned, so the
    oracle hash-matches bit-exactly."""
    from qctimeseries_spark.windows import time_weighted_resample

    ev = read_table(spark, sf_dir, "events")
    return time_weighted_resample(
        ev, "ts", "value", step_minutes=360.0,
        key_cols=["user_id"], ties=["event_id"],
    )


def q_st23_stream_heartbeat_guard(spark, sf_dir):
    """st21's left_outer form under the HEARTBEAT GUARD, staged: the
    click side goes QUIET at Jan 16 while purchases keep flowing —
    the min-watermark trap that would hold every unmatched purchase
    in state forever.  Sentinel-keyed heartbeat rows (user_id = −1,
    shaped by the same ``_heartbeat_projection`` the wall-clock
    ``heartbeat_stream`` uses) arrive on the quiet side in later
    micro-batches and advance its event-time watermark, so the held
    purchases finalize as NULL rows — which the drain returns and
    the oracle checks as a plain LEFT range join.  The tail filter
    (< Jan 29) keeps only purchases the end-of-drain watermark
    (max purchase ts − 1 h) has PROVABLY finalized; the heartbeats
    themselves are on the non-preserved side and never surface."""
    import shutil
    import tempfile

    from qctimeseries_spark.streaming import (
        _heartbeat_projection,
        run_available_now,
        stage_file_batches,
        stream_stream_join,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    template = ev.select("event_id", "user_id", "ts")

    def hb(iso: str):
        # heartbeat-shaped click row derived from the ACTUAL
        # projection helper so this staging cannot drift from what
        # heartbeat_stream emits (sentinel key, NULL payload)
        return (
            spark.createDataFrame([(iso,)], "t string")
            .select(F.col("t").cast("timestamp").alias("timestamp"))
            .select(
                *_heartbeat_projection(template, "ts", 0.0,
                                       {"user_id": -1}),
                F.lit("click").alias("event_type"),
            )
        )

    tmp = tempfile.mkdtemp(prefix="qcts_st23_")
    # scoped state-partition sizing: stateful-join machinery (store
    # open/commit per partition per side per micro-batch) scales with
    # spark.sql.shuffle.partitions; this staged drain holds ~20k keys
    # across 4 micro-batches, where 32 partitions are pure overhead
    # (measured 17.6 s -> 5.1 s at 8).  A production deployment sizes
    # this to key cardinality; values are partition-invariant (every
    # consumer and the oracle compare order-insensitively).
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        src = os.path.join(tmp, "src")
        stage_file_batches(
            [
                ev.filter(F.col("ts") < cut),
                ev.filter(
                    (F.col("ts") >= cut)
                    & (F.col("event_type") == "purchase")
                ).unionByName(hb("2024-01-16 00:00:00")),
                hb("2024-02-05 00:00:00"),
                # one more batch so the Feb 5 heartbeat is IN the
                # watermark when finalization cleanup runs (the query
                # watermark lags a batch — measured contract)
                hb("2024-02-06 00:00:00"),
            ],
            src,
        )
        schema = (
            "event_id bigint, user_id bigint, ts timestamp,"
            " event_type string"
        )

        def side(kind):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .filter(F.col("event_type") == kind)
                .select("event_id", "user_id", "ts")
            )

        joined = stream_stream_join(
            side("purchase"), side("click"),
            by="user_id", lookback_seconds=4 * 3600.0,
            watermark="1 hour", how="left_outer",
        )
        out = run_available_now(joined, output_mode="append")
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return out.filter(
        F.col("ts") < F.lit("2024-01-29").cast("timestamp")
    ).select(
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("r_ts").alias("click_ts"),
    )


def q_w16_twa_carry(spark, sf_dir):
    """w15's time-weighted resample in CARRY-IN mode (the kdb/Influx
    TWA semantic): each user's value holds until their next
    observation REGARDLESS of bucket boundaries, so a silent stretch
    fills every intermediate 6-hour bucket with the held value
    (n_obs = 0 rows); the last observation still holds only to its
    own bucket's end.  Same exact integer-µs × integer-cents
    accumulation as w15 — only the final division is double."""
    from qctimeseries_spark.windows import time_weighted_resample

    ev = read_table(spark, sf_dir, "events")
    return time_weighted_resample(
        ev, "ts", "value", step_minutes=360.0,
        key_cols=["user_id"], ties=["event_id"], carry_in=True,
    )


def q_w17_ohlc(spark, sf_dir):
    """OHLC candlestick downsample: per (user, 6-hour bucket) the
    first/max/min/last value by (ts, event_id) plus the observation
    count — one map-side-combinable groupBy (open/close via struct
    min/max, no window, no second exchange); values pass through
    untouched so the oracle (ROW_NUMBER first/last) is bit-exact by
    construction."""
    from qctimeseries_spark.windows import ohlc_resample

    ev = read_table(spark, sf_dir, "events")
    return ohlc_resample(
        ev, "ts", "value", step_minutes=360.0,
        key_cols=["user_id"], ties=["event_id"],
    )


def q_e4_transitions(spark, sf_dir):
    """First-order event-type transition counts: consecutive per-user
    event pairs ordered by (ts, event_id), counted globally, with the
    empirical transition probability as an exact integer-nanodigit
    9-dp quotient — the Markov-chain view the funnel family doesn't
    give (which paths users ACTUALLY follow)."""
    from qctimeseries_spark.events import event_transitions

    ev = read_table(spark, sf_dir, "events")
    return event_transitions(ev, ties=["event_id"])


def q_e1_funnel(spark, sf_dir):
    """ORDERED conversion funnel signup → click → purchase with a
    7-day per-step horizon: stage k counts only an event strictly
    AFTER the user's stage-k−1 time (first qualifying event) — the
    sequencing a per-type aggregate gets wrong.  All stage times
    resolve in ONE exchange on user_id (k min-windows over the same
    partition spec)."""
    from qctimeseries_spark.events import funnel

    ev = read_table(spark, sf_dir, "events")
    return funnel(
        ev, ["signup", "click", "purchase"],
        horizon_seconds=7 * 86400.0,
    )


def q_e2_retention(spark, sf_dir):
    """Weekly cohort retention: users cohort by the epoch-anchored
    week of their first event; n_active of them in cohort week + k
    for k in [0, 4).  First-period and activity both aggregate on
    user_id; the cohort-size attach broadcasts the (tiny) cohort
    dimension."""
    from qctimeseries_spark.events import retention_cohorts

    ev = read_table(spark, sf_dir, "events")
    return retention_cohorts(ev, period_days=7.0, max_periods=4)


def q_st22_stream_funnel(spark, sf_dir):
    """Streaming twin of e1: per-(user, stage) conversion rows from
    the custom stateful funnel operator (applyInPandasWithState,
    3-scalar state per user), drained append-mode.  Within the drain
    every user's rows process in event-time order, so the emitted
    conversions equal the batch funnel's per-user stage times — the
    oracle computes exactly those (the e1 CTE chain, unpivoted)."""
    from qctimeseries_spark.streaming import (
        run_available_now,
        stream_events,
        stream_funnel,
    )

    ev = stream_events(spark, sf_dir).select(
        "user_id", "ts", "event_type"
    )
    return run_available_now(
        stream_funnel(
            ev, ["signup", "click", "purchase"],
            horizon_seconds=7 * 86400.0,
        ),
        output_mode="append",
    )


def q_e3_funnel_lags(spark, sf_dir):
    """Step-latency companion to e1: per funnel stage k >= 1, how
    many users converted it and their min/avg/max lag from stage k-1
    in seconds.  Lags accumulate as exact integer microseconds
    (DECIMAL sums, division last, 9-dp round) so the oracle
    hash-matches bit-exactly; same ordered stage-time core as e1."""
    from qctimeseries_spark.events import funnel_lags

    ev = read_table(spark, sf_dir, "events")
    return funnel_lags(
        ev, ["signup", "click", "purchase"],
        horizon_seconds=7 * 86400.0,
    )


def q_e5_attribution(spark, sf_dir):
    """Last-touch attribution: every purchase credits the user's most
    recent signup/click strictly earlier than it (µs-level) within a
    7-day lookback; unattributed purchases keep a NULL-touch row.
    The type pre-filter pushes to the scan, the election rides ONE
    user-key exchange (a RANGE-frame struct max — no self-join), and
    the lag is an exact integer µs column."""
    from qctimeseries_spark.events import attribution

    ev = read_table(spark, sf_dir, "events")
    return attribution(
        ev, conversion_type="purchase",
        touch_types=["signup", "click"], mode="last",
        lookback_seconds=7 * 86400.0, ties=["event_id"],
    )


def q_st24_stream_transitions(spark, sf_dir):
    """Streaming twin of e4: per-user consecutive event pairs emitted
    as they arrive from the custom stateful operator
    (applyInPandasWithState, 3-scalar state per user), drained
    append-mode.  Within the drain every user's rows process in
    (ts, event_id) order, so the emitted pair rows equal the batch
    lead() pairs exactly — the oracle computes those (the e4 core,
    before aggregation)."""
    from qctimeseries_spark.streaming import (
        run_available_now,
        stream_events,
        stream_transitions,
    )

    ev = stream_events(spark, sf_dir).select(
        "user_id", "ts", "event_type", "event_id"
    )
    return run_available_now(
        stream_transitions(ev), output_mode="append"
    )


def q_st25_stream_attribution(spark, sf_dir):
    """Streaming twin of e5 (LAST-touch only — first-touch under a
    sliding lookback needs unbounded per-user touch buffering, which
    this operator refuses to hold): one attribution row per purchase
    as it arrives, from six scalars of state per user; the
    penultimate-distinct-µs carried touch answers the same-µs
    exclusion across batches.  Drained in-order output equals the
    batch election — the oracle IS e5's SQL."""
    from qctimeseries_spark.streaming import (
        run_available_now,
        stream_attribution,
        stream_events,
    )

    ev = stream_events(spark, sf_dir).select(
        "user_id", "ts", "event_type", "event_id"
    )
    return run_available_now(
        stream_attribution(
            ev, conversion_type="purchase",
            touch_types=["signup", "click"],
            lookback_seconds=7 * 86400.0,
        ),
        output_mode="append",
    )


def q_st26_stream_ohlc(spark, sf_dir):
    """Streaming candlesticks drained APPEND-mode: w17's per-(user,
    6-hour bucket) open/high/low/close from the pure-JVM windowed
    struct-min/max aggregation (no Python state), equal bucket-for-
    bucket to the batch OHLC of every watermark-closed bucket — the
    oracle mirrors the eviction horizon (the st7 precedent)."""
    from qctimeseries_spark.streaming import (
        run_available_now,
        scoped_state_partitions,
        stream_events,
        stream_ohlc,
    )

    ev = stream_events(spark, sf_dir).select(
        "user_id", "ts", "value", "event_id"
    )
    # pure-JVM windowed struct-min/max aggregation — state is
    # per-(user, bucket) scalars; measured 2.8 s → 1.7 s at 8
    # partitions (r13)
    with scoped_state_partitions(spark):
        return run_available_now(
            stream_ohlc(
                ev, "ts", "value", step_minutes=360.0,
                key_cols=["user_id"], ties=["event_id"],
            ),
            output_mode="append",
        )


def q_e6_active_users(spark, sf_dir):
    """DAU + trailing 7-day rolling active users per day: one
    corpus exchange to distinct the (user, day) pairs, then per-day
    counts and a bounded x7 explode of the PAIR table for the rolling
    distinct — never a self-join of events, never a per-day range
    join."""
    from qctimeseries_spark.events import active_users

    ev = read_table(spark, sf_dir, "events")
    return active_users(ev, period_days=1.0, window_periods=7)


QUERIES["w15_time_weighted"] = q_w15_time_weighted
QUERIES["e1_funnel"] = q_e1_funnel
QUERIES["e2_retention"] = q_e2_retention
QUERIES["st22_stream_funnel"] = q_st22_stream_funnel
QUERIES["e3_funnel_lags"] = q_e3_funnel_lags
QUERIES["w16_twa_carry"] = q_w16_twa_carry
QUERIES["st23_heartbeat_guard"] = q_st23_stream_heartbeat_guard
QUERIES["w17_ohlc"] = q_w17_ohlc
QUERIES["e4_transitions"] = q_e4_transitions
QUERIES["e5_attribution"] = q_e5_attribution
QUERIES["st24_stream_transitions"] = q_st24_stream_transitions
QUERIES["st25_stream_attribution"] = q_st25_stream_attribution
QUERIES["st26_stream_ohlc"] = q_st26_stream_ohlc
QUERIES["e6_active_users"] = q_e6_active_users


# The driver harness hash-checks at most the FIRST 50 registry
# entries; every entry outside that window is still checked by pytest
# and the local oracle replica (tools/check_correctness.py), but only
# window entries get the driver's independent hash verdict.  To keep
# that verdict honest across a 200+-entry registry, the window ROTATES
# each round.  Round 14 continues the r13 rotation schedule:
#   * the complete 13-entry r9-verdict band deferred last round
#     (8 of t's 12, st1/st2/st3, w10, w4) — at r14 these are the
#     oldest verdicts in the registry and the staleness SLO
#     (test_registry_staleness_slo, current-4 = r10) requires them
#     in-window,
#   * 35 of the 46-entry r10 band, chosen for family breadth and for
#     round-14 changed paths (the x-tier entries whose shared
#     ``ivf_assign`` Arrow pass changes this round — x2, x4, x11,
#     x14, x15 — stay in; the 11 left out are the band's most
#     family-redundant members: 8 of x's 13 slots, a2/a3 of a's 5,
#     p4 of p's 5; they rotate in at r15 alongside the r11 band),
#   * family-coverage fills c2_curate and e1_funnel — the
#     oldest-verdict members of the two families (c, e) with no
#     r9/r10-band member; test_driver_window_covers_every_family pins
#     all 16 families in-window.
# (The r13 comment here previously announced an "r13 newborn
# st27_stream_active_users" — that entry was never actually built or
# registered; no such query exists in the registry or any replica
# sweep, so there is no newborn intake this round.)
# ALL entries additionally hold a same-round builder replica green in
# the committed full-registry sweep (plans/r14/).
_WINDOW_R14 = (
    # the complete 13-entry r9-stale band
    "st1_stream_flag_counts", "st2_stream_gaps", "st3_stream_dedup",
    "t12_bpe_pairs", "t17_tfidf", "t18_unigram_nll",
    "t1_sessionize", "t2_text_stats", "t30_weighted_sample",
    "t3_quality", "t4_lang_id",
    "w10_ffill", "w4_viewer_windows",
    # 35 of the 46-entry r10 band
    "a18_trend", "a1_progress", "a5_axis_range",
    "d3_simhash_pairs", "d5_embedding_dups", "d9_semantic_dedup",
    "f5_iso_export",
    "h15_small_qty_revenue", "h20_balance_gate",
    "j4_skew_join",
    "m6_phash_dedup",
    "p10_rowid_semijoin", "p11_hide_complete",
    "p3_filter_conjunction", "p8_flag_class_filters",
    "s12_partitioned_roundtrip",
    "st19_stream_sessions", "st20_stream_stratified",
    "st21_stream_stream_join",
    "t19_repetition", "t29_hybrid_rrf", "t41_stratified_sample",
    "u2_flag_window", "u6_flag_approve_advance",
    "v1_downsample", "v4_secondary_trace", "v5_check_panel",
    "w14_bfill", "w1_assign_windows", "w8_window_range",
    "x11_cell_stats", "x14_kmeans", "x15_recall_eval",
    "x2_knn_ivf", "x4_radius_search",
    # family-coverage fills (pinned by
    # test_driver_window_covers_every_family)
    "c2_curate", "e1_funnel",
)
assert len(_WINDOW_R14) == 50 and len(set(_WINDOW_R14)) == 50
QUERIES = {k: QUERIES[k] for k in _WINDOW_R14} | {
    k: v for k, v in QUERIES.items() if k not in _WINDOW_R14
}

ORACLE = {
    "f1_add_flags": f"""
WITH {_QC_SQL}
SELECT event_id, value,
       CAST(CASE WHEN value IS NULL THEN -1 ELSE 0 END AS INT) AS value_qcflag
FROM qc""",
    "u1_seeded_flags": f"""
WITH {_SEEDED_SQL}
SELECT event_id, value, value_qcflag FROM seeded""",
    "p4_apply_flags": f"""
WITH {_SEEDED_SQL}
SELECT event_id,
       CASE WHEN value_qcflag < 0 THEN NULL ELSE value END AS value,
       value_qcflag
FROM seeded""",
    "p5_strict_clean": f"""
WITH {_SEEDED_SQL}
SELECT event_id,
       CASE WHEN value_qcflag < 1 THEN NULL ELSE value END AS value,
       value_qcflag
FROM seeded""",
    "p1_remove_flags": f"""
WITH {_SEEDED_SQL}
SELECT event_id, ts, user_id, event_type, value FROM seeded""",
    "f4_transfer_flags": f"""
WITH {_SEEDED_SQL}
SELECT event_id, value * 2.0 AS value2, value_qcflag AS value2_qcflag
FROM seeded""",
    "p3_filter_conjunction": """
SELECT event_id, user_id, value FROM events
WHERE event_type = 'purchase' AND user_id % 3 = 0""",
    "p8_flag_class_filters": f"""
WITH {_SEEDED_SQL}
SELECT event_id,
       value_qcflag = 1 AS is_approved,
       value_qcflag <= -2 AS is_manual
FROM seeded
WHERE value_qcflag >= 0 AND value IS NOT NULL AND ts IS NOT NULL""",
    "a1_progress": _progress_sql("value", "value2"),
    "p11_hide_complete": f"""
WITH {_QC_SQL},
two AS (
  SELECT event_id, value,
         CASE WHEN event_id % 13 = 0 THEN NULL
              ELSE CAST(user_id AS DOUBLE) END AS value2,
         CAST(CASE WHEN value IS NULL THEN -1 ELSE 0 END AS INT) AS value_qcflag,
         CAST(CASE WHEN event_id % 13 = 0 THEN -1 ELSE 1 END AS INT) AS value2_qcflag
  FROM qc
)
SELECT * FROM ({_PROGRESS_VAR_SQL.format(var='value', flag='value_qcflag')}
UNION ALL {_PROGRESS_VAR_SQL.format(var='value2', flag='value2_qcflag')}) p
WHERE pct_checked < 100""",
    "a2_consistency": f"""
WITH {_SEEDED_SQL}
SELECT 'value' AS variable,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
       CAST(SUM(CASE WHEN value_qcflag = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_missing,
       SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
         = SUM(CASE WHEN value_qcflag = -1 THEN 1 ELSE 0 END) AS consistent
FROM seeded""",
    "a3_flag_domain": f"""
WITH {_SEEDED_SQL},
dirty AS (
  SELECT CASE WHEN event_id % 97 = 0 AND value_qcflag = 0
              THEN 9 ELSE value_qcflag END AS value_qcflag
  FROM seeded
)
SELECT DISTINCT 'value' AS variable, CAST(value_qcflag AS INT) AS flag
FROM dirty WHERE value_qcflag NOT IN (-2, -1, 0, 1)""",
    "w1_assign_windows": f"""
WITH {_WIN_SQL}
SELECT event_id, win_id FROM w""",
    "w3_admitted_windows": f"""
WITH {_WIN_SQL},
adm AS (
  SELECT win_id,
         MAX(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS has_y,
         MAX(CASE WHEN value_qcflag IN (0) THEN 1 ELSE 0 END) AS has_incl
  FROM w GROUP BY win_id
)
SELECT win_id,
       CAST(DENSE_RANK() OVER (ORDER BY win_id) - 1 AS INT) AS win_index
FROM adm WHERE has_y = 1 AND has_incl = 1""",
    "w4_viewer_windows": f"""
WITH {_WIN_SQL},
adm AS (
  SELECT win_id, MAX(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS has_y
  FROM w GROUP BY win_id
)
SELECT win_id,
       CAST(DENSE_RANK() OVER (ORDER BY win_id) - 1 AS INT) AS win_index
FROM adm WHERE has_y = 1""",
    "w8_window_range": f"""
WITH {_WIN_SQL}
SELECT win_id, MIN(ts) AS t_min, MAX(ts) AS t_max, COUNT(*) AS n_rows
FROM w GROUP BY win_id""",
    "u2_flag_window": f"""
WITH {_WIN_SQL}
SELECT event_id,
       CAST(CASE WHEN win_id = 3 AND value_qcflag != -1 THEN -2
            ELSE value_qcflag END AS INT) AS value_qcflag
FROM w""",
    "u3_approve_window": f"""
WITH {_WIN_SQL}
SELECT event_id,
       CAST(CASE WHEN win_id = 3 AND value_qcflag = 0 AND value IS NOT NULL
            THEN 1 ELSE value_qcflag END AS INT) AS value_qcflag
FROM w""",
    "u4_reset_window": f"""
WITH {_WIN_SQL}
SELECT event_id,
       CAST(CASE WHEN win_id = 3 AND value_qcflag != -1 THEN 0
            ELSE value_qcflag END AS INT) AS value_qcflag
FROM w""",
    "u5_reset_all": f"""
WITH {_SEEDED_SQL}
SELECT event_id,
       CAST(CASE WHEN value_qcflag != -1 THEN 0 ELSE value_qcflag END AS INT)
           AS value_qcflag
FROM seeded""",
    "u6_flag_approve_advance": f"""
WITH {_WIN_SQL},
s1 AS (
  SELECT event_id, value, win_id,
         CASE WHEN event_id % 13 = 0 AND value_qcflag != -1 THEN -2
              ELSE value_qcflag END AS f1
  FROM w
)
SELECT event_id,
       CAST(CASE WHEN win_id = 3 AND f1 = 0 AND value IS NOT NULL THEN 1
            ELSE f1 END AS INT) AS value_qcflag
FROM s1""",
    "f2_rowid": f"""
WITH {_APP_SQL}
SELECT event_id, rowid FROM app""",
    "p2_projection": """
SELECT ts, value FROM events""",
    "p10_rowid_semijoin": f"""
WITH {_APP_SQL}
SELECT event_id,
       CAST(CASE WHEN rowid IN (SELECT rowid FROM app WHERE event_id % 23 = 0)
                  AND value_qcflag != -1 THEN -2
            ELSE value_qcflag END AS INT) AS value_qcflag
FROM app""",
    "a4_anchor": """
SELECT MIN(ts) AS t0 FROM events""",
    "a5_axis_range": f"""
WITH {_APP_SQL},
r AS (
  SELECT MIN(value) AS mn, MAX(value) AS mx
  FROM app WHERE win_id = 3 AND value IS NOT NULL
)
SELECT mn - (mx - mn) * CAST(0.02 AS DOUBLE) AS y_lo,
       mx + (mx - mn) * CAST(0.02 AS DOUBLE) AS y_hi FROM r""",
    "v1_main_trace": f"""
WITH {_APP_SQL}
SELECT ts, value, rowid FROM app
WHERE win_id = 3 AND value_qcflag >= 0
  AND value IS NOT NULL AND ts IS NOT NULL""",
    "v2_approved_overlay": f"""
WITH {_APP_SQL}
SELECT ts, value, rowid FROM app
WHERE win_id = 3 AND value_qcflag = 1 AND value IS NOT NULL""",
    "v3_flagged_overlay": f"""
WITH {_APP_SQL}
SELECT ts, value, rowid FROM app
WHERE win_id = 3 AND value_qcflag <= -2 AND value IS NOT NULL""",
    "v4_secondary_trace": f"""
WITH {_APP_SQL}
SELECT ts, value FROM app
WHERE win_id = 3 AND value IS NOT NULL AND value_qcflag >= 0""",
    "v6_viewer_slice": f"""
WITH {_APP_SQL}
SELECT ts, value, rowid FROM app
WHERE win_id = 3 AND value IS NOT NULL AND ts IS NOT NULL""",
    "v5_check_panel": f"""
WITH {_SEEDED_SQL}
SELECT 'raw' AS panel, ts, value, value_qcflag FROM seeded
UNION ALL
SELECT 'clean' AS panel, ts,
       CASE WHEN value_qcflag < 1 THEN NULL ELSE value END AS value,
       value_qcflag
FROM seeded""",
    "v1_downsample": f"""
WITH {_QC_SQL},
ext AS (
  SELECT MIN(epoch(ts)) AS t0, MAX(epoch(ts)) AS t1 FROM qc
),
b AS (
  SELECT CAST(LEAST(99, FLOOR((epoch(ts) - ext.t0) / (ext.t1 - ext.t0) * 100))
              AS INT) AS bucket,
         value, ts
  FROM qc, ext WHERE value IS NOT NULL
)
SELECT bucket, MIN(value) AS y_min, MAX(value) AS y_max,
       ARG_MIN(value, ts) AS y_open, ARG_MAX(value, ts) AS y_close,
       COUNT(*) AS n_rows
FROM b GROUP BY bucket""",
    "f5_iso_export": """
SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso FROM events""",
    "s1_csv_roundtrip": """
SELECT event_id, ts, value FROM events""",
    "s4_parquet_roundtrip": f"""
WITH {_SEEDED_SQL}
SELECT event_id, value, value_qcflag FROM seeded""",
    # s10: the JSONL roundtrip must be lossless — the oracle is the
    # original table
    "s10_jsonl_roundtrip": """
SELECT doc_id, text, lang, source, n_chars FROM documents""",
    "h1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
    "h3_segment_revenue": f"""
SELECT c_mktsegment, {_REV} AS revenue, COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""",
    "h5_nation_revenue": f"""
SELECT r_name, n_name, {_REV} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name""",
    "h7_top_unshipped": f"""
SELECT l_orderkey, o_orderdate, {_REV} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
    "h8_local_nation_revenue": f"""
SELECT n_name, {_REV} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name""",
    "h9_big_orders": """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sq AS DOUBLE) AS sum_qty
FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) b
JOIN orders ON o_orderkey = b.l_orderkey
JOIN customer ON o_custkey = c_custkey""",
    "h4_order_priority": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority""",
    "h6_forecast_revenue": """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24""",
    "t1_sessionize": """
WITH o AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                OR epoch_us(ts)
                   - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))
                   > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions
FROM o GROUP BY user_id""",
    "t9_sessionize_salted": """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                OR epoch_us(ts)
                   - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))
                   > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS INT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_id""",
    "j2_range_join": """
WITH iv AS (
  SELECT event_id AS incident_id, user_id, ts AS lo,
         ts + INTERVAL 2 HOUR AS hi
  FROM events WHERE event_id % 200 = 0
)
SELECT incident_id, COUNT(*) AS n_events
FROM events e
JOIN iv ON e.user_id = iv.user_id AND e.ts BETWEEN iv.lo AND iv.hi
GROUP BY incident_id""",
    "st4_session_windows": """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n
FROM s GROUP BY user_id, sid""",
    "a9_percentiles": """
SELECT event_type,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.95) AS p95,
       COUNT(value) AS n
FROM events GROUP BY event_type""",
    "j1_asof_join": """
WITH cal AS (
  SELECT user_id, ts, MAX(value) AS cal_value
  FROM events WHERE event_id % 97 = 0
  GROUP BY user_id, ts
)
SELECT e.event_id, cal.ts AS cal_ts, cal.cal_value
FROM events e
ASOF LEFT JOIN cal ON e.user_id = cal.user_id AND e.ts >= cal.ts""",
    "st1_stream_flag_counts": f"""
SELECT make_timestamp((epoch_us(ts) // {24 * 3600 * 1_000_000})
                      * {24 * 3600 * 1_000_000}) AS win_start,
       make_timestamp(((epoch_us(ts) // {24 * 3600 * 1_000_000}) + 1)
                      * {24 * 3600 * 1_000_000}) AS win_end,
       CAST(CASE WHEN value IS NULL THEN -1 ELSE 0 END AS INT) AS value_qcflag,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2, 3""",
    "st3_stream_dedup": """
SELECT event_id, ts, value FROM events""",
    "st5_stream_enrich": """
SELECT e.event_id, e.user_id, c.c_mktsegment, n.n_name, e.value
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""",
    "w9_regularize": """
WITH s AS (
  SELECT ts, MAX(value) AS value FROM events WHERE user_id = 7 GROUP BY ts
),
b AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM s),
grid AS (
  SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
                                INTERVAL 6 HOUR)) AS grid_ts
)
SELECT g.grid_ts, s.value, CAST(s.ts IS NULL AS INT) AS is_gap
FROM grid g LEFT JOIN s ON s.ts = g.grid_ts""",
    "w10_ffill": """
WITH s AS (
  SELECT ts, MAX(value) AS value FROM events WHERE user_id = 7 GROUP BY ts
),
b AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM s),
grid AS (
  SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
                                INTERVAL 6 HOUR)) AS grid_ts
),
reg AS (
  SELECT g.grid_ts, s.value, CAST(s.ts IS NULL AS INT) AS is_gap
  FROM grid g LEFT JOIN s ON s.ts = g.grid_ts
)
SELECT grid_ts, value, is_gap,
       last_value(value IGNORE NULLS)
           OVER (ORDER BY grid_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS value_filled
FROM reg""",
    # w18: the max-gap cap — carry the source instant with the value
    # and null the fill once it is older than 12 h
    "w18_ffill_maxgap": """
WITH s AS (
  SELECT ts, MAX(value) AS value FROM events WHERE user_id = 7 GROUP BY ts
),
b AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM s),
grid AS (
  SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
                                INTERVAL 6 HOUR)) AS grid_ts
),
reg AS (
  SELECT g.grid_ts, s.value, CAST(s.ts IS NULL AS INT) AS is_gap
  FROM grid g LEFT JOIN s ON s.ts = g.grid_ts
),
c AS (
  SELECT grid_ts, value, is_gap,
         last_value(CASE WHEN value IS NOT NULL
                         THEN {'t': grid_ts, 'v': value} END IGNORE NULLS)
             OVER (ORDER BY grid_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM reg
)
SELECT grid_ts, value, is_gap,
       CASE WHEN epoch_us(grid_ts) - epoch_us(p.t) <= 43200000000
            THEN p.v END AS value_filled
FROM c""",
    "w11_interpolate": """
WITH s AS (
  SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS ts,
         ROUND(AVG(value), 6) AS value
  FROM events WHERE user_id = 7 GROUP BY 1
),
b AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM s),
grid AS (
  SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
                                INTERVAL 6 HOUR)) AS grid_ts
),
reg AS (
  SELECT g.grid_ts, s.value, CAST(s.ts IS NULL AS INT) AS is_gap
  FROM grid g LEFT JOIN s ON s.ts = g.grid_ts
),
c AS (
  SELECT grid_ts, value, is_gap,
         last_value(CASE WHEN value IS NOT NULL
                         THEN {'t': grid_ts, 'v': value} END IGNORE NULLS)
             OVER (ORDER BY grid_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
         first_value(CASE WHEN value IS NOT NULL
                          THEN {'t': grid_ts, 'v': value} END IGNORE NULLS)
             OVER (ORDER BY grid_ts
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
  FROM reg
)
SELECT grid_ts, value, is_gap,
       CASE WHEN value IS NOT NULL THEN value
            WHEN p IS NOT NULL AND n IS NOT NULL THEN
              ROUND(p.v + (n.v - p.v)
                          * (CAST(epoch_us(grid_ts) AS DOUBLE)
                             - CAST(epoch_us(p.t) AS DOUBLE))
                          / (CAST(epoch_us(n.t) AS DOUBLE)
                             - CAST(epoch_us(p.t) AS DOUBLE)), 6)
            WHEN p IS NOT NULL THEN p.v
            ELSE n.v END AS value_interp
FROM c""",
    "w12_resample": f"""
SELECT user_id,
       make_timestamp((epoch_us(ts) // {24 * 3600 * 1_000_000})
                      * {24 * 3600 * 1_000_000}) AS bucket_ts,
       ROUND(AVG(value), 6) AS value_avg,
       MIN(value) AS value_min,
       MAX(value) AS value_max,
       COUNT(value) AS value_count
FROM events
GROUP BY 1, 2""",
    "st10_stream_cusum": """
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cv
  FROM events
),
p AS (
  SELECT user_id, event_id, ts,
         SUM(cv - 10500) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS cp,
         SUM(cv - 9500) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS cm
  FROM v
),
s AS (
  SELECT user_id, event_id,
         CAST(cp - LEAST(0, MIN(cp) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))
              AS DOUBLE) AS cusum_pos,
         CAST(GREATEST(0, MAX(cm) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) - cm
              AS DOUBLE) AS cusum_neg
  FROM p
)
SELECT user_id, event_id, cusum_pos, cusum_neg,
       (cusum_pos > 5000 OR cusum_neg > 5000) AS cusum_alarm
FROM s""",
    # st12: the drained streaming-ingestion survivor table must equal
    # the batch set algebra over the two planted source files — min-id
    # keeper per fingerprint within a batch, first-arrived batch wins
    "st12_stream_ingest_dedup": f"""
WITH fp AS (
  SELECT doc_id, {hash60_sql(_NORM_TEXT)} AS fingerprint FROM documents
),
b1 AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id % 2 = 0),
b2 AS (
  SELECT doc_id, fingerprint FROM fp WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, fingerprint FROM fp
  WHERE doc_id % 2 = 1 AND doc_id % 10 = 1
),
s1 AS (SELECT MIN(doc_id) AS doc_id, fingerprint FROM b1 GROUP BY fingerprint),
s2 AS (
  SELECT MIN(doc_id) AS doc_id, fingerprint FROM b2
  WHERE fingerprint NOT IN (SELECT fingerprint FROM s1)
  GROUP BY fingerprint
)
SELECT doc_id, fingerprint FROM s1
UNION ALL
SELECT doc_id, fingerprint FROM s2""",
    # st13: the drained streaming NEAR-dup survivor table = d7's batch
    # set algebra PLUS the seed batch's own survivors — derived from
    # the d7 oracle by lifting its final argmax into a CTE and unioning
    # the seed
    # the guard below asserts the replace actually fired — a reworded
    # d7 tail would otherwise silently degrade this oracle to d7's
    "st13_stream_ingest_neardup": DATAPIPE_ORACLE[
        "d7_incremental_neardup"
    ].replace(
        "\nSELECT MIN(doc_id) AS doc_id, fingerprint FROM x2"
        " GROUP BY fingerprint",
        ",\nx3 AS (SELECT MIN(doc_id) AS doc_id, fingerprint FROM x2"
        " GROUP BY fingerprint)\n"
        "SELECT doc_id, fingerprint FROM seed\n"
        "UNION ALL\nSELECT doc_id, fingerprint FROM x3",
    ),
    # st11: the drained stream must equal the batch per-window PSI for
    # every watermark-closed window — identical share divisions, eps
    # floor, and 6-dp rounds
    "st11_stream_psi": f"""
WITH m AS (SELECT MAX(ts) AS mx FROM events),
rc AS (
  SELECT {_psi_bucket_sql('value')} AS bucket, COUNT(*) AS n
  FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL GROUP BY 1
),
rt AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM rc),
wc AS (
  SELECT make_timestamp((epoch_us(ts) // {24 * 3600 * 1_000_000})
                        * {24 * 3600 * 1_000_000}) AS bucket_ts,
         {_psi_bucket_sql('value')} AS bucket, COUNT(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
wt AS (SELECT bucket_ts, CAST(SUM(n) AS BIGINT) AS t FROM wc GROUP BY 1),
grid AS (
  SELECT wt.bucket_ts, b.bucket, wt.t
  FROM wt, (SELECT unnest(range(0, {len(_PSI_EDGES) + 1})) AS bucket) b
),
j AS (
  SELECT g.bucket_ts, CAST(g.bucket AS INT) AS bucket,
         CAST(COALESCE(wc.n, 0) AS BIGINT) AS n,
         CAST(COALESCE(wc.n, 0) AS DOUBLE) / g.t AS scr,
         COALESCE(CAST(rc.n AS DOUBLE) / (SELECT t FROM rt), 0.0) AS srr
  FROM grid g
  LEFT JOIN wc ON wc.bucket_ts = g.bucket_ts AND wc.bucket = g.bucket
  LEFT JOIN rc ON rc.bucket = g.bucket
)
SELECT bucket_ts, bucket, n,
       ROUND(scr, 6) AS share_cur,
       ROUND(srr, 6) AS share_ref,
       ROUND((GREATEST(scr, 1e-06) - GREATEST(srr, 1e-06))
             * ln(GREATEST(scr, 1e-06) / GREATEST(srr, 1e-06)), 6) AS psi
FROM j, m
WHERE bucket_ts + INTERVAL 24 HOUR <= m.mx - INTERVAL 1 HOUR""",
    "a15_cusum": """
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cv
  FROM events
),
p AS (
  SELECT user_id, event_id, ts,
         SUM(cv - 10500) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS cp,
         SUM(cv - 9500) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS cm
  FROM v
),
s AS (
  SELECT user_id, event_id,
         CAST(cp - LEAST(0, MIN(cp) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))
              AS DOUBLE) AS cusum_pos,
         CAST(GREATEST(0, MAX(cm) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) - cm
              AS DOUBLE) AS cusum_neg
  FROM p
)
SELECT user_id, event_id, cusum_pos, cusum_neg,
       (cusum_pos > 5000 OR cusum_neg > 5000) AS cusum_alarm
FROM s""",
    "j4_skew_join": """
WITH e AS (
  SELECT event_id, value,
         CASE WHEN user_id % 4 < 3 THEN CAST(1 AS BIGINT)
              ELSE user_id END AS account_id
  FROM events
)
SELECT e.event_id, e.account_id, c.c_mktsegment, e.value
FROM e LEFT JOIN customer c ON e.account_id = c.c_custkey""",
    "a16_seasonal": """
WITH b AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
         quantile_disc(value, 0.5) AS seasonal_med,
         quantile_disc(value, 0.75) - quantile_disc(value, 0.25)
           AS seasonal_iqr
  FROM events GROUP BY 1, 2
)
SELECT e.event_id, e.event_type,
       CAST(EXTRACT(hour FROM e.ts) AS INT) AS hod, e.value,
       b.seasonal_med, b.seasonal_iqr,
       e.value - b.seasonal_med AS seasonal_dev,
       ABS(e.value - b.seasonal_med) > 1.5 * b.seasonal_iqr AS is_anomaly
FROM events e
LEFT JOIN b ON e.event_type = b.event_type
           AND CAST(EXTRACT(hour FROM e.ts) AS INT) = b.hod""",
    "st9_stream_asof": """
WITH cal AS (
  SELECT user_id, ts, MAX(value) AS cal_value
  FROM events WHERE event_id % 97 = 0
  GROUP BY user_id, ts
)
SELECT e.event_id, cal.ts AS cal_ts, cal.cal_value
FROM events e
ASOF LEFT JOIN cal ON e.user_id = cal.user_id AND e.ts >= cal.ts""",
    "st8_stream_ewma": """
WITH nn AS (
  SELECT user_id, ts, value FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM nn
),
arr AS (
  SELECT user_id, array_agg(value ORDER BY ts) AS vs
  FROM nn GROUP BY user_id
)
SELECT r.user_id, r.ts, r.value,
       ROUND(list_reduce(list_slice(arr.vs, 1, r.rn),
                         (acc, v) -> 0.3 * v + 0.7 * acc), 6) AS value_ewma
FROM r JOIN arr USING (user_id)""",
    "a14_ewma": """
WITH s AS (
  SELECT user_id,
         make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS ts,
         ROUND(AVG(value), 6) AS value
  FROM events WHERE user_id < 10 GROUP BY 1, 2
),
r AS (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM s
),
arr AS (
  SELECT user_id, array_agg(value ORDER BY ts) AS vs FROM s GROUP BY user_id
)
SELECT r.user_id, r.ts, r.value,
       ROUND(list_reduce(list_slice(arr.vs, 1, r.rn),
                         (acc, v) -> 0.5 * v + 0.5 * acc), 6) AS value_ewma
FROM r JOIN arr USING (user_id)""",
    "a13_progress_by_window": f"""
WITH {_WIN_SQL}
SELECT win_id,
       COUNT(value) AS total,
       ROUND(100.0 * SUM(CASE WHEN value IS NOT NULL
                               AND value_qcflag NOT IN (0, -1)
                              THEN 1 ELSE 0 END)
             / COUNT(value), 2) AS pct_checked,
       ROUND(100.0 * SUM(CASE WHEN value_qcflag = 1 THEN 1 ELSE 0 END)
             / COUNT(*), 2) AS pct_approved,
       ROUND(100.0 * SUM(CASE WHEN value_qcflag = 0 THEN 1 ELSE 0 END)
             / COUNT(*), 2) AS pct_unchecked,
       ROUND(100.0 * SUM(CASE WHEN value_qcflag = -1 THEN 1 ELSE 0 END)
             / COUNT(*), 2) AS pct_missing,
       ROUND(100.0 * SUM(CASE WHEN value_qcflag = -2 THEN 1 ELSE 0 END)
             / COUNT(*), 2) AS pct_flagged
FROM w GROUP BY win_id""",
    "j3_asof_forward": """
WITH cal AS (
  SELECT user_id, ts, MAX(value) AS cal_value
  FROM events WHERE event_id % 97 = 0
  GROUP BY user_id, ts
),
u AS (
  SELECT user_id, ts, event_id,
         CAST(NULL AS TIMESTAMP) AS c_ts, CAST(NULL AS DOUBLE) AS c_v,
         1 AS side
  FROM events
  UNION ALL
  SELECT user_id, ts, NULL, ts, cal_value, 0 FROM cal
),
w AS (
  SELECT *,
         first_value(CASE WHEN side = 0
                          THEN {'t': c_ts, 'v': c_v} END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, side DESC
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS m
  FROM u
)
SELECT event_id, m.t AS cal_ts, m.v AS cal_value
FROM w WHERE side = 1""",
    "w13_regularize_by_key": """
WITH s AS (
  SELECT user_id, ts, MAX(value) AS value
  FROM events WHERE user_id < 10 GROUP BY user_id, ts
),
b AS (
  SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi FROM s GROUP BY user_id
),
grid AS (
  SELECT user_id,
         unnest(generate_series(lo, hi, INTERVAL 12 HOUR)) AS grid_ts
  FROM b
)
SELECT g.user_id, g.grid_ts, s.value,
       CAST(s.ts IS NULL AS INT) AS is_gap
FROM grid g
LEFT JOIN s ON s.user_id = g.user_id AND s.ts = g.grid_ts""",
    "st7_stream_resample": f"""
WITH m AS (SELECT MAX(ts) AS mx FROM events)
SELECT user_id,
       make_timestamp((epoch_us(ts) // {24 * 3600 * 1_000_000})
                      * {24 * 3600 * 1_000_000}) AS bucket_ts,
       ROUND(AVG(value), 6) AS value_avg,
       MIN(value) AS value_min,
       MAX(value) AS value_max,
       COUNT(value) AS value_count
FROM events
GROUP BY 1, 2
HAVING bucket_ts + INTERVAL 24 HOUR <= (SELECT mx FROM m) - INTERVAL 1 HOUR""",
    # st19: the engine's session_window semantics replayed as integer
    # microsecond island detection — a break ONLY when the gap to the
    # previous event is STRICTLY > 30 min (the merge boundary is
    # INCLUSIVE: an event at exactly last+gap EXTENDS the session —
    # Spark 4.1.2 session_window behavior, pinned by
    # test_stream_sessions_native_session_window and exercised by the
    # synthetic exact-gap pair below), session_end = last event + gap,
    # and the append-mode emission horizon session_end <= max(ts) -
    # watermark (the st7 precedent).  The ev CTE mirrors the engine's
    # exact-gap fixture: user -1, two events exactly 1800 s apart.
    "st19_stream_sessions": f"""
WITH ev AS (
  SELECT user_id, ts, event_id FROM events
  UNION ALL
  SELECT CAST(-1 AS BIGINT), ts, CAST(-1 AS BIGINT)
  FROM events WHERE event_id = 1
  UNION ALL
  SELECT CAST(-1 AS BIGINT), ts + INTERVAL 1800 SECONDS,
         CAST(-2 AS BIGINT)
  FROM events WHERE event_id = 1
),
m AS (SELECT MAX(ts) AS mx FROM ev),
o AS (
  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS pus
  FROM ev
),
f AS (
  SELECT user_id, us, event_id,
         CASE WHEN pus IS NULL OR us - pus > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM o
),
s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
),
g AS (
  SELECT user_id,
         make_timestamp(MIN(us)) AS session_start,
         make_timestamp(MAX(us) + 1800000000) AS session_end,
         make_timestamp(MIN(us)) AS first_ts,
         make_timestamp(MAX(us)) AS last_ts,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, sid
)
SELECT user_id, session_start, session_end, first_ts, last_ts, n_events
FROM g, m
WHERE session_end <= mx - INTERVAL 1 HOUR""",
    "a12_rolling_by_key": """
WITH r AS (
  SELECT user_id, ts, value,
         ROUND(AVG(value) OVER w, 6) AS roll_mean,
         ROUND(STDDEV_SAMP(value) OVER w, 6) AS roll_std,
         COUNT(value) OVER w AS roll_n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 96 HOUR PRECEDING AND CURRENT ROW)
)
SELECT user_id, ts, value, roll_mean, roll_std, roll_n
FROM r
WHERE value IS NOT NULL AND roll_n >= 5 AND roll_std > 0
  AND abs(value - roll_mean) > 2.0 * roll_std""",
    "a11_qc_rules": """
WITH s AS (
  SELECT ts, MAX(value) AS value FROM events WHERE user_id = 7 GROUP BY ts
),
l AS (
  SELECT ts, value, lag(value, 1) OVER (ORDER BY ts) AS p1 FROM s
),
r AS (
  SELECT ts, value,
         CAST(value IS NOT NULL AND (value < 5.0 OR value > 400.0) AS INT)
             AS rule_range,
         CAST(value IS NOT NULL AND p1 IS NOT NULL
              AND abs(value - p1) > 300.0 AS INT) AS rule_spike,
         CAST(value IS NOT NULL AND p1 IS NOT NULL AND p1 = value AS INT)
             AS rule_flatline
  FROM l
)
SELECT ts, value, rule_range, rule_spike, rule_flatline,
       CAST(rule_range = 1 OR rule_spike = 1 OR rule_flatline = 1 AS INT)
           AS any_rule
FROM r""",
    "st6_stream_anomalies": """
WITH nn AS (
  SELECT user_id, ts, value, CAST(round(value * 100) AS BIGINT) AS vi
  FROM events WHERE value IS NOT NULL
),
o AS (
  SELECT user_id, ts, value,
         COUNT(vi) OVER w AS n_prior,
         SUM(vi) OVER w AS s,
         SUM(vi * vi) OVER w AS s2
  FROM nn
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
st AS (
  SELECT user_id, ts, value, n_prior,
         CAST(s AS DOUBLE) / CAST(n_prior AS DOUBLE) / 100.0 AS exp_mean,
         sqrt(GREATEST(
             (CAST(n_prior AS DOUBLE) * CAST(s2 AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n_prior AS DOUBLE)
                * (CAST(n_prior AS DOUBLE) - 1.0) * (100.0 * 100.0)),
             0.0)) AS exp_std
  FROM o WHERE n_prior > 1
)
SELECT user_id, ts, value, n_prior, exp_mean, exp_std
FROM st
WHERE n_prior >= 10 AND exp_std > 0 AND abs(value - exp_mean) > 2.0 * exp_std""",
    "a10_rolling_outliers": """
WITH s AS (
  SELECT ts, MAX(value) AS value FROM events WHERE user_id = 7 GROUP BY ts
),
r AS (
  SELECT ts, value,
         ROUND(AVG(value) OVER w, 6) AS roll_mean,
         ROUND(STDDEV_SAMP(value) OVER w, 6) AS roll_std,
         COUNT(value) OVER w AS roll_n
  FROM s
  WINDOW w AS (ORDER BY ts
               RANGE BETWEEN INTERVAL 48 HOUR PRECEDING AND CURRENT ROW)
)
SELECT ts, value, roll_mean, roll_std, roll_n,
       CAST(CASE WHEN roll_n >= 5 AND roll_std > 0
                  AND abs(value - roll_mean) > 3 * roll_std
            THEN 1 ELSE 0 END AS INT) AS is_outlier
FROM r""",
    "st2_stream_gaps": """
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
)
SELECT user_id, prev AS gap_start, ts AS gap_end,
       CAST(date_diff('microsecond', prev, ts) AS DOUBLE) / 1000000
           AS gap_seconds
FROM o
WHERE date_diff('microsecond', prev, ts) > 86400000000""",
    **DATAPIPE_ORACLE,
}

# derived-oracle guard: st13 is d7's SQL with its final argmax lifted
# into a CTE — if the d7 tail is ever reworded, str.replace no-ops and
# st13 would silently check d7's rows instead
assert (
    ORACLE["st13_stream_ingest_neardup"]
    != DATAPIPE_ORACLE["d7_incremental_neardup"]
), "st13 oracle derivation no-opped — d7's SQL tail was reworded"

# st14: d8's oracle with the seed batch's own survivors unioned in —
# the drained streaming survivor table is the seed (NULL max cosine:
# the store did not exist for batch 1) plus d8's batch-2 result
ORACLE["st14_stream_ingest_embedding"] = DATAPIPE_ORACLE[
    "d8_embedding_store"
].replace(
    "\nSELECT vec_id, max_store_cos FROM sc WHERE max_store_cos < 0.9",
    "\nSELECT vec_id, CAST(NULL AS DOUBLE) AS max_store_cos FROM store\n"
    "UNION ALL\n"
    "SELECT vec_id, max_store_cos FROM sc WHERE max_store_cos < 0.9",
)
assert (
    ORACLE["st14_stream_ingest_embedding"]
    != DATAPIPE_ORACLE["d8_embedding_store"]
), "st14 oracle derivation no-opped — d8's SQL tail was reworded"

# st15: deterministic serving means the drained stream result equals
# the batch x2 algebra over the union of streamed query batches —
# x2's oracle with the query-id bound widened from 5 to 10
ORACLE["st15_stream_knn_serve"] = DATAPIPE_ORACLE["x2_knn_ivf"].replace(
    "WHERE e.vec_id < 5", "WHERE e.vec_id < 10"
)
assert (
    ORACLE["st15_stream_knn_serve"] != DATAPIPE_ORACLE["x2_knn_ivf"]
), "st15 oracle derivation no-opped — x2's query filter was reworded"



ORACLE["a17_change_intervals"] = """
WITH m AS (
  SELECT user_id, ts, event_type, event_id,
         LAG(event_type) OVER w AS prev,
         ROW_NUMBER() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
c AS (
  SELECT * FROM m
  WHERE rn = 1 OR event_type IS DISTINCT FROM prev
)
SELECT user_id, event_type,
       CAST(ROW_NUMBER() OVER w2 AS INT) AS version,
       ts AS valid_from,
       LEAD(ts) OVER w2 AS valid_to
FROM c
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)"""

ORACLE["s11_orc_roundtrip"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents"""


ORACLE["j5_interval_join"] = """
WITH act AS (
  SELECT user_id, MIN(ts) AS a_lo, MAX(ts) AS a_hi
  FROM events GROUP BY user_id, date_trunc('day', ts)
),
m AS (
  SELECT event_id AS m_id, ts AS m_lo, ts + INTERVAL 4 HOUR AS m_hi
  FROM events WHERE event_id % 997 = 0
)
SELECT user_id, a_lo, a_hi, m_id, m_lo, m_hi
FROM act, m
WHERE a_lo <= m_hi AND m_lo <= a_hi"""

ORACLE["h10_returned_revenue"] = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20"""


ORACLE["h11_nation_volume"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_3', 'NATION_7')
  AND n2.n_name IN ('NATION_3', 'NATION_7')
  AND n1.n_name != n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)"""

ORACLE["h12_promo_share"] = """
SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
       CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2))
                             - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_revenue,
       ROUND(100.0
             * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                  * (CAST(1 AS DECIMAL(18,2))
                                     - CAST(l_discount AS DECIMAL(18,2)))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             6) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY month(l_shipdate)"""

ORACLE["h13_disjunctive_filter"] = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#9' AND p_size BETWEEN 5 AND 20
       AND l_quantity BETWEEN 10 AND 30)
GROUP BY p_brand"""
# drained streaming SCD2 == the batch a17 rows that have CLOSED
ORACLE["st18_stream_scd2"] = (
    "SELECT * FROM (" + ORACLE["a17_change_intervals"] + "\n)"
    " WHERE valid_to IS NOT NULL"
)

# j1's ASOF join + the exact integer-µs staleness cutoff the engine
# applies (age = epoch_us(event) - epoch_us(match) > 6h -> both
# carried columns null in ONE projection)
ORACLE["j6_asof_tolerance"] = """
WITH cal AS (
  SELECT user_id, ts, MAX(value) AS cal_value
  FROM events WHERE event_id % 97 = 0
  GROUP BY user_id, ts
),
a AS (
  SELECT e.event_id, e.ts AS ev_ts, cal.ts AS m_ts, cal.cal_value AS m_v
  FROM events e
  ASOF LEFT JOIN cal ON e.user_id = cal.user_id AND e.ts >= cal.ts
)
SELECT event_id,
       CASE WHEN epoch_us(ev_ts) - epoch_us(m_ts) <= 21600000000
            THEN m_ts END AS cal_ts,
       CASE WHEN epoch_us(ev_ts) - epoch_us(m_ts) <= 21600000000
            THEN m_v END AS cal_value
FROM a"""

# w10's oracle with the window mirrored: FIRST non-null over the
# FOLLOWING frame (NOCB)
ORACLE["w14_bfill"] = """
WITH s AS (
  SELECT ts, MAX(value) AS value FROM events WHERE user_id = 7 GROUP BY ts
),
b AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM s),
grid AS (
  SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
                                INTERVAL 6 HOUR)) AS grid_ts
),
reg AS (
  SELECT g.grid_ts, s.value, CAST(s.ts IS NULL AS INT) AS is_gap
  FROM grid g LEFT JOIN s ON s.ts = g.grid_ts
)
SELECT grid_ts, value, is_gap,
       first_value(value IGNORE NULLS)
           OVER (ORDER BY grid_ts
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS value_bfilled
FROM reg"""

# Q13 shape: LEFT OUTER join with the priority filter in the JOIN
# condition (zero-order customers land in the 0 bucket), per-customer
# count of matched orders, then the count histogram
ORACLE["h14_order_distribution"] = """
WITH per_cust AS (
  SELECT c.c_custkey,
         CAST(COUNT(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority != '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count"""

# Q17 shape: the correlated 20%-of-avg quantity gate, cross-multiplied
# exactly (5*qty*n < sum) so no float average exists on either engine
ORACLE["h15_small_qty_revenue"] = """
WITH j AS (
  SELECT l_partkey, l_quantity, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(18,2)))
             OVER (PARTITION BY l_partkey) AS sq,
         COUNT(*) OVER (PARTITION BY l_partkey) AS nq
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM j
WHERE CAST(l_quantity AS DECIMAL(18,2)) * nq * 5 < sq"""

# Q11 shape: per-part value vs a global-threshold scalar, both from
# the nation-filtered join; fraction test cross-multiplied exactly
ORACLE["h16_important_parts"] = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2))
                - CAST(l_discount AS DECIMAL(18,2)))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
FROM per_part
WHERE val * 10000 > (SELECT SUM(val) FROM per_part)"""

# Q15 shape: max-revenue supplier(s) over a fixed quarter, the max
# compared on exact decimals
ORACLE["h17_top_supplier"] = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2))
                - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT MAX(rev) FROM per_supp)"""

# Q16 shape: distinct supplier counts per (brand, size) with the
# denylist excluded by NOT IN (the anti-join twin)
ORACLE["h18_supplier_part_counts"] = """
SELECT p_brand, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#5' AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size"""

# Q21 shape: EXISTS (another supplier in the order) and NOT EXISTS
# (another supplier shipped later), counted per supplier name
ORACLE["h19_waiting_supplier"] = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l1.l_orderkey = o_orderkey
WHERE n_name = 'NATION_5' AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey != l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey != l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name"""

# Q22 shape: the above-positive-average balance gate (cross-multiplied
# exactly) plus a NOT-EXISTS on recent orders, rolled up per nation
ORACLE["h20_balance_gate"] = """
WITH stats AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tot, COUNT(*) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, stats
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * stats.cnt > stats.tot
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name"""

# Q2 shape: argmin-per-part over the (part, supplier) min-price
# aggregate, region-restricted, exact-decimal tie semantics
ORACLE["h21_min_cost_supplier"] = """
WITH costs AS (
  SELECT p_partkey, s_suppkey, s_name,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size >= 40 AND r_name = 'EUROPE'
  GROUP BY p_partkey, s_suppkey, s_name
)
SELECT p_partkey, s_suppkey, s_name, CAST(cost AS DOUBLE) AS cost
FROM costs
WHERE cost = (SELECT MIN(c2.cost) FROM costs c2
              WHERE c2.p_partkey = costs.p_partkey)"""

# exact per-key OLS: x = µs offset from the user's first event,
# y = value in integer cents; HUGEINT sums mirror Spark's
# DECIMAL(38,0); only the final divisions run in double.  The
# HUGEINT->DOUBLE casts route through VARCHAR because DuckDB's direct
# hugeint->double conversion TRUNCATES (measured 1-ulp-off at 90-bit
# magnitudes) while Spark's Decimal.toDouble rounds to nearest —
# strtod is correctly rounded, so the string route matches Spark
# bit-for-bit (probed on 2,000 random 54-120-bit integers)
ORACLE["a18_trend"] = """
WITH b AS (
  SELECT user_id,
         CAST(epoch_us(ts) - MIN(epoch_us(ts))
                  OVER (PARTITION BY user_id) AS HUGEINT) AS x,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS y
  FROM events
),
s AS (
  SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy
  FROM b GROUP BY user_id
),
t AS (
  SELECT user_id, n,
         CAST(CAST(n*sxy - sx*sy AS VARCHAR) AS DOUBLE) AS numd,
         CAST(CAST(n*sxx - sx*sx AS VARCHAR) AS DOUBLE) AS dend,
         CAST(CAST(n*syy - sy*sy AS VARCHAR) AS DOUBLE) AS denyd,
         n*sxx - sx*sx AS den_exact, n*syy - sy*sy AS deny_exact
  FROM s
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       (numd / dend) * 10000.0 AS slope_per_sec,
       CASE WHEN deny_exact > 0 THEN (numd * numd) / (dend * denyd)
       END AS r2
FROM t
WHERE n >= 2 AND den_exact != 0"""

# nearest-in-either-direction: DuckDB ASOF both ways (>= backward,
# <= forward — both include equality; the engine's forward frame
# excludes a same-instant record but the backward tie-break picks the
# identical unique (user, ts) row, so the outputs agree), distance
# compared in exact integer µs, tie -> the earlier (backward) record
ORACLE["j7_nearest_join"] = """
WITH cal AS (
  SELECT user_id, ts, MAX(value) AS cal_value
  FROM events WHERE event_id % 97 = 0
  GROUP BY user_id, ts
),
b AS (
  SELECT e.event_id, e.ts AS ev_ts, c.ts AS b_ts, c.cal_value AS b_v
  FROM events e
  ASOF LEFT JOIN cal c ON e.user_id = c.user_id AND e.ts >= c.ts
),
f AS (
  SELECT e.event_id, c.ts AS f_ts, c.cal_value AS f_v
  FROM events e
  ASOF LEFT JOIN cal c ON e.user_id = c.user_id AND e.ts <= c.ts
)
SELECT b.event_id,
       CASE WHEN f_ts IS NULL
              OR (b_ts IS NOT NULL
                  AND epoch_us(ev_ts) - epoch_us(b_ts)
                      <= epoch_us(f_ts) - epoch_us(ev_ts))
            THEN b_ts ELSE f_ts END AS cal_ts,
       CASE WHEN f_ts IS NULL
              OR (b_ts IS NOT NULL
                  AND epoch_us(ev_ts) - epoch_us(b_ts)
                      <= epoch_us(f_ts) - epoch_us(ev_ts))
            THEN b_v ELSE f_v END AS cal_value
FROM b JOIN f USING (event_id)"""

# hierarchical aggregate: DuckDB GROUP BY ROLLUP mirrors Spark's
# rollup() — super-aggregate rows carry NULL group keys on both sides
ORACLE["h22_rollup_revenue"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

# the partition-pruned roundtrip must return exactly the day-15 slice
# of the seeded table (partition values round-trip through directory
# names; the engine side additionally pins PartitionFilters by pytest)
ORACLE["s12_partitioned_roundtrip"] = f"""
WITH {_SEEDED_SQL}
SELECT event_id, value, value_qcflag,
       CAST(day(ts) AS INT) AS qc_day
FROM seeded WHERE day(ts) = 15"""

# exact per-key lag-1 autocorrelation: consecutive pairs by
# (ts, event_id), integer-cent sums in HUGEINT (Spark DECIMAL(38,0)),
# VARCHAR-routed HUGEINT->DOUBLE casts (see a18), final divide and
# sqrt in double with pinned operand order
ORACLE["a19_autocorr"] = """
WITH p AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x,
         LEAD(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
  FROM events
),
s AS (
  SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy
  FROM p WHERE y IS NOT NULL GROUP BY user_id
),
t AS (
  SELECT user_id, n,
         CAST(CAST(n*sxy - sx*sy AS VARCHAR) AS DOUBLE) AS numd,
         CAST(CAST(n*sxx - sx*sx AS VARCHAR) AS DOUBLE) AS dxd,
         CAST(CAST(n*syy - sy*sy AS VARCHAR) AS DOUBLE) AS dyd,
         n*sxx - sx*sx AS dx_e, n*syy - sy*sy AS dy_e
  FROM s
)
SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
       numd / sqrt(dxd * dyd) AS acf1
FROM t WHERE n >= 2 AND dx_e > 0 AND dy_e > 0"""

# stream-stream join drained over a bounded replay == the batch range
# join (single-source monotone replay: nothing arrives beyond the
# watermark, so no match is evicted early); bounds inclusive, exact µs
ORACLE["st21_stream_stream_join"] = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 4 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'"""

ORACLE["w17_ohlc"] = f"""
WITH src AS (
  SELECT user_id, epoch_us(ts) AS us,
         epoch_us(ts) // {360 * 60 * 1_000_000} AS bk,
         value AS y, event_id
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id, bk
                            ORDER BY us, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, bk
                            ORDER BY us DESC, event_id DESC) AS rn_d
  FROM src
)
SELECT user_id, make_timestamp(bk * {360 * 60 * 1_000_000}) AS bucket_ts,
       MAX(CASE WHEN rn_a = 1 THEN y END) AS open,
       MAX(y) AS high, MIN(y) AS low,
       MAX(CASE WHEN rn_d = 1 THEN y END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM w GROUP BY user_id, bk"""

# st26: w17's SQL under st7's append-mode emission horizon — only
# buckets whose END the final watermark (max event time − 1 h over
# the value-bearing rows the operator actually streams) has passed.
ORACLE["st26_stream_ohlc"] = f"""
WITH src AS (
  SELECT user_id, epoch_us(ts) AS us,
         epoch_us(ts) // {360 * 60 * 1_000_000} AS bk,
         value AS y, event_id
  FROM events WHERE value IS NOT NULL
),
m AS (SELECT MAX(make_timestamp(us)) AS mx FROM src),
w AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id, bk
                            ORDER BY us, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, bk
                            ORDER BY us DESC, event_id DESC) AS rn_d
  FROM src
)
SELECT user_id, make_timestamp(bk * {360 * 60 * 1_000_000}) AS bucket_ts,
       MAX(CASE WHEN rn_a = 1 THEN y END) AS open,
       MAX(y) AS high, MIN(y) AS low,
       MAX(CASE WHEN rn_d = 1 THEN y END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM w GROUP BY user_id, bk
HAVING make_timestamp(bk * {360 * 60 * 1_000_000}) + INTERVAL 6 HOUR
         <= (SELECT mx FROM m) - INTERVAL 1 HOUR"""

ORACLE["e4_transitions"] = """
WITH src AS (
  SELECT user_id, epoch_us(ts) AS us, event_type AS from_type, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
),
p AS (
  SELECT from_type,
         LEAD(from_type) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS to_type
  FROM src
),
per AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM p WHERE to_type IS NOT NULL GROUP BY from_type, to_type
),
tot AS (
  SELECT *, CAST(SUM(n_pairs) OVER (PARTITION BY from_type) AS BIGINT)
              AS n_from
  FROM per
)
SELECT from_type, to_type, n_pairs, n_from,
       CAST((2 * CAST(n_pairs AS HUGEINT) * 1000000000
             + CAST(n_from AS HUGEINT))
            // (2 * CAST(n_from AS HUGEINT)) AS DOUBLE)
           / 1000000000.0 AS frac_of_from
FROM tot"""

# e5: the engine elects the touch via a RANGE-frame struct max over
# ONE user-key exchange; the oracle replays the same election as a
# join + ROW_NUMBER pick (fine at oracle scale) — last touch = max
# (us, event_id) among strictly-earlier in-lookback touches.
ORACLE["e5_attribution"] = """
WITH src AS (
  SELECT user_id, epoch_us(ts) AS us, event_type, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IN ('purchase', 'signup', 'click')
),
conv AS (SELECT * FROM src WHERE event_type = 'purchase'),
touch AS (SELECT * FROM src WHERE event_type <> 'purchase'),
ranked AS (
  SELECT c.user_id, c.event_id, c.us,
         t.event_type AS touch_type, t.us AS tus,
         ROW_NUMBER() OVER (
           PARTITION BY c.user_id, c.event_id
           ORDER BY t.us DESC, t.event_id DESC) AS rn
  FROM conv c
  JOIN touch t
    ON c.user_id = t.user_id
   AND t.us <= c.us - 1
   AND t.us >= c.us - 604800000000
)
SELECT c.user_id, c.event_id,
       make_timestamp(c.us) AS conv_ts,
       r.touch_type,
       make_timestamp(r.tus) AS touch_ts,
       CAST(c.us - r.tus AS BIGINT) AS lag_us
FROM conv c
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
  ON c.user_id = r.user_id AND c.event_id = r.event_id"""

# st24: on an in-order drain the stateful pair stream equals the
# batch lead() pairs (the e4 core before aggregation), one row per
# successor event.
ORACLE["st24_stream_transitions"] = """
WITH src AS (
  SELECT user_id, epoch_us(ts) AS us, event_type, event_id
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL AND event_id IS NOT NULL
),
p AS (
  SELECT user_id, event_type AS from_type,
         LEAD(event_type) OVER w AS to_type,
         LEAD(us)         OVER w AS to_us,
         LEAD(event_id)   OVER w AS to_id
  FROM src
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT user_id, from_type, to_type,
       make_timestamp(to_us) AS ts, to_id AS event_id
FROM p WHERE to_type IS NOT NULL"""

# st25: on an in-order drain the six-scalar stateful election equals
# the batch last-touch election exactly — the oracle IS e5's SQL.
ORACLE["st25_stream_attribution"] = ORACLE["e5_attribution"]

# e6: the engine explodes the distinct PAIR table into each pair's
# window_periods target days; the oracle replays the identical
# expansion with generate_series.
ORACLE["e6_active_users"] = """
WITH pairs AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
dau AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS n_active_period
  FROM pairs GROUP BY d
),
con AS (
  SELECT user_id, unnest(generate_series(d, d + 6)) AS td FROM pairs
),
wau AS (
  SELECT td, CAST(COUNT(DISTINCT user_id) AS BIGINT)
               AS n_active_window
  FROM con GROUP BY td
)
SELECT make_timestamp(dau.d * 86400000000) AS period_ts,
       dau.n_active_period, wau.n_active_window
FROM dau JOIN wau ON wau.td = dau.d"""

# st23: the engine drains a left_outer stream-stream join whose right
# side went quiet and was revived by sentinel heartbeats; once the
# watermark has finalized everything below the tail filter, the
# result IS a plain LEFT range join (right side = clicks before the
# quiet cut; heartbeats are sentinel-keyed and never match).
ORACLE["st23_heartbeat_guard"] = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
FROM events p
LEFT JOIN (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-16'
) c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 4 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
  AND p.ts < TIMESTAMP '2024-01-29'"""

_W15_STEP_US = 360 * 60 * 1_000_000
ORACLE["w15_time_weighted"] = f"""
WITH src AS (
  SELECT user_id, epoch_us(ts) AS us,
         epoch_us(ts) // {_W15_STEP_US} AS bk,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(20,0)) AS y,
         event_id
  FROM events WHERE value IS NOT NULL
),
held AS (
  SELECT user_id, bk, y,
         COALESCE(LEAD(us) OVER (PARTITION BY user_id, bk
                                 ORDER BY us, event_id),
                  (bk + 1) * {_W15_STEP_US}) - us AS w
  FROM src
),
agg AS (
  SELECT user_id, bk, COUNT(*) AS n_obs,
         SUM(CAST(w AS DECIMAL(20,0)) * y) AS num,
         SUM(w) AS den
  FROM held GROUP BY user_id, bk
)
SELECT user_id, make_timestamp(bk * {_W15_STEP_US}) AS bucket_ts,
       CAST(n_obs AS BIGINT) AS n_obs,
       -- exact 9-dp HALF_UP as integer nanodigit division (mirrors
       -- the engine: no float until the closing nanos -> double)
       CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
            * ((2 * ABS(CAST(num AS HUGEINT)) * 1000000000
                + CAST(den AS HUGEINT) * 100)
               // (2 * CAST(den AS HUGEINT) * 100)) AS DOUBLE)
           / 1000000000.0 AS twa_value
FROM agg"""

# w16: the hold span [us, end) may cross buckets — UNNEST a
# generate_series over the touched bucket ids and weight each slice
# by its in-bucket overlap (mirrors the engine's chunked explode).
ORACLE["w16_twa_carry"] = f"""
WITH src AS (
  SELECT user_id, epoch_us(ts) AS us,
         epoch_us(ts) // {_W15_STEP_US} AS bk,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(20,0)) AS y,
         event_id
  FROM events WHERE value IS NOT NULL
),
spans AS (
  SELECT user_id, us, bk, y,
         COALESCE(LEAD(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id),
                  (bk + 1) * {_W15_STEP_US}) AS end_us
  FROM src
),
g AS (
  SELECT user_id, us, bk, y, end_us,
         UNNEST(generate_series(bk,
           CASE WHEN end_us > us THEN (end_us - 1) // {_W15_STEP_US}
                ELSE bk END)) AS b
  FROM spans
),
contrib AS (
  SELECT user_id, b,
         CASE WHEN bk = b THEN 1 ELSE 0 END AS is_obs,
         GREATEST(LEAST(end_us, (b + 1) * {_W15_STEP_US})
                  - GREATEST(us, b * {_W15_STEP_US}), 0) AS w,
         y
  FROM g
),
agg AS (
  SELECT user_id, b, SUM(is_obs) AS n_obs,
         SUM(CAST(w AS DECIMAL(20,0)) * y) AS num,
         SUM(w) AS den
  FROM contrib GROUP BY user_id, b
)
SELECT user_id, make_timestamp(b * {_W15_STEP_US}) AS bucket_ts,
       CAST(n_obs AS BIGINT) AS n_obs,
       CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
            * ((2 * ABS(CAST(num AS HUGEINT)) * 1000000000
                + CAST(den AS HUGEINT) * 100)
               // (2 * CAST(den AS HUGEINT) * 100)) AS DOUBLE)
           / 1000000000.0 AS twa_value
FROM agg"""

_E1_H_US = 7 * 86400 * 1_000_000
ORACLE["e1_funnel"] = f"""
WITH t0 AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t0
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
t1 AS (
  SELECT e.user_id, MIN(epoch_us(ts)) AS t1
  FROM events e JOIN t0 USING (user_id)
  WHERE event_type = 'click' AND t0 IS NOT NULL
    AND epoch_us(ts) > t0 AND epoch_us(ts) <= t0 + {_E1_H_US}
  GROUP BY e.user_id
),
t2 AS (
  SELECT e.user_id, MIN(epoch_us(ts)) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE event_type = 'purchase'
    AND epoch_us(ts) > t1 AND epoch_us(ts) <= t1 + {_E1_H_US}
  GROUP BY e.user_id
),
c AS (
  SELECT (SELECT COUNT(t0) FROM t0) AS c0,
         (SELECT COUNT(*) FROM t1) AS c1,
         (SELECT COUNT(*) FROM t2) AS c2
)
SELECT CAST(0 AS INT) AS stage_idx, 'signup' AS stage,
       CAST(c0 AS BIGINT) AS n_users,
       CASE WHEN c0 > 0
            THEN ROUND(CAST(c0 AS DOUBLE) / CAST(c0 AS DOUBLE), 9) END
           AS frac_of_first
FROM c
UNION ALL
SELECT CAST(1 AS INT), 'click', CAST(c1 AS BIGINT),
       CASE WHEN c0 > 0
            THEN ROUND(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE), 9) END
FROM c
UNION ALL
SELECT CAST(2 AS INT), 'purchase', CAST(c2 AS BIGINT),
       CASE WHEN c0 > 0
            THEN ROUND(CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE), 9) END
FROM c"""

_E2_PERIOD_US = 7 * 86400 * 1_000_000
ORACLE["e2_retention"] = f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) // {_E2_PERIOD_US} AS p
  FROM events WHERE user_id IS NOT NULL
),
f AS (SELECT user_id, MIN(p) AS p0 FROM p GROUP BY user_id),
a AS (SELECT DISTINCT user_id, p FROM p),
h AS (
  SELECT a.user_id, p0, a.p - p0 AS k
  FROM a JOIN f USING (user_id)
  WHERE a.p - p0 >= 0 AND a.p - p0 < 4
),
cell AS (SELECT p0, k, COUNT(*) AS n_active FROM h GROUP BY p0, k),
cs AS (SELECT p0, COUNT(*) AS n_cohort FROM f GROUP BY p0)
SELECT make_timestamp(p0 * {_E2_PERIOD_US}) AS cohort_ts,
       CAST(k AS INT) AS period_k,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(n_cohort AS BIGINT) AS n_cohort,
       ROUND(CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE), 9)
           AS retention
FROM cell JOIN cs USING (p0)"""

ORACLE["st22_stream_funnel"] = f"""
WITH t0 AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t0
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
t1 AS (
  SELECT e.user_id, MIN(epoch_us(ts)) AS t1
  FROM events e JOIN t0 USING (user_id)
  WHERE event_type = 'click' AND t0 IS NOT NULL
    AND epoch_us(ts) > t0 AND epoch_us(ts) <= t0 + {_E1_H_US}
  GROUP BY e.user_id
),
t2 AS (
  SELECT e.user_id, MIN(epoch_us(ts)) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE event_type = 'purchase'
    AND epoch_us(ts) > t1 AND epoch_us(ts) <= t1 + {_E1_H_US}
  GROUP BY e.user_id
)
SELECT user_id, CAST(0 AS INT) AS stage_idx, 'signup' AS stage,
       make_timestamp(t0) AS ts
FROM t0 WHERE t0 IS NOT NULL
UNION ALL
SELECT user_id, CAST(1 AS INT), 'click', make_timestamp(t1) FROM t1
UNION ALL
SELECT user_id, CAST(2 AS INT), 'purchase', make_timestamp(t2) FROM t2"""

ORACLE["e3_funnel_lags"] = f"""
WITH t0 AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t0
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
t1 AS (
  SELECT e.user_id, MIN(epoch_us(ts)) AS t1
  FROM events e JOIN t0 USING (user_id)
  WHERE event_type = 'click' AND t0 IS NOT NULL
    AND epoch_us(ts) > t0 AND epoch_us(ts) <= t0 + {_E1_H_US}
  GROUP BY e.user_id
),
t2 AS (
  SELECT e.user_id, MIN(epoch_us(ts)) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE event_type = 'purchase'
    AND epoch_us(ts) > t1 AND epoch_us(ts) <= t1 + {_E1_H_US}
  GROUP BY e.user_id
),
j AS (
  SELECT t0.user_id, t0, t1, t2
  FROM t0 LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
),
l AS (
  SELECT CAST(t1 - t0 AS DECIMAL(20,0)) AS lag1,
         CAST(t2 - t1 AS DECIMAL(20,0)) AS lag2
  FROM j
),
a AS (
  SELECT COUNT(lag1) AS n1, SUM(lag1) AS s1,
         MIN(lag1) AS mn1, MAX(lag1) AS mx1,
         COUNT(lag2) AS n2, SUM(lag2) AS s2,
         MIN(lag2) AS mn2, MAX(lag2) AS mx2
  FROM l
)
SELECT CAST(1 AS INT) AS stage_idx, 'click' AS stage,
       CAST(n1 AS BIGINT) AS n_converted,
       CASE WHEN n1 > 0 THEN ROUND(CAST(s1 AS DOUBLE)
            / CAST(n1 AS DOUBLE) / 1000000.0, 9) END AS avg_lag_s,
       ROUND(CAST(mn1 AS DOUBLE) / 1000000.0, 6) AS min_lag_s,
       ROUND(CAST(mx1 AS DOUBLE) / 1000000.0, 6) AS max_lag_s
FROM a
UNION ALL
SELECT CAST(2 AS INT), 'purchase', CAST(n2 AS BIGINT),
       CASE WHEN n2 > 0 THEN ROUND(CAST(s2 AS DOUBLE)
            / CAST(n2 AS DOUBLE) / 1000000.0, 9) END,
       ROUND(CAST(mn2 AS DOUBLE) / 1000000.0, 6),
       ROUND(CAST(mx2 AS DOUBLE) / 1000000.0, 6)
FROM a"""
