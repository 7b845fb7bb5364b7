import gzip
import os

import pytest
from pyspark.sql import functions as F

from qctimeseries_spark import (
    add_flags,
    assign_windows,
    check_panel,
    downsample_minmax,
    flagged_overlay,
    main_trace,
    qc_pipeline,
    secondary_trace,
    smart_stem,
    with_rowid,
    write_exports,
)
from qctimeseries_spark.viz import approved_overlay, clamp, epoch_to_timestamp
from qctimeseries_spark.windows import window_extent


@pytest.fixture(scope="module")
def qc(multivar):
    df = with_rowid(add_flags(multivar, ["temp"]), "DateTime")
    df = assign_windows(df, "DateTime", hours=24)
    return df.withColumn(
        "temp_qcflag",
        F.when(F.col("temp_qcflag") == -1, -1)
        .when(F.col("block") == 0, 1)
        .when(F.col("block") == 1, -2)
        .otherwise(0),
    ).cache()


def test_main_trace_filters(qc):
    v1 = main_trace(qc, "temp", "DateTime", 0)
    assert v1.columns == ["DateTime", "temp", "rowid"]
    assert v1.filter(F.col("temp").isNull()).count() == 0
    hidden = main_trace(qc, "temp", "DateTime", 0, hide_flagged=True)
    assert hidden.count() < v1.count()


def test_overlays(qc):
    assert approved_overlay(qc, "temp", "DateTime", 0).count() > 0
    fl = flagged_overlay(qc, "temp", "DateTime", 0)
    vals = [r.temp for r in fl.collect()]
    assert vals and all(v is not None for v in vals)


def test_secondary_trace_schema_dependent(qc):
    sec = secondary_trace(qc, "hum", "DateTime", 0)
    assert sec.columns == ["DateTime", "hum"]
    assert sec.filter(F.col("hum").isNull()).count() == 0


def test_check_panel_union(qc):
    panel = check_panel(qc, "temp", "DateTime")
    counts = {r.panel: r["cnt"] for r in panel.groupBy("panel").agg(F.count("*").alias("cnt")).collect()}
    assert counts["raw"] == counts["clean"] == qc.count()
    clean_nonnull = panel.filter((F.col("panel") == "clean") & F.col("temp").isNotNull())
    approved = qc.filter(F.col("temp_qcflag") == 1)
    assert clean_nonnull.count() == approved.count()


def test_downsample_minmax(qc):
    ds = downsample_minmax(qc, "temp", "DateTime", n_buckets=10)
    rows = ds.collect()
    assert len(rows) <= 10
    assert sum(r.n_rows for r in rows) == qc.filter(F.col("temp").isNotNull()).count()
    for r in rows:
        assert r.y_min <= r.y_open <= r.y_max and r.y_min <= r.y_close <= r.y_max


def test_smart_stem():
    assert smart_stem("site1_qc") == "site1"
    assert smart_stem("site1_qc_clean") == "site1"
    assert smart_stem("plain") == "plain"


def test_write_exports_roundtrip(qc, spark, tmp_path):
    out = write_exports(
        qc.drop("rowid", "win_id"),
        str(tmp_path),
        "site1_qc",
        time_col="DateTime",
    )
    assert set(out) == {"csv", "parquet", "checksums"}
    # clean parquet variant: flags dropped, flag<0 masked
    clean = spark.read.parquet([p for p in out["parquet"] if "clean" in p][0])
    assert not [c for c in clean.columns if c.endswith("_qcflag")]
    # csv is gzipped with ISO timestamps and NA markers
    csv_dir = [p for p in out["csv"] if "_qc_" in p][0]
    part = [f for f in os.listdir(csv_dir) if f.endswith(".csv.gz")][0]
    with gzip.open(os.path.join(csv_dir, part), "rt") as fh:
        header = fh.readline().strip().split(",")
        line = fh.readline()
    assert "DateTime" in header and "T" in line and "Z" in line
    # checksum file covers all written files
    with open(out["checksums"][0]) as fh:
        sums = fh.read().strip().splitlines()
    assert len(sums) >= 4


def test_xlsx_chunk_ids_match_global_order(spark):
    # S5 chunking must agree with the global sort order at any cap
    from qctimeseries_spark.exports import _with_chunk_ids

    df = spark.createDataFrame(
        [(i * 37 % 101, i) for i in range(101)], "k int, payload int"
    ).repartition(7)
    chunked, pinned = _with_chunk_ids(df, ["k"], cap=10)
    try:
        rows = chunked.collect()
    finally:
        pinned.unpersist()
    got = {r.k: r._chunk for r in rows}
    assert got == {k: k // 10 for k in range(101)}  # rank order, cap 10


def test_xlsx_chunking_has_no_global_window(spark):
    # the old implementation funneled the full table through ONE task
    # via row_number() OVER (ORDER BY ...) with no partition spec
    from qctimeseries_spark.exports import _with_chunk_ids
    from qctimeseries_spark.plans import plan_summary

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "k int, v double"
    )
    for order_by in (["k"], None):
        chunked, pinned = _with_chunk_ids(df, order_by, cap=10)
        try:
            assert plan_summary(chunked)["global_windows"] == 0
        finally:
            pinned.unpersist()


def _read_xlsx_sheets(path):
    """Parse the OOXML parts back with stdlib zip + ElementTree."""
    import xml.etree.ElementTree as ET
    import zipfile

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    out = {}
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.iter(f"{ns}sheet")]
        for i, name in enumerate(names, start=1):
            root = ET.fromstring(z.read(f"xl/worksheets/sheet{i}.xml"))
            rows = []
            for row in root.iter(f"{ns}row"):
                vals = []
                for c in row.iter(f"{ns}c"):
                    if c.get("t") == "inlineStr":
                        vals.append(c.find(f"{ns}is/{ns}t").text)
                    else:
                        v = c.find(f"{ns}v")
                        vals.append(None if v is None else float(v.text))
                rows.append(vals)
            out[name] = rows
    return out


def test_xlsx_sink_end_to_end_without_openpyxl(spark, tmp_path):
    """S5 runs for real in this container: the builtin OOXML writer
    chunks sheets at the cap and the written workbook parses back."""
    from qctimeseries_spark.exports import _write_xlsx

    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) / 4) for i in range(25)],
        "id int, label string, score double",
    )
    paths = _write_xlsx(df, str(tmp_path / "site1"), ["id"], max_rows=10)
    sheets = _read_xlsx_sheets(paths[0])
    assert sorted(sheets) == ["sheet1", "sheet2", "sheet3"]  # 10+10+5
    assert sheets["sheet1"][0] == ["id", "label", "score"]
    body = [r for name in sorted(sheets) for r in sheets[name][1:]]
    assert [r[0] for r in body] == [float(i) for i in range(25)]  # order
    assert body[3] == [3.0, "name3", 0.75]
    assert len(sheets["sheet3"]) == 1 + 5


def test_xlsx_sink_via_write_exports(spark, tmp_path):
    from qctimeseries_spark import write_exports

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.5)],
        "id int, DateTime string, v double",
    ).withColumn("DateTime", F.col("DateTime").cast("timestamp"))
    from qctimeseries_spark import add_flags

    out = write_exports(
        add_flags(df, ["v"]),
        str(tmp_path),
        "s",
        time_col="DateTime",
        write_csv=False,
        write_parquet=False,
        write_xlsx=True,
        xlsx_order_by=["id"],
    )
    assert out["xlsx"] and all(
        _read_xlsx_sheets(p) for p in out["xlsx"]
    )  # qc + clean variants both parse


def test_xlsx_chunk_ids_empty_frame(spark):
    from qctimeseries_spark.exports import _with_chunk_ids

    df = spark.createDataFrame([], "k int, v double")
    chunked, pinned = _with_chunk_ids(df, ["k"], cap=10)
    try:
        assert chunked.count() == 0
        assert chunked.columns == ["k", "v", "_chunk"]
    finally:
        pinned.unpersist()


def test_qc_pipeline_end_to_end(multivar):
    qc_df, clean, prog = qc_pipeline(
        multivar,
        ["temp", "hum"],
        time_col="DateTime",
        flag_predicates={"temp": F.col("temp") > 23},
    )
    n_bad = multivar.filter(F.col("temp") > 23).count()
    assert qc_df.filter(F.col("temp_qcflag") == -2).count() == n_bad
    assert clean.filter(F.col("temp").isNotNull()).count() == multivar.filter(
        F.col("temp").isNotNull()
    ).count() - n_bad
    assert {r.variable for r in prog.collect()} == {"temp", "hum"}


def test_qc_pipeline_validates_time_col(multivar):
    # the front door runs the same POSIXct-style validation as the
    # window/app paths — a non-timestamp time_col must hard-error
    # instead of sailing through flag init
    with pytest.raises(TypeError, match="must be a timestamp"):
        qc_pipeline(multivar, ["temp"], time_col="temp")
    with pytest.raises(ValueError, match="not found"):
        qc_pipeline(multivar, ["temp"], time_col="nope")


def test_clamp():
    # F10: R/qc_window_app.R:239-243
    assert clamp(5, 0, 10, 7) == 5
    assert clamp(-1, 0, 10, 7) == 0
    assert clamp(99, 0, 10, 7) == 10
    assert clamp(None, 0, 10, 7) == 7
    assert clamp(float("nan"), 0, 10, 7) == 7


def test_epoch_to_timestamp(spark):
    # F6: ms-vs-s heuristic, R/qc_window_app.R:349-352
    df = spark.createDataFrame(
        [(1.6e9,), (1.6e12,)], "x double"
    ).select(epoch_to_timestamp("x", col_name="ts"))
    got = [r.ts for r in df.collect()]
    assert got[0].year == 2020 and got[1].year == 2020


def test_window_extent():
    # W7: nominal bounds +/- 2% pad, R/qc_window_app.R:215-226
    import datetime as dt

    anchor = dt.datetime(2024, 1, 1)
    lo, hi = window_extent(anchor, 2, hours=24, pad=0.02)
    margin = dt.timedelta(seconds=86400 * 0.02)
    assert lo == dt.datetime(2024, 1, 3) - margin
    assert hi == dt.datetime(2024, 1, 4) + margin


def test_flag_levels_matches_reference_literals():
    """flag_levels() mirrors qc_flag_levels (R/qc_plots.R:181-192)
    literal-for-literal so front-ends color V1-V5 slices identically."""
    import qctimeseries_spark as qc
    from qctimeseries_spark.schema import FLAG_DOMAIN

    fl = qc.flag_levels()
    assert fl["levels"] == ["1", "0", "-1", "-2"]
    assert fl["labels"] == ["approved", "unchecked", "auto flag", "manual flag"]
    assert fl["colors"] == {
        "1": "forestgreen", "0": "steelblue", "-1": "orange", "-2": "red"
    }
    assert set(fl["by_flag"]) == set(FLAG_DOMAIN)
    assert fl["by_flag"][-2] == {"label": "manual flag", "color": "red"}
