"""S8 PNG report sink: stacked raw/clean panels, height guard."""

import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F

from qctimeseries_spark import add_flags, save_all_check_plots, set_flag
from qctimeseries_spark.report import (
    MAX_HEIGHT_PX,
    panel_downsample,
    png_size,
)


@pytest.fixture()
def qc_table(multivar):
    df = add_flags(multivar, ["temp", "hum"])
    df = set_flag(df, "temp", -2, selection=F.col("temp") > 22)
    df = set_flag(
        df, "temp", 1,
        selection=(F.col("temp") <= 22) & (F.col("temp_qcflag") == 0),
    )
    return df


def _decode(path):
    import struct
    import zlib

    data = open(path, "rb").read()
    pos, idat = 8, b""
    while pos < len(data):
        ln, tag = struct.unpack(">I4s", data[pos : pos + 8])
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", data[pos + 8 : pos + 16])
        pos += 12 + ln
    raw = zlib.decompress(idat)
    return np.frombuffer(raw, np.uint8).reshape(h, w * 3 + 1)[:, 1:].reshape(
        h, w, 3
    )


def test_report_one_panel_pair_per_variable(qc_table, tmp_path):
    out = str(tmp_path / "checks.png")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = save_all_check_plots(
            qc_table, out, time_col="DateTime", width_px=400, per_var_px=120
        )
    assert not [w for w in caught if "px tall" in str(w.message)]
    assert got == out
    # 2 QC variables (temp, hum) -> height = 2 * per_var_px
    assert png_size(out) == (400, 240)
    arr = _decode(out)
    px = {tuple(c) for c in np.unique(arr.reshape(-1, 3), axis=0)}
    assert (70, 70, 190) in px   # raw band
    assert (30, 140, 60) in px   # clean band
    assert (200, 40, 40) in px   # flagged overlay
    # separators at each panel boundary
    assert (180, 180, 180) in px


def test_report_height_guard_warns(qc_table, tmp_path):
    out = str(tmp_path / "tall.png")
    with pytest.warns(UserWarning, match="px tall"):
        save_all_check_plots(
            qc_table, out, time_col="DateTime",
            width_px=50, per_var_px=MAX_HEIGHT_PX // 2 + 1, n_buckets=50,
        )
    assert png_size(out)[1] > MAX_HEIGHT_PX


def test_report_requires_qc_vars(multivar, tmp_path):
    with pytest.raises(ValueError, match="no QC variables"):
        save_all_check_plots(
            multivar, str(tmp_path / "x.png"), time_col="DateTime"
        )


def test_panel_downsample_bounded_and_consistent(qc_table):
    pdf = panel_downsample(
        qc_table, "temp", "DateTime", n_buckets=50
    ).toPandas()
    assert len(pdf) <= 50
    # clean band is a subset of the raw band's range
    m = pdf.dropna(subset=["clean_min"])
    assert (m.clean_min >= m.raw_min).all()
    assert (m.clean_max <= m.raw_max).all()
    # flagged band only where manual flags exist; temp>22 was flagged
    assert pdf["flag_min"].notna().any()
    assert int(pdf.n_rows.sum()) == qc_table.filter(
        F.col("temp").isNotNull()
    ).count()
