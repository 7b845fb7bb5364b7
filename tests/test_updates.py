import pytest
from pyspark.sql import functions as F

from qctimeseries_spark import (
    add_flags,
    approve_window,
    assign_windows,
    flag_and_approve_window,
    flag_window,
    reset_all,
    reset_window,
    set_flag,
    with_rowid,
)


@pytest.fixture(scope="module")
def qc(multivar):
    df = with_rowid(add_flags(multivar, ["temp"]), "DateTime")
    return assign_windows(df, "DateTime", hours=24).cache()


def flags(df):
    return {r.rowid: r.temp_qcflag for r in df.select("rowid", "temp_qcflag").collect()}


def test_set_flag_selected_guards_missing(qc):
    ids = [1, 2, 18, 19]  # rowid 18 => hour 17 -> i%17==0 is NA (rowid=i+1)
    before = flags(qc)
    na_ids = [k for k in ids if before[k] == -1]
    out = set_flag(qc, "temp", -2, selection=ids)
    after = flags(out)
    for k in ids:
        assert after[k] == (-1 if k in na_ids else -2)
    # untouched elsewhere
    assert all(after[k] == before[k] for k in before if k not in ids)


def test_set_flag_dataframe_selection(qc, spark):
    ids_df = spark.createDataFrame([(3,), (4,)], "rowid int")
    out = set_flag(qc, "temp", 1, selection=ids_df)
    after = flags(out)
    assert after[3] == 1 and after[4] == 1
    assert set(out.columns) == set(qc.columns)  # marker dropped


def test_flag_window_scope(qc):
    out = flag_window(qc, "temp", 2)
    rows = out.select("win_id", "temp", "temp_qcflag").collect()
    for r in rows:
        if r.win_id == 2:
            assert r.temp_qcflag == (-1 if r.temp is None else -2)
        else:
            assert r.temp_qcflag in (-1, 0)


def test_approve_window_only_unchecked_nonnull(qc):
    pre = set_flag(qc, "temp", -2, selection=[50])  # rowid 50 in window 2
    out = approve_window(pre, "temp", 2)
    after = flags(out)
    for r in out.select("rowid", "win_id", "temp", "temp_qcflag").collect():
        if r.win_id == 2:
            if r.rowid == 50:
                assert r.temp_qcflag == -2  # flagged rows untouched
            elif r.temp is None:
                assert r.temp_qcflag == -1
            else:
                assert r.temp_qcflag == 1


def test_reset_window_and_all(qc):
    messy = flag_window(qc, "temp", 1)
    back = reset_window(messy, "temp", 1)
    assert flags(back) == flags(qc)
    messy_all = set_flag(qc, "temp", -2)
    assert flags(reset_all(messy_all, "temp")) == flags(qc)


def test_reset_all_is_idempotent(qc):
    once = reset_all(qc, "temp")
    twice = reset_all(once, "temp")
    assert flags(once) == flags(twice)


def test_flag_and_approve_window(qc):
    sel = [49, 51]
    out = flag_and_approve_window(qc, "temp", 2, selection=sel)
    for r in out.select("rowid", "win_id", "temp", "temp_qcflag").collect():
        if r.rowid in sel:
            assert r.temp_qcflag == -2
        elif r.win_id == 2 and r.temp is not None:
            assert r.temp_qcflag == 1
        elif r.temp is None:
            assert r.temp_qcflag == -1
        else:
            assert r.temp_qcflag == 0
