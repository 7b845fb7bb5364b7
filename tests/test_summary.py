from pyspark.sql import functions as F

from qctimeseries_spark import (
    add_flags,
    consistency_check,
    flag_domain_check,
    progress,
)


def _seeded(multivar):
    df = add_flags(multivar, ["temp", "hum"])
    return df.withColumn(
        "temp_qcflag",
        F.when(F.col("temp_qcflag") == -1, -1)
        .when(F.col("block") == 0, 1)
        .when(F.col("block") == 1, -2)
        .otherwise(0),
    )


def test_progress_dual_denominators(multivar):
    df = _seeded(multivar)
    prog = {r.variable: r for r in progress(df).collect()}
    n_all = df.count()
    n_valid = df.filter(F.col("temp").isNotNull()).count()
    n_checked = df.filter(
        F.col("temp").isNotNull() & ~F.col("temp_qcflag").isin(0, -1)
    ).count()
    n_approved = df.filter(F.col("temp_qcflag") == 1).count()
    t = prog["temp"]
    assert t.total == n_valid  # total = non-NA count
    assert t.pct_checked == round(100.0 * n_checked / n_valid, 2)  # denom: valid
    assert t.pct_approved == round(100.0 * n_approved / n_all, 2)  # denom: all
    # hum untouched: all 0 / -1
    h = prog["hum"]
    assert h.pct_checked == 0.0
    assert h.pct_approved == 0.0


def test_progress_hide_complete(multivar):
    df = add_flags(multivar, ["temp", "hum"])
    # approve every valid temp row -> temp complete
    df = df.withColumn(
        "temp_qcflag", F.when(F.col("temp_qcflag") == 0, 1).otherwise(F.col("temp_qcflag"))
    )
    remaining = progress(df, hide_complete=True).collect()
    assert [r.variable for r in remaining] == ["hum"]


def test_consistency_check(multivar):
    df = add_flags(multivar, ["temp"])
    ok = consistency_check(df, "temp").collect()[0]
    assert ok.consistent
    broken = df.withColumn("temp_qcflag", F.lit(0))  # NA rows lost their -1
    bad = consistency_check(broken, "temp").collect()[0]
    assert not bad.consistent and bad.n_flag_missing == 0


def test_flag_domain_check(multivar):
    df = add_flags(multivar, ["temp"])
    assert flag_domain_check(df, "temp").count() == 0
    dirty = df.withColumn(
        "temp_qcflag", F.when(F.col("block") == 2, 9).otherwise(F.col("temp_qcflag"))
    )
    bad = flag_domain_check(dirty, "temp").collect()
    assert [(r.variable, r.flag) for r in bad] == [("temp", 9)]


def test_progress_by_window_dual_denominators(spark):
    """Per-window progress keeps A1's two denominators: pct_checked is
    over non-NULL values, the class percentages over ALL rows."""
    import datetime as dt

    from qctimeseries_spark import add_flags, assign_windows
    from qctimeseries_spark.summary import progress_by_window

    t0 = dt.datetime(2024, 1, 1)
    # window 0: 2 null, 2 approved; window 1: 4 unchecked
    rows = [
        (t0 + dt.timedelta(hours=h), None if h < 2 else float(h))
        for h in range(4)
    ] + [(t0 + dt.timedelta(hours=24 + h), float(h)) for h in range(4)]
    df = add_flags(
        spark.createDataFrame(rows, "ts timestamp, value double"),
        "value", time_col="ts",
    )
    df = df.withColumn(
        "value_qcflag",
        F.when(
            (F.col("value").isNotNull()) & (F.col("ts") < t0 + dt.timedelta(hours=24)),
            1,
        ).otherwise(F.col("value_qcflag")),
    )
    out = {r["win_id"]: r for r in
           progress_by_window(assign_windows(df, "ts", 24), "value").collect()}
    w0, w1 = out[0], out[1]
    assert w0["total"] == 2 and w0["pct_checked"] == 100.0
    assert w0["pct_missing"] == 50.0 and w0["pct_approved"] == 50.0
    assert w1["pct_checked"] == 0.0 and w1["pct_unchecked"] == 100.0
    hidden = progress_by_window(
        assign_windows(df, "ts", 24), "value", hide_complete=True
    ).collect()
    assert [r["win_id"] for r in hidden] == [1]
