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
