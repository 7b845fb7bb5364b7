import pytest
from pyspark.sql import functions as F

from qctimeseries_spark import (
    add_flags,
    apply_flags,
    qc_vars,
    remove_flags,
    strict_clean,
    transfer_flags,
)


def test_add_flags_default_numeric(multivar):
    out = add_flags(multivar, time_col="DateTime")
    # numeric cols except time: temp, hum, block
    assert set(qc_vars(out)) == {"temp", "hum", "block"}


def test_add_flags_init_values(multivar):
    out = add_flags(multivar, ["temp"])
    rows = out.select("temp", "temp_qcflag").collect()
    for r in rows:
        assert r.temp_qcflag == (-1 if r.temp is None else 0)


def test_add_flags_rejects_non_numeric(multivar):
    with pytest.raises(TypeError):
        add_flags(multivar, ["treatment"])
    out = add_flags(multivar, ["treatment"], require_numeric=False)
    assert "treatment_qcflag" in out.columns


def test_add_flags_missing_var(multivar):
    with pytest.raises(ValueError):
        add_flags(multivar, ["nope"])


def test_add_flags_preserves_existing(multivar):
    once = add_flags(multivar, ["temp"])
    edited = once.withColumn("temp_qcflag", F.lit(1))
    again = add_flags(edited, ["temp"])  # no overwrite: flags kept
    assert again.agg(F.min("temp_qcflag")).collect()[0][0] == 1
    fresh = add_flags(edited, ["temp"], overwrite=True)
    assert fresh.agg(F.max("temp_qcflag")).collect()[0][0] == 0


def test_remove_flags(multivar):
    out = add_flags(multivar, ["temp", "hum"])
    assert remove_flags(out, ["temp"]).columns == [c for c in out.columns if c != "temp_qcflag"]
    assert not [c for c in remove_flags(out).columns if c.endswith("_qcflag")]
    with pytest.raises(ValueError):
        remove_flags(multivar, ["temp"])


def test_transfer_flags(multivar):
    out = add_flags(multivar, ["temp"])
    out = transfer_flags(out, "temp", "hum")
    rows = out.select("temp_qcflag", "hum_qcflag").collect()
    assert all(r.temp_qcflag == r.hum_qcflag for r in rows)
    with pytest.raises(ValueError):
        transfer_flags(out, "temp", "hum")  # exists, no overwrite


def test_apply_vs_strict_masking(multivar):
    df = add_flags(multivar, ["temp"])
    # craft a mixed flag state: -2 on i%5, 1 on i%3 (where flag != -1)
    df = df.withColumn(
        "temp_qcflag",
        F.when(F.col("temp_qcflag") == -1, -1)
        .when(F.col("block") == 0, -2)
        .when(F.col("block") == 1, 1)
        .otherwise(0),
    )
    lenient = apply_flags(df, "temp")  # masks flag<0
    strict = strict_clean(df, "temp")  # masks flag<1
    got = (
        lenient.select(F.col("temp").alias("len_v"), "temp_qcflag")
        .join(
            strict.select(F.col("temp").alias("str_v"), "DateTime", "temp_qcflag"),
            on="temp_qcflag",
            how="inner",
        )
        .limit(1)
    )
    n_len = lenient.filter(F.col("temp").isNotNull()).count()
    n_str = strict.filter(F.col("temp").isNotNull()).count()
    n_approved = df.filter(F.col("temp_qcflag") == 1).count()
    assert n_str == n_approved  # strict keeps only approved
    assert n_len > n_str  # lenient also keeps unchecked


def test_apply_flags_drop(multivar):
    df = add_flags(multivar, ["temp"])
    clean = apply_flags(df, "temp", drop_flags=True)
    assert "temp_qcflag" not in clean.columns
    assert clean.filter(F.col("temp").isNull()).count() == multivar.filter(F.col("temp").isNull()).count()
