"""Persisted-state tests: partitioned layout, pruned slices, checkpoint."""

import datetime as dt

from pyspark.sql import functions as F

from qctimeseries_spark import add_flags, set_flag
from qctimeseries_spark.sources import read_table
from qctimeseries_spark.state import (
    PART_COL,
    checkpoint_state,
    load_state,
    save_state,
    slice_state,
)

SF_DIR = "/root/testdata/sf0.001"


def test_state_roundtrip_and_pruned_slice(spark, tmp_path):
    df = add_flags(
        read_table(spark, SF_DIR, "events").select("event_id", "ts", "value"),
        "value",
    )
    path = str(tmp_path / "state")
    save_state(df, path, time_col="ts", part_hours=48)
    back = load_state(spark, path)
    assert back.count() == df.count()
    assert PART_COL in back.columns

    lo, hi = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5)
    sl = slice_state(back, "ts", lo, hi, part_hours=48)
    expected = df.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    assert sl.count() == expected.count()

    # the physical plan must prune on the partition column
    plan = sl._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert PART_COL in plan.split("PartitionFilters:")[1][:200]


def test_pre_epoch_slice_not_pruned_away(spark, tmp_path):
    # save buckets with floor division; slice derives its partition
    # range with Python // (also floor).  Pre-1970 timestamps land in
    # negative buckets — a truncate/floor mismatch would prune them out.
    t0 = dt.datetime(1969, 12, 30)
    df = add_flags(
        spark.createDataFrame(
            [(i, t0 + dt.timedelta(hours=6 * i), float(i)) for i in range(20)],
            "event_id int, ts timestamp, value double",
        ),
        "value",
    )
    path = str(tmp_path / "pre_epoch")
    save_state(df, path, time_col="ts", part_hours=48)
    back = load_state(spark, path)
    lo, hi = dt.datetime(1969, 12, 31), dt.datetime(1970, 1, 2)
    sl = slice_state(back, "ts", lo, hi, part_hours=48)
    expected = df.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    assert sl.count() == expected.count() > 0


def test_checkpoint_compacts_overlays(spark, tmp_path):
    df = add_flags(
        read_table(spark, SF_DIR, "events").select("event_id", "ts", "value"),
        "value",
    )
    for k in range(5):  # stack a few U-op overlays
        df = set_flag(df, "value", -2, selection=F.col("event_id") % 50 == k)
    compacted = checkpoint_state(df, str(tmp_path / "ckpt"), time_col="ts")
    assert (
        compacted.filter(F.col("value_qcflag") == -2).count()
        == df.filter(F.col("value_qcflag") == -2).count()
    )
    # lineage is one scan deep after the checkpoint
    plan = compacted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
