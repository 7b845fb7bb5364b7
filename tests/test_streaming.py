"""Streaming extension tests: the stream pipeline must agree with the
identical batch computation on a bounded source."""

from pyspark.sql import functions as F

from qctimeseries_spark.sources import read_table
from qctimeseries_spark.streaming import (
    qc_flag_stream,
    run_available_now,
    stream_events,
    windowed_flag_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark):
    streamed = run_available_now(
        windowed_flag_counts(qc_flag_stream(stream_events(spark, SF_DIR)))
    )
    batch_src = read_table(spark, SF_DIR, "events").withColumn(
        "value_qcflag",
        F.when(F.col("value").isNull(), -1).otherwise(0).cast("int"),
    )
    batch = windowed_flag_counts(batch_src)
    srows = {tuple(r) for r in streamed.collect()}
    brows = {tuple(r) for r in batch.collect()}
    assert srows == brows
    assert len(srows) > 0


def test_stream_is_streaming(spark):
    s = stream_events(spark, SF_DIR)
    assert s.isStreaming
    flagged = qc_flag_stream(s)
    assert "value_qcflag" in flagged.columns
