"""Structured Streaming extension: the QC flag pipeline over a stream.

The reference is batch-only (SURVEY.md §2.7 — "resume" = reload RData),
so this is a pure extension (§7.2 step 9): the same flag-init and
masking expressions run unchanged on a streaming DataFrame (they are
stateless projections), and progress-style accounting becomes a
watermarked tumbling-window aggregation.

Scale design: the only stateful operator is the windowed count — state
is (window × flag) counters, bounded by the watermark horizon; no
per-row state.  Late rows beyond the watermark are dropped, matching
the usual ingestion contract.  Streaming windows are epoch-anchored
(`F.window`), NOT min(t)-anchored like the batch W1 — a stream has no
global min.  ``run_available_now`` drains a bounded source and returns
the materialized result, which is how the oracle harness compares the
streaming pipeline against batch SQL.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qctimeseries_spark.flags import add_flags
from qctimeseries_spark.schema import DEFAULT_SUFFIX, flag_col

#: events.parquet physical schema (ts is TIMESTAMP(NANOS) in the files;
#: with the nanosAsLong conf the reader surfaces it as bigint)
EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over an events.parquet snapshot.

    In production this is a directory Kafka/ingest keeps appending to;
    ``maxFilesPerTrigger`` (not set here) bounds per-batch work.  The
    ns→µs conversion mirrors ``sources.read_table``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def qc_flag_stream(
    stream: DataFrame, var: str = "value", suffix: str = DEFAULT_SUFFIX
) -> DataFrame:
    """Stateless QC flag init on a stream — same F1 semantics as batch
    (``add_flags`` emits pure projections, so it is stream-safe)."""
    return add_flags(stream, [var], suffix, time_col=None)


def windowed_flag_counts(
    flagged: DataFrame,
    time_col: str = "ts",
    *,
    var: str = "value",
    suffix: str = DEFAULT_SUFFIX,
    hours: int = 24,
    watermark: str = "1 hour",
) -> DataFrame:
    """Flag distribution per tumbling window — streaming progress.

    Watermark bounds state: windows older than max(event time) −
    watermark finalize and evict.  Works identically on batch frames
    (watermark is a no-op there), which is how it is oracle-tested.
    """
    f = flag_col(var, suffix)
    src = flagged.withWatermark(time_col, watermark) if flagged.isStreaming else flagged
    return (
        src.groupBy(
            F.window(F.col(time_col), f"{hours} hours").alias("win"),
            F.col(f),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            F.col(f),
            "n",
        )
    )


def run_available_now(result: DataFrame, *, name: str | None = None) -> DataFrame:
    """Drain a bounded stream through the aggregation and return the
    materialized result as a batch DataFrame (memory sink, complete
    mode).  For unbounded production sinks use append mode + watermark
    with a durable sink instead."""
    name = name or f"qcts_stream_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(name)


def streaming_flag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: stream → flag init → watermarked windowed counts →
    materialized table.  Oracle-compared against batch SQL with
    epoch-anchored 24 h buckets."""
    flagged = qc_flag_stream(stream_events(spark, sf_dir))
    return run_available_now(windowed_flag_counts(flagged))
