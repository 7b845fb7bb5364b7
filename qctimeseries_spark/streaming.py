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

import contextlib
import os
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


@contextlib.contextmanager
def scoped_state_partitions(spark: SparkSession, n: int | None = None):
    """Scope ``spark.sql.shuffle.partitions`` down for a stateful drain
    whose per-micro-batch cost is STATE-STORE MACHINERY, not data.

    Stateful streaming pins its state partition count at the first
    micro-batch from ``spark.sql.shuffle.partitions``, and every
    micro-batch then pays store open/maintain/commit PER PARTITION —
    for a symmetric stream-stream join, per partition PER SIDE over
    four stores.  When the drain holds bounded key cardinality (the
    engine's staged drains carry ~10³-10⁴ keys), the session default
    sized for batch parallelism is pure fixed overhead: st21 measured
    16.0 s at 32 partitions vs 3.2 s at 8 on identical data (r13),
    matching the st23 precedent (17.6 s → 5.1 s, r12).

    A production deployment sizes this to state cardinality ×
    throughput (millions of hot keys want MORE partitions, not fewer)
    — hence the env override.  Emitted VALUES are partition-invariant
    (deterministic operators; every consumer and the oracle compare
    order-insensitively); only task counts change.

    ``n`` resolution order: explicit arg, ``$QCTS_STREAM_STATE_PARTITIONS``,
    default 8 — never raised ABOVE the session's configured level (a
    4-partition test session stays at 4).

    Deliberately NOT applied to Python-stateful drains
    (``applyInPandasWithState`` flows: st6/st10/st18/st22/st24/st25):
    their cost is the per-group pandas work, which wants the session's
    full parallelism — measured flat-to-worse at 8 partitions (r13
    sweep, /tmp precedent in OPTIMIZATION_r13.md).
    """
    if n is None:
        n = int(os.environ.get("QCTS_STREAM_STATE_PARTITIONS", "8"))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(min(int(n), int(old)))
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over an events.parquet snapshot.

    In production this is a directory Kafka/ingest keeps appending to;
    ``maxFilesPerTrigger`` (not set here) bounds per-batch work.  The
    epoch→µs conversion mirrors ``sources.read_table`` but must be
    scale-aware: depending on reader version the TIMESTAMP(NANOS)
    column surfaces through the explicit bigint schema as epoch-ns
    (legacy nanosAsLong) OR already µs-truncated.  Modern dates are
    ≥1e18 in ns and ~1.7e15 in µs, so a 4e17 magnitude cut (year
    ~14600 in µs, 1982 in ns — far outside any test horizon on either
    side) picks the right divisor per row with integer DIV (ns values
    exceed double's exact range; float division drifts ±1 µs).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn(
        "ts",
        F.timestamp_micros(
            F.expr("CASE WHEN abs(ts) > 400000000000000000 THEN ts DIV 1000 ELSE ts END")
        ),
    )


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


def run_available_now(
    result: DataFrame, *, name: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Drain a bounded stream through the aggregation and return the
    materialized result as a batch DataFrame (memory sink).  For
    unbounded production sinks use append mode + watermark with a
    durable sink instead."""
    name = name or f"qcts_stream_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(name)


def detect_gaps_stateful(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap_seconds: float = 86400.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key cadence monitor: emit (key, gap_start, gap_end,
    gap_seconds) whenever consecutive events for a key are more than
    ``gap_seconds`` apart — a custom STATEFUL streaming operator
    (``applyInPandasWithState``), the one QC primitive windowed aggs
    can't express because a gap spans micro-batches.

    State per key is a single int64 (last event time in epoch µs) —
    O(#keys), not O(#rows) — so state size is bounded by key
    cardinality regardless of stream length.  Rows at-or-before the
    carried timestamp (late beyond the watermark's reorder horizon)
    are dropped, making output deterministic for in-order-per-key
    streams: on such input the operator matches the batch
    ``lag() OVER (PARTITION BY key ORDER BY t)`` exactly, which is how
    it is oracle-tested.

    Extension op (§7.2 step 9) — the reference is batch-only; its
    nearest analogue is eyeballing missing stretches per window in the
    app (``R/qc_window_app.R:251-297``).
    """
    import pandas as pd  # noqa: F401 — worker-side dependency

    out_schema = (
        f"{key_col} bigint, gap_start timestamp, gap_end timestamp, "
        "gap_seconds double"
    )
    state_schema = "last_us bigint"

    def fn(key, pdf_iter, state):
        import pandas as pd

        last_us = state.get[0] if state.exists else None
        frames = []
        for pdf in pdf_iter:
            frames.append(pdf[[time_col]])
        if not frames:
            return
        ts = pd.concat(frames)[time_col].sort_values()
        # datetime64[ns or us] → epoch µs (test data is µs-precision)
        us = ts.astype("datetime64[us]").astype("int64")
        if last_us is not None:
            us = us[us > last_us]
            if len(us):
                us = pd.concat([pd.Series([last_us]), us], ignore_index=True)
        if len(us) == 0:
            return
        state.update((int(us.iloc[-1]),))
        prev = us.shift(1)
        gap_us = us - prev
        hit = gap_us > gap_seconds * 1_000_000
        if hit.any():
            yield pd.DataFrame(
                {
                    key_col: key[0],
                    "gap_start": prev[hit].astype("datetime64[us]"),
                    "gap_end": us[hit].astype("datetime64[us]"),
                    "gap_seconds": gap_us[hit] / 1_000_000.0,
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = stream.withWatermark(time_col, watermark)
    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_counts(
    src: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-merged session windows per key (``F.session_window``).

    Streaming state holds open sessions only — a session finalizes and
    evicts once the watermark passes its close, so state is O(keys
    active within the horizon).  Sessions merge while consecutive
    events are STRICTLY closer than ``gap`` (an event landing exactly
    at the window end starts a new session — ``[start, end)``).  The
    same expression runs on batch frames, and the batch lag/cumsum
    formulation with a ``gap >= threshold`` cut is the oracle.

    Append-mode semantics (pinned by
    ``test_session_windows_append_mode_evicts_on_watermark``): only
    watermark-closed sessions are emitted, open sessions stay in state
    unemitted, and a late event is dropped when its would-be session
    end is at or before the late-row horizon.  Spark tracks TWO
    watermarks — the late-row filter lags eviction by one micro-batch
    (visible as the paired timestamps on ``StateStoreSave`` in the
    plan), so an event needs two batch advances past its horizon
    before it is guaranteed dropped.
    """
    s = src.withWatermark(time_col, watermark) if src.isStreaming else src
    return (
        s.groupBy(
            F.session_window(F.col(time_col), gap).alias("sw"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n",
        )
    )


def dedup_stream(
    stream: DataFrame,
    *,
    key_cols: list[str] | None = None,
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once projection of an at-least-once stream: drop redelivered
    rows by key (``dropDuplicatesWithinWatermark``).

    The state store holds one entry per key seen within the watermark
    horizon and evicts beyond it — bounded by delivery-delay × ingest
    rate, not stream length.  This is the streaming twin of the batch
    exact-dedup tier: ingestion-time identity dedup here, content-level
    near-dup (MinHash/SimHash) downstream in batch.
    """
    key_cols = key_cols or ["event_id"]
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


#: partition-directory key for the per-batch survivor sinks.  Not
#: underscore-prefixed: Spark's file listing hides `_*` directories,
#: which would make the batches invisible to partition discovery.
_SINK_BATCH_COL = "sink_batch"


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _prepare_batch_dir(spark, out_path: str, batch_id: int) -> str | None:
    """Idempotent-per-batch sink protocol: each micro-batch writes to
    its OWN ``sink_batch=<id>/`` directory under ``out_path``.  If the
    directory is already COMMITTED (``_SUCCESS`` marker — the
    FileOutputCommitter writes it only at job commit, so its presence
    means every file of that batch's write is in place), the retry
    must not write again: return ``None``.  A directory WITHOUT the
    marker is a crashed partial write — delete it and return the
    directory path for a clean rewrite.  Net effect: the files on disk
    hold each batch's survivors exactly once no matter how often the
    at-least-once engine replays a batch, so EXTERNAL readers (DuckDB,
    another engine, plain ``read.parquet``) need no dedup-on-read
    view."""
    bdir = f"{out_path}/{_SINK_BATCH_COL}={batch_id}"
    fs, jpath = _hadoop_fs(spark, bdir)
    if fs.exists(jpath):
        _, marker = _hadoop_fs(spark, bdir + "/_SUCCESS")
        if fs.exists(marker):
            return None  # committed by a previous attempt — exact skip
        fs.delete(jpath, True)  # crashed partial write — start clean
    return bdir


def _read_survivors(
    stream: DataFrame,
    out_path: str,
    *,
    added_col: tuple | None = ("fingerprint", "long"),
) -> DataFrame:
    """Read a per-batch survivor sink back as one table.  Exactness is
    PHYSICAL (see :func:`_prepare_batch_dir`): each batch's rows are on
    disk exactly once, so this is a plain read — the only massaging is
    dropping the ``sink_batch`` partition key that Spark's partition
    discovery surfaces as a column.  A drained stream that produced
    zero batches or zero survivors has no files at ``out_path`` —
    return an empty frame with the expected schema (input columns +
    ``added_col``, the column the batch operator's sink appends)
    instead of raising."""
    from pyspark.sql.utils import AnalysisException

    spark = stream.sparkSession
    try:
        out = spark.read.parquet(out_path)
    except AnalysisException:
        schema = stream.schema
        if added_col is not None:
            schema = schema.add(*added_col)
        return spark.createDataFrame([], schema)
    return out.drop(_SINK_BATCH_COL)


def ingest_dedup_stream(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    store_table: str | None = None,
    buckets: int = 256,
) -> DataFrame:
    """Streaming CONTENT dedup against the persistent fingerprint
    store: every micro-batch runs
    :func:`~qctimeseries_spark.datapipe.dedup.dedup_against_store`
    (anti-join on the store, min-id keeper within the batch, survivors'
    fingerprints appended to the store) and appends the survivors to
    ``out_path`` — the production crawl-ingestion loop as a stream,
    completing the batch triad's streaming counterpart.

    Unlike :func:`dedup_stream` (identity dedup by key within a
    watermark horizon, state in the stream engine), the state here is
    the CONTENT fingerprint store itself — append-only Parquet shared
    with the batch operator, unbounded horizon, one anti-join per
    batch.  ``dedup_against_store`` is idempotent under replay (a
    replayed batch hits its own store rows and drops entirely), so the
    at-least-once ``foreachBatch`` contract upgrades to effective
    exactly-once for the STORE — and the survivor sink is PHYSICALLY
    exactly-once: each batch writes its own committed
    ``sink_batch=<id>/`` directory (:func:`_prepare_batch_dir`), a
    retry either skips a committed directory or cleanly rewrites a
    crashed partial one, and the batch operator writes the sink BEFORE
    the store so a retry that died in between recomputes identical
    survivors against the unchanged store (never a loss).  The files
    on disk therefore hold every survivor exactly once — an external
    reader (DuckDB, another engine) sees no duplicates without any
    dedup-on-read view.

    Drains bounded sources with ``trigger(availableNow)`` and returns
    the survivor table ``(input columns + fingerprint)`` — empty with
    that schema if the stream produced no batches or no survivors.
    Scale: per-batch cost is one batch×store anti-join — at 100 TB
    pass ``store_table`` so the store is a fingerprint-BUCKETED
    catalog table and each batch's anti-join shuffles only the batch,
    never the store (see the batch operator's docstring); history is
    never recomputed.
    """
    import uuid as _uuid

    from qctimeseries_spark.datapipe.dedup import dedup_against_store

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        bdir = _prepare_batch_dir(batch.sparkSession, out_path, batch_id)
        dedup_against_store(
            batch, store_path, id_col=id_col, text_col=text_col,
            sink_path=bdir, store_table=store_table, buckets=buckets,
        )

    checkpoint_dir = (
        checkpoint_dir or f"/tmp/qcts_ingest_ckpt_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_survivors(stream, out_path)


def ingest_neardup_stream(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 8,
    ngram: int = 3,
    threshold: float = 0.7,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Streaming NEAR-dup ingestion against the persistent signature
    store: the lexical twin of :func:`ingest_dedup_stream` — every
    micro-batch runs
    :func:`~qctimeseries_spark.datapipe.dedup.neardup_against_store`
    (exact anti-join tier, banded batch×store candidate join, shingle
    Jaccard verify, survivors' signatures appended), so boilerplate
    drift and mirror banners that sail past an exact-fingerprint store
    drop in-stream.

    Same idempotence shape as the exact twin: a replayed batch hits
    the exact tier against its own store rows and drops entirely, so
    the store converges under at-least-once delivery — and the
    survivor sink uses the same physically-exactly-once per-batch
    directory protocol (committed ``sink_batch=<id>/`` dirs, sink
    write before store write inside the batch operator), so a
    mid-batch retry can neither double-count nor lose survivors and
    external readers see duplicate-free files.  Per-batch cost is the
    batch-sized signature stage plus
    two store joins that read the bucketed ``docs/`` + ``bands/``
    layout — history is never re-signed.  Drains bounded sources with
    ``trigger(availableNow)`` and returns the survivor table — empty
    with the expected schema if the stream produced no batches or no
    survivors.
    """
    import uuid as _uuid

    from qctimeseries_spark.datapipe.dedup import neardup_against_store

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        bdir = _prepare_batch_dir(batch.sparkSession, out_path, batch_id)
        neardup_against_store(
            batch, store_path, id_col=id_col, text_col=text_col,
            k=k, bands=bands, ngram=ngram, threshold=threshold,
            sink_path=bdir,
        )

    checkpoint_dir = (
        checkpoint_dir or f"/tmp/qcts_neardup_ckpt_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_survivors(stream, out_path)


def ingest_embedding_stream(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.98,
    nprobe: int = 3,
    max_store_brute: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Streaming SEMANTIC dedup against the persistent unit-vector
    store — the third member of the streaming ingestion triad
    (:func:`ingest_dedup_stream` exact, :func:`ingest_neardup_stream`
    lexical, this one embedding-space): every micro-batch runs
    :func:`~qctimeseries_spark.datapipe.dedup.embedding_dedup_against_store`
    (max store cosine per row, drop at ≥ ``threshold``, survivors'
    unit vectors appended), so re-encodes and paraphrases sharing no
    surface text drop in-stream.

    Same replay shape as the twins: a batch replayed against its own
    store output is a no-op (every vector matches itself at cosine
    1.0), so the store converges under at-least-once delivery; the
    survivor sink uses the physically-exactly-once per-batch
    directory protocol (committed ``sink_batch=<id>/`` dirs, sink
    write before store append inside the batch operator), closing the
    mid-batch-retry double-append hole on disk, not just through the
    API.  Per-batch cost is the
    broadcast or IVF store-scoring tier — history vectors are never
    re-normalized.  Drains bounded sources with
    ``trigger(availableNow)`` and returns the survivor table
    ``(input columns + max_store_cos)`` — empty with that schema if
    the stream produced no batches or no survivors.
    """
    import uuid as _uuid

    from qctimeseries_spark.datapipe.dedup import (
        embedding_dedup_against_store,
    )

    kw = {} if max_store_brute is None else {
        "max_store_brute": max_store_brute
    }

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        bdir = _prepare_batch_dir(batch.sparkSession, out_path, batch_id)
        embedding_dedup_against_store(
            batch, store_path, id_col=id_col, vec_col=vec_col,
            threshold=threshold, nprobe=nprobe, sink_path=bdir, **kw,
        )

    checkpoint_dir = (
        checkpoint_dir or f"/tmp/qcts_embing_ckpt_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_survivors(
        stream, out_path, added_col=("max_store_cos", "double"),
    )


def knn_serve_stream(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    *,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nprobe: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Online ANN serving: a stream of query vectors answered against
    a PERSISTED :func:`~qctimeseries_spark.datapipe.similarity.build_ivf_index`
    store — the production build-once/serve-many pattern as a stream.
    Each micro-batch runs
    :func:`~qctimeseries_spark.datapipe.similarity.knn_query_index`:
    the batch expands to its ``nprobe`` cells and the broadcast probe
    join restricts the ``cells/`` scan to exactly the probed
    directories (dynamic partition pruning), so per-batch cost scales
    with ``nprobe/nlist`` of the store and the corpus side is never
    recomputed — the index is shared, immutable state.

    Results land in per-batch committed ``sink_batch=<id>/``
    directories under ``out_path`` (:func:`_prepare_batch_dir`): a
    replayed batch whose directory is already committed skips the
    recompute entirely, and a crashed partial directory is rewritten
    clean — so the files on disk are exact under at-least-once
    delivery with no dedup-on-read, and a query id that appears in
    several stream batches keeps each batch's answer (they live in
    different batch directories).  Returns the drained ``(query_id,
    neighbor_id, cos, rank)`` table — empty with that schema if the
    stream produced no batches.
    """
    import uuid as _uuid

    from pyspark.sql.utils import AnalysisException

    from qctimeseries_spark.datapipe.similarity import knn_query_index

    def _serve(batch: DataFrame, batch_id: int) -> None:
        bdir = _prepare_batch_dir(batch.sparkSession, out_path, batch_id)
        if bdir is None:  # committed by a previous attempt
            return
        knn_query_index(
            batch.sparkSession, index_path, batch,
            vec_col=vec_col, query_id_col=query_id_col,
            k=k, nprobe=nprobe,
        ).write.mode("append").parquet(bdir)

    checkpoint_dir = (
        checkpoint_dir or f"/tmp/qcts_serve_ckpt_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        stream.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream.sparkSession
    try:
        out = spark.read.parquet(out_path)
    except AnalysisException:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, cos double, rank int"
        )
    return out.drop(_SINK_BATCH_COL)


def stream_to_state(
    flagged: DataFrame,
    path: str,
    *,
    key_col: str = "event_id",
    time_col: str = "ts",
    part_hours: int = 720,
    checkpoint_dir: str | None = None,
) -> "StreamingQuery":  # noqa: F821 — pyspark.sql.streaming type
    """Maintain the persisted QC state table from a stream — the MERGE
    sink tying streaming ingestion to the interactive/batch state
    format.

    Every micro-batch is upserted by key via ``foreachBatch``: the
    batch's time bounds select the touched ``qc_part`` partitions; the
    survivors of those partitions (anti-join on ``key_col``) are
    unioned with the batch and rewritten through the same dynamic
    partition overwrite the interactive session's incremental
    checkpoint uses (:func:`~qctimeseries_spark.state.commit_state`).
    Work per batch scales with the touched partitions, never the table.
    Re-delivered rows update in place (last write wins per key), so a
    replayed micro-batch converges to the same state — idempotent per
    the foreachBatch exactly-once contract.

    Bounded sources drain with ``trigger(availableNow)``; production
    streams run continuously.
    """
    import os as _os
    import uuid as _uuid

    from qctimeseries_spark.state import PART_COL, commit_state, load_state

    def upsert(batch: DataFrame, batch_id: int) -> None:
        bounds = batch.agg(
            F.min(time_col).alias("lo"), F.max(time_col).alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return  # empty batch
        changed = [(bounds["lo"], bounds["hi"])]
        merged = batch
        if _os.path.isdir(path):
            from qctimeseries_spark.state import slice_state

            existing = slice_state(
                load_state(batch.sparkSession, path),
                time_col,
                bounds["lo"],
                bounds["hi"],
                part_hours=part_hours,
                whole_partitions=True,
            ).drop(PART_COL)
            keep = existing.join(
                batch.select(key_col), key_col, "left_anti"
            )
            # materialize BEFORE the overwrite: the plan reads the very
            # files the commit replaces, and a task retry after commit
            # would otherwise re-read deleted files.  (A table format
            # with transactional MERGE — Delta/Iceberg — replaces this
            # whole dance in production.)
            merged = keep.unionByName(batch).localCheckpoint(eager=True)
        commit_state(
            merged, path,
            time_col=time_col, part_hours=part_hours, changed=changed,
        )

    checkpoint_dir = checkpoint_dir or f"/tmp/qcts_stream_ckpt_{_uuid.uuid4().hex[:8]}"
    return (
        flagged.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_flag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: stream → flag init → watermarked windowed counts →
    materialized table.  Oracle-compared against batch SQL with
    epoch-anchored 24 h buckets."""
    flagged = qc_flag_stream(stream_events(spark, sf_dir))
    return run_available_now(windowed_flag_counts(flagged))


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    stream without any stream-side shuffle.

    Structured Streaming joins the static side fresh each micro-batch
    (a file-backed dimension picks up updates between batches); with
    ``broadcast_dim`` the dimension ships to the executors and the join
    is map-side — the stream partitioning is untouched, so this
    composes freely before watermarked aggregations or stateful ops.
    Use ``broadcast_dim=False`` only for dimensions too large to
    broadcast (the planner then shuffle-partitions each micro-batch).

    Default ``how='left'`` keeps stream rows with no dimension match
    (nulls), preserving stream row counts — the usual ingestion
    contract.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def asof_enrich_stream(
    stream: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-safe as-of enrichment: each stream row gains the payload
    of the most recent ``right`` record with ``right.on <= row.on``
    (optionally per ``by`` key) — "the calibration in effect at each
    event", continuously.

    The batch :func:`~qctimeseries_spark.joins.asof_join` union+carry
    plan needs a global sort per key, which Structured Streaming
    cannot express incrementally.  But the static side here is a
    calibration/config table — small by nature — so each (key's)
    record list is collected into ONE time-sorted array, broadcast,
    and resolved per stream row with a pure projection:
    ``try_element_at(filter(arr, c -> c.t <= on), -1)``.  Stateless and
    shuffle-free on the stream side, so it composes before watermarked
    aggregations; the static side re-resolves every micro-batch, so a
    file-backed calibration table picks up new records between
    batches.

    Bounds: per-key right-side record lists must fit an array column
    (thousands, not millions — far beyond any calibration cadence).
    For a genuinely large right side, run the batch ``asof_join``
    inside ``foreachBatch`` instead.  Works identically on a batch
    left frame, which is how the DuckDB ``ASOF JOIN`` oracle checks
    it.  NULL ``on`` stream rows come back with NULL payload (left
    rows always preserved), matching the batch operator's contract.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in right.columns if c != on and c not in by]
    overlap = set(payload) & set(stream.columns)
    if overlap:
        raise ValueError(
            f"right payload columns {sorted(overlap)} collide with left;"
            f" rename or rely on right_prefix before joining"
        )
    rec = F.struct(F.col(on).alias("_t"), *[F.col(c) for c in payload])
    if by:
        arrs = right.groupBy(*by).agg(
            F.array_sort(F.collect_list(rec)).alias("_cal")
        )
        joined = stream.join(F.broadcast(arrs), by, "left")
    else:
        arr = right.agg(F.array_sort(F.collect_list(rec)).alias("_cal"))
        joined = stream.crossJoin(F.broadcast(arr))
    t = F.col(on)
    # try_element_at: a row before any right record filters to an empty
    # array, which must yield NULL, not an ANSI index error
    hit = F.try_element_at(
        F.filter(F.col("_cal"), lambda c: c["_t"] <= t), F.lit(-1)
    )
    return joined.select(
        *stream.columns,
        hit["_t"].alias(f"{right_prefix}{on}"),
        *[hit[c].alias(f"{right_prefix}{c}") for c in payload],
    )


def detect_anomalies_stateful(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    z: float = 3.0,
    min_n: int = 10,
    watermark: str = "1 hour",
    scale: float = 100.0,
) -> DataFrame:
    """Per-key streaming anomaly detector: emit events whose value sits
    more than ``z`` sample deviations from the EXPANDING mean/std of
    that key's strictly-prior observations — the streaming counterpart
    of the batch rolling z-score (:func:`~qctimeseries_spark.windows.
    flag_outlier_candidates`), as a custom stateful operator because
    the expanding window spans micro-batches.

    State per key is four scalars — prior count, exact INTEGER sums of
    the 2-dp-quantized values and their squares, and the last event
    time — O(#keys) like the gap detector; per-batch work is a
    vectorized prefix-cumsum, no per-row Python.  NULL values neither
    update state nor emit.  Integer accumulation is what makes the
    operator bit-reproducible across engines: float running sums
    disagree with any other engine's summation order in the last ulp,
    which flips rounding at decision boundaries; exact integer sums
    fed through the SAME double expression give bit-identical
    mean/std everywhere (the DuckDB oracle mirrors the expression
    verbatim), so no tolerance or rounding is needed at all.
    ``scale`` is the decimal quantization (100 = 2 dp data); Σv² in
    int64 bounds per-key history to ~2⁶³/(scale·max|v|)² rows.  Rows
    at-or-before the carried timestamp are dropped, so for
    in-order-per-key streams the output matches the batch
    expanding-window SQL exactly.
    """
    import pandas as pd  # noqa: F401 — worker-side dependency

    out_schema = (
        f"{key_col} bigint, {time_col} timestamp, {value_col} double, "
        "n_prior bigint, exp_mean double, exp_std double"
    )
    state_schema = "n bigint, s bigint, s2 bigint, last_us bigint"

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        n0, s0, s20, last_us = (
            state.get if state.exists else (0, 0, 0, None)
        )
        frames = [pdf[[time_col, value_col]] for pdf in pdf_iter]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(time_col)
        pdf = pdf[pdf[value_col].notna()]
        us = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        if last_us is not None:
            keep = us > last_us
            pdf, us = pdf[keep], us[keep]
        if len(pdf) == 0:
            return
        v = pdf[value_col].to_numpy(dtype="float64")
        vi = np.rint(v * scale).astype("int64")
        # prior-prefix sums: state + cumsum of earlier in-batch rows
        cn = n0 + np.arange(len(v), dtype="int64")
        cs = s0 + np.concatenate([[0], np.cumsum(vi)[:-1]])
        cs2 = s20 + np.concatenate([[0], np.cumsum(vi * vi)[:-1]])
        state.update(
            (
                int(n0 + len(v)),
                int(s0 + vi.sum()),
                int(s20 + (vi * vi).sum()),
                int(us[-1]),
            )
        )
        nd = cn.astype("float64")
        sd = cs.astype("float64")
        s2d = cs2.astype("float64")
        with np.errstate(invalid="ignore", divide="ignore"):
            # expression shape mirrored VERBATIM by the SQL oracle —
            # identical operands + identical IEEE ops = identical bits
            mean = sd / nd / scale
            var = (nd * s2d - sd * sd) / (nd * (nd - 1.0) * (scale * scale))
        std = np.sqrt(np.maximum(var, 0.0))
        hit = (cn >= min_n) & (std > 0) & (np.abs(v - mean) > z * std)
        if hit.any():
            yield pd.DataFrame(
                {
                    key_col: key[0],
                    time_col: pdf[time_col].to_numpy()[hit],
                    value_col: v[hit],
                    "n_prior": cn[hit],
                    "exp_mean": mean[hit],
                    "exp_std": std[hit],
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = stream.withWatermark(time_col, watermark)
    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_funnel(
    stream: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    horizon_seconds: float | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of :func:`qctimeseries_spark.events.funnel`:
    emit one row per (user, stage CONVERSION) the moment it happens —
    stage k converts on the first ``stages[k]``-typed event STRICTLY
    after the user's stage-k−1 conversion (optionally within
    ``horizon_seconds`` of it).  The batch funnel's counts are a
    trivial aggregation of this row stream.

    State per user is THREE scalars — next awaited stage index, the
    previous conversion's µs, and the last processed µs — O(#users),
    independent of stream length; per-batch work loops over STAGES
    (a handful), not rows (each stage conversion is one vectorized
    first-match scan).  Rows strictly BEFORE the carried per-user
    timestamp are dropped (the expanding-window operators' in-order
    contract); rows AT the carried microsecond are admitted, so
    distinct equal-timestamp events split across micro-batches count
    exactly as the batch funnel counts them (r11 advisor — the
    contract therefore also assumes exactly-once row delivery: a
    REDELIVERED copy of an already-processed equal-timestamp row is
    indistinguishable from a new one).  With that, for per-user
    in-order streams the drained output equals the batch funnel's
    per-user stage times exactly — which is how the DuckDB oracle
    checks it.  Non-stage event types and NULL-user rows are
    discarded before touching state (the batch twin drops NULL
    users too — no per-user semantic pools them).
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    if len(set(stages)) != len(stages):
        raise ValueError(f"funnel stages must be distinct, got {stages}")
    import pandas as pd  # noqa: F401 — worker-side dependency

    horizon_us = (
        int(round(horizon_seconds * 1_000_000))
        if horizon_seconds is not None
        else None
    )
    user_dt = stream.schema[user_col].dataType.simpleString()
    out_schema = (
        f"{user_col} {user_dt}, stage_idx int, stage string,"
        f" {time_col} timestamp"
    )
    state_schema = "stage_idx int, t_prev bigint, last_us bigint"

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        stage_idx, t_prev, last_us = (
            state.get if state.exists else (0, None, None)
        )
        frames = [pdf[[time_col, type_col]] for pdf in pdf_iter]
        if not frames:
            return
        pdf = pd.concat(frames)
        # NULL timestamps / non-stage types are pruned JVM-side before
        # the shuffle (see the src filter below) — nothing to re-drop.
        pdf = pdf.sort_values(time_col, kind="stable")
        us = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        types = pdf[type_col].to_numpy()
        if last_us is not None:
            # >= not >: a DISTINCT event at exactly the last processed
            # microsecond arriving in a later micro-batch must still
            # count (the batch twin only requires strictly-after
            # t_prev, the conversion time — not after last_us).
            keep = us >= last_us
            us, types = us[keep], types[keep]
        if len(us) == 0:
            return
        out_rows = []
        while stage_idx < len(stages):
            mask = types == stages[stage_idx]
            if t_prev is not None:
                mask &= us > t_prev
                if horizon_us is not None and stage_idx > 0:
                    mask &= us <= t_prev + horizon_us
            hit = np.flatnonzero(mask)
            if len(hit) == 0:
                break
            t_conv = int(us[hit[0]])
            out_rows.append((stage_idx, stages[stage_idx], t_conv))
            t_prev = t_conv
            stage_idx += 1
        state.update((int(stage_idx), t_prev, int(us[-1])))
        if out_rows:
            yield pd.DataFrame(
                {
                    user_col: key[0],
                    "stage_idx": [r[0] for r in out_rows],
                    "stage": [r[1] for r in out_rows],
                    time_col: pd.to_datetime(
                        [r[2] for r in out_rows], unit="us"
                    ),
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    # guide §4.1/§2.3: non-stage types and NULL timestamps used to
    # drop in pandas INSIDE the stateful fn — after paying the
    # user-key shuffle and the Arrow boundary.  The identical
    # predicates as JVM filters prune before both and push to the
    # source scan (NULL timestamps never convert in the batch twin —
    # r11 reviewer — and rows of other types never touched state), so
    # admitted rows, state evolution and output are unchanged.
    src = stream.filter(
        F.col(user_col).isNotNull()
        & F.col(type_col).isin(stages)
        & F.col(time_col).isNotNull()
    ).withWatermark(time_col, watermark)
    return src.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _tie_state(stream: DataFrame, tie_col: str):
    """State dtype + Python caster for a ``tie_col`` carried in
    bounded stream state.  The tie orders equal-µs events, so it must
    be exactly comparable: integral types carry as ``bigint``,
    strings as ``string`` (lexicographic, matching the batch sort).
    Anything else (float ties are not exact, timestamps belong in the
    time column) is rejected up front instead of failing inside the
    stateful fn at runtime (r12 advisor: the state schema used to
    hardcode bigint while the OUTPUT schema derived the dtype
    dynamically, so a string tie passed construction and died in the
    worker)."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    dt = stream.schema[tie_col].dataType
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return "bigint", int
    if isinstance(dt, StringType):
        return "string", str
    raise ValueError(
        f"tie_col {tie_col!r} must be an integral or string column "
        f"(exact, totally ordered); got {dt.simpleString()}"
    )


def stream_transitions(
    stream: DataFrame,
    *,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of :func:`qctimeseries_spark.events.
    event_transitions`: emit one row per CONSECUTIVE per-user event
    pair — ``(user, from_type, to_type, to-event time, to-event
    tie)`` — the moment the successor event arrives.  The batch
    operator's (from → to) counts are a trivial aggregation of this
    row stream, which is how the oracle checks it.

    State per user is THREE scalars — the previous event's type, µs,
    and ``tie_col`` value — O(#users), independent of stream length;
    per-batch work is one vectorized sort + shift, no per-row Python.

    In-order contract (lexicographic on ``(µs, tie)``, the batch
    twin's sort key): within a batch rows sort locally, and rows at
    or before the carried per-user ``(µs, tie)`` position are
    DROPPED — so a REDELIVERED copy of the last processed event
    deduplicates for free (equal position), while a distinct new
    event at the same microsecond (strictly greater tie) still
    counts.  A late row that would have sorted BEFORE the carried
    position is out-of-order delivery and is discarded; the batch
    twin would have paired it differently, which no bounded-state
    stream can reproduce.  ``tie_col`` must be unique per user and
    monotone-comparable (an event id).

    NULL user / time / type / tie rows drop before touching state
    (mirrors the batch twin's filter).
    """
    import pandas as pd  # noqa: F401 — worker-side dependency

    user_dt = stream.schema[user_col].dataType.simpleString()
    tie_dt = stream.schema[tie_col].dataType.simpleString()
    tie_state_dt, tie_cast = _tie_state(stream, tie_col)
    out_schema = (
        f"{user_col} {user_dt}, from_type string, to_type string,"
        f" {time_col} timestamp, {tie_col} {tie_dt}"
    )
    state_schema = (
        f"last_type string, last_us bigint, last_tie {tie_state_dt}"
    )

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        last_type, last_us, last_tie = (
            state.get if state.exists else (None, None, None)
        )
        frames = [pdf[[time_col, type_col, tie_col]] for pdf in pdf_iter]
        if not frames:
            return
        pdf = pd.concat(frames)
        pdf = pdf.sort_values([time_col, tie_col], kind="stable")
        us = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        ties = pdf[tie_col].to_numpy()
        types = pdf[type_col].to_numpy()
        if last_us is not None:
            keep = (us > last_us) | ((us == last_us) & (ties > last_tie))
            us, ties, types = us[keep], ties[keep], types[keep]
        if len(us) == 0:
            return
        if last_type is not None:
            from_types = np.concatenate(([last_type], types[:-1]))
            to_idx = slice(None)
        else:
            from_types = types[:-1]
            to_idx = slice(1, None)
        state.update((str(types[-1]), int(us[-1]), tie_cast(ties[-1])))
        if len(from_types) == 0:
            return
        yield pd.DataFrame(
            {
                user_col: key[0],
                "from_type": from_types,
                "to_type": types[to_idx],
                time_col: pd.to_datetime(us[to_idx], unit="us"),
                tie_col: ties[to_idx],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    # guide §4.1/§2.3: the NULL drops ran in pandas INSIDE the stateful
    # fn — every dropped row still crossed the user-key shuffle and the
    # Arrow boundary.  The same predicates as JVM filters prune before
    # both (and reach the source scan); admitted rows are identical, so
    # the state evolution and output are unchanged row-for-row.
    src = stream.filter(
        F.col(user_col).isNotNull()
        & F.col(type_col).isNotNull()
        & F.col(time_col).isNotNull()
        & F.col(tie_col).isNotNull()
    ).withWatermark(time_col, watermark)
    return src.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_attribution(
    stream: DataFrame,
    *,
    conversion_type: str,
    touch_types: list[str],
    lookback_seconds: float | None = None,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of :func:`qctimeseries_spark.events.attribution`
    (LAST-touch only): emit one row per CONVERSION event the moment it
    arrives, crediting the user's most recent ``touch_types`` event
    strictly earlier in µs (within the optional lookback), or a
    NULL-touch row when none qualifies.  First-touch-within-lookback
    is deliberately NOT offered here: under a sliding lookback it
    needs every touch in the window buffered per user (unbounded
    state), which is exactly what this operator refuses to hold —
    run the batch operator for first-touch reports.

    State per user is SIX scalars: the latest touch (type, µs), the
    latest touch at a STRICTLY EARLIER µs (type, µs), and the last
    processed (µs, tie).  The penultimate-distinct-µs touch is the
    subtle one — a conversion arriving in a later batch at EXACTLY
    the carried touch's microsecond must skip it (same-µs touches
    never attribute) and credit the previous distinct-µs touch, which
    a single carried touch cannot answer.  Two suffice: admitted rows
    are never earlier than the last processed µs, so no future
    conversion can need anything older.  O(#users) state, per-batch
    work one vectorized sort + two searchsorted calls.

    Same (µs, tie) in-order admission contract as
    :func:`stream_transitions` (redelivered last event dedups free);
    rows whose type is neither the conversion nor a touch never touch
    state (they cannot matter — mirrors the batch operator's
    scan-pruning pre-filter).  NULL user / time / tie rows drop.
    """
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if conversion_type in touch_types:
        raise ValueError(
            "conversion_type cannot also be a touch type "
            f"({conversion_type!r} would attribute to itself)"
        )
    lookback_us = (
        int(round(lookback_seconds * 1_000_000))
        if lookback_seconds is not None
        else None
    )
    if lookback_us is not None and lookback_us <= 0:
        raise ValueError("lookback_seconds must be positive")
    import pandas as pd  # noqa: F401 — worker-side dependency

    user_dt = stream.schema[user_col].dataType.simpleString()
    tie_dt = stream.schema[tie_col].dataType.simpleString()
    tie_state_dt, tie_cast = _tie_state(stream, tie_col)
    out_schema = (
        f"{user_col} {user_dt}, {tie_col} {tie_dt},"
        " conv_ts timestamp, touch_type string,"
        " touch_ts timestamp, lag_us bigint"
    )
    state_schema = (
        "t2_type string, t2_us bigint, p_type string, p_us bigint,"
        f" last_us bigint, last_tie {tie_state_dt}"
    )
    relevant = [conversion_type, *touch_types]

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        t2_type, t2_us, p_type, p_us, last_us, last_tie = (
            state.get if state.exists else (None,) * 6
        )
        frames = [pdf[[time_col, type_col, tie_col]] for pdf in pdf_iter]
        if not frames:
            return
        pdf = pd.concat(frames)
        pdf = pdf.sort_values([time_col, tie_col], kind="stable")
        us = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        ties = pdf[tie_col].to_numpy()
        types = pdf[type_col].to_numpy()
        if last_us is not None:
            keep = (us > last_us) | ((us == last_us) & (ties > last_tie))
            us, ties, types = us[keep], ties[keep], types[keep]
        if len(us) == 0:
            return
        is_touch = types != conversion_type
        # carried touches prepend in order: p strictly precedes t2,
        # and every admitted row is >= last_us >= t2_us
        pre_us = [u for u in (p_us, t2_us) if u is not None]
        pre_ty = [t for u, t in ((p_us, p_type), (t2_us, t2_type))
                  if u is not None]
        all_t_us = np.concatenate([
            np.asarray(pre_us, dtype=np.int64), us[is_touch]
        ])
        all_t_ty = np.concatenate([
            np.asarray(pre_ty, dtype=object),
            types[is_touch].astype(object),
        ])
        # new state first (the emit below cannot fail the update)
        new_last_us, new_last_tie = int(us[-1]), tie_cast(ties[-1])
        if len(all_t_us):
            n_t2_us, n_t2_ty = int(all_t_us[-1]), str(all_t_ty[-1])
            q = int(np.searchsorted(all_t_us, n_t2_us, side="left")) - 1
            n_p_us, n_p_ty = (
                (int(all_t_us[q]), str(all_t_ty[q])) if q >= 0
                else (None, None)
            )
        else:
            n_t2_us, n_t2_ty, n_p_us, n_p_ty = t2_us, t2_type, p_us, p_type
        state.update(
            (n_t2_ty, n_t2_us, n_p_ty, n_p_us, new_last_us, new_last_tie)
        )
        is_conv = ~is_touch
        if not is_conv.any():
            return
        c_us, c_tie = us[is_conv], ties[is_conv]
        n = len(c_us)
        if len(all_t_us):
            # last touch strictly earlier in µs: the final array
            # element below the conversion's µs (among equal-µs
            # touches the later element is the (µs, tie) max — the
            # batch election)
            pos = np.searchsorted(all_t_us, c_us, side="left") - 1
            valid = pos >= 0
            safe = np.maximum(pos, 0)
            t_us_hit = all_t_us[safe]
            if lookback_us is not None:
                valid &= t_us_hit >= c_us - lookback_us
            t_ty_hit = all_t_ty[safe]
        else:
            valid = np.zeros(n, dtype=bool)
            t_us_hit = np.zeros(n, dtype=np.int64)
            t_ty_hit = np.full(n, None, dtype=object)
        touch_ts = pd.Series(pd.to_datetime(t_us_hit, unit="us"))
        touch_ts[~valid] = pd.NaT
        lag = pd.Series(
            pd.array(c_us - t_us_hit, dtype="Int64")
        )
        lag[~valid] = pd.NA
        yield pd.DataFrame(
            {
                user_col: key[0],
                tie_col: c_tie,
                "conv_ts": pd.to_datetime(c_us, unit="us"),
                "touch_type": np.where(valid, t_ty_hit, None),
                "touch_ts": touch_ts,
                "lag_us": lag,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    # guide §4.1/§2.3: the relevance + NULL pruning ran in pandas
    # INSIDE the stateful fn — every irrelevant-type row (at 100 TB,
    # most of the stream) still crossed the user-key shuffle and the
    # Arrow boundary.  The identical predicates as JVM filters prune
    # before both and push to the source scan; rows of other types
    # never touched state anyway (the batch twin's scan-pruning
    # pre-filter), so admitted rows — hence state evolution and
    # output — are unchanged row-for-row.
    src = stream.filter(
        F.col(user_col).isNotNull()
        & F.col(type_col).isin(relevant)
        & F.col(time_col).isNotNull()
        & F.col(tie_col).isNotNull()
    ).withWatermark(time_col, watermark)
    return src.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessions(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization on the ENGINE's native
    ``session_window`` — the stateful twin of
    :func:`~qctimeseries_spark.windows.sessionize` (t1), and the one
    stateful built-in the streaming tier didn't yet exercise: Spark
    maintains the per-key merging-session state itself (gap-merge,
    state store, eviction), so unlike the applyInPandasWithState
    operators there is NO Python in the loop — the whole pipeline is
    JVM-side.

    Semantics (pinned by the oracle and by
    ``test_stream_sessions_native_session_window``): a session
    extends while the next event arrives AT OR inside
    ``last_event + gap`` — the merge boundary is INCLUSIVE, measured
    against the engine (an event at exactly ``last+gap`` extends the
    session).  Each finalized session emits
    ``(key, session_start = first event, session_end = last event +
    gap, first_ts, last_ts, n_events)``.  Append mode finalizes a
    session once the watermark passes its ``session_end`` — sessions
    still open (or inside the reorder horizon) at drain time stay in
    state, exactly the production emission contract, and the oracle
    mirrors that horizon (the st7 precedent: closed-bucket filter
    ``end <= max event time − watermark``).

    State per key is one open session (two timestamps + a count) per
    gap-separated burst — O(#active sessions), never O(#rows); the
    watermark bounds how long a quiet session lingers before it
    finalizes.
    """
    gap_s = int(round(gap_minutes * 60))
    if gap_s <= 0 or abs(gap_minutes * 60 - gap_s) > 1e-9:
        raise ValueError("gap_minutes must be a positive whole-second gap")
    src = (
        stream.withWatermark(time_col, watermark)
        if stream.isStreaming
        else stream
    )
    return (
        src.groupBy(
            F.col(key_col),
            F.session_window(
                F.col(time_col), f"INTERVAL {gap_s} SECONDS"
            ).alias("_sw"),
        )
        .agg(
            F.min(time_col).alias("first_ts"),
            F.max(time_col).alias("last_ts"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select(
            key_col,
            F.col("_sw.start").alias("session_start"),
            F.col("_sw.end").alias("session_end"),
            "first_ts",
            "last_ts",
            "n_events",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str | list[str],
    left_time: str = "ts",
    right_time: str | None = None,
    lookback_seconds: float = 3600.0,
    lookahead_seconds: float = 0.0,
    watermark: str = "1 hour",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked stream-STREAM join — the symmetric stateful join
    Structured Streaming is built around, and the one stateful
    built-in the streaming tier didn't yet exercise: both sides buffer
    in the state store and match as counterparts ARRIVE, in either
    order, across micro-batches.

    Each left row matches right rows with equal ``by`` keys whose time
    lies in ``[left_time − lookback, left_time + lookahead]`` (bounds
    inclusive, exact integer µs).  Every right column comes back
    prefixed with ``right_prefix`` (the as-of contract), so the sides
    need no upfront renaming.

    Scale contract: the time-range condition is expressed directly on
    the raw EVENT-TIME columns with interval literals — that exact
    shape is what lets Spark derive per-side state watermarks and
    EVICT buffered rows once they can no longer match (a condition
    routed through ``unix_micros`` would join correctly but hold state
    forever).  State per side is bounded by watermark + range span ×
    arrival rate, independent of stream length.

    ``how='inner'`` emits matches as they form (append mode);
    ``how='left_outer'`` additionally emits unmatched left rows with
    NULL payload once the watermark proves no counterpart can arrive.
    Works identically on batch frames (watermarks are no-ops there),
    which is how the DuckDB range-join oracle checks it.

    Measured timing contracts (Spark 4.1.2, pinned by the staged-batch
    pytests): (1) within a micro-batch, input matches against buffered
    state BEFORE cleanup runs, and the query watermark lags a batch —
    so a late row is only provably dropped when it arrives ≥2 batches
    after the advancing events; (2) the query watermark is the MIN
    over BOTH sides' watermark nodes (multipleWatermarkPolicy=min), so
    left_outer NULL finalization needs event time advancing on the
    RIGHT side too — a quiet right stream holds every unmatched left
    row in state indefinitely.  The operational guard is
    :func:`heartbeat_stream`: union a sentinel-keyed wall-clock
    heartbeat onto the quiet side to keep its watermark advancing
    (sentinel, not NULL — NULL keys are constraint-filtered below the
    watermark node and never count; both behaviors staged-pinned).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    by = [by] if isinstance(by, str) else list(by)
    if not by:
        raise ValueError(
            "stream_stream_join requires at least one equality key: a"
            " pure time-range stream join buffers every row against"
            " every other and cannot be keyed-state-partitioned"
        )
    right_time = right_time or left_time
    lb_us = int(round(lookback_seconds * 1_000_000))
    la_us = int(round(lookahead_seconds * 1_000_000))
    r = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    l = (
        left.withWatermark(left_time, watermark)
        if left.isStreaming
        else left
    )
    rt_name = f"{right_prefix}{right_time}"
    r = r.withWatermark(rt_name, watermark) if r.isStreaming else r
    cond = F.expr(
        f"`{rt_name}` >= `{left_time}` - INTERVAL {lb_us} MICROSECOND"
    ) & F.expr(
        f"`{rt_name}` <= `{left_time}` + INTERVAL {la_us} MICROSECOND"
    )
    for b in by:
        cond = cond & (F.col(b) == F.col(f"{right_prefix}{b}"))
    return l.join(r, cond, "leftOuter" if how == "left_outer" else "inner")


def _heartbeat_projection(template: DataFrame, time_col: str,
                          delay_seconds: float,
                          key_values: dict) -> list:
    """The heartbeat row shape: ``time_col`` from the source's
    ``timestamp`` minus the skew allowance, the join keys pinned to
    their SENTINEL literals, every other template column NULL (of the
    template's type).  Split out so the staged pytests can apply the
    exact same projection to a deterministic file source instead of
    the wall-clock rate source."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if time_col not in template.columns:
        raise ValueError(f"time column {time_col!r} not in template"
                         f" columns {template.columns}")
    dt = template.schema[time_col].dataType
    if not isinstance(dt, (TimestampType, TimestampNTZType)):
        raise TypeError(f"time column {time_col!r} must be a timestamp,"
                        f" got {dt.simpleString()}")
    missing = [k for k in key_values if k not in template.columns]
    if missing:
        raise ValueError(f"key_values columns {missing} not in template"
                         f" columns {template.columns}")
    if time_col in key_values:
        raise ValueError("key_values must not include the time column")
    if any(v is None for v in key_values.values()):
        # measured on Spark 4.1.2 (pinned by the staged st21 pytests):
        # the join's key equality makes Catalyst infer IsNotNull(key)
        # and push that filter BELOW the EventTimeWatermark node, so a
        # NULL-key heartbeat is dropped before it can advance the
        # watermark — silently useless, hence rejected here
        raise ValueError(
            "heartbeat key_values must be non-NULL sentinels: NULL-key"
            " rows are filtered below the watermark node by the join's"
            " inferred IsNotNull constraint and never advance it"
        )
    delay_ms = int(round(delay_seconds * 1000))
    cols = []
    for f in template.schema.fields:
        if f.name == time_col:
            cols.append(
                F.expr(f"timestamp - INTERVAL {delay_ms} MILLISECOND")
                .cast(dt).alias(time_col)
            )
        elif f.name in key_values:
            cols.append(
                F.lit(key_values[f.name]).cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return cols


def heartbeat_stream(
    spark,
    template: DataFrame,
    time_col: str = "ts",
    *,
    key_values: dict,
    interval_seconds: float = 60.0,
    delay_seconds: float = 0.0,
) -> DataFrame:
    """Wall-clock heartbeat in ``template``'s schema — the operational
    guard for :func:`stream_stream_join`'s left_outer mode: the query
    watermark is the MIN across both sides, so a right stream that
    goes QUIET holds every unmatched left row in state indefinitely
    (NULL finalization never fires).  Unioning this onto the quiet
    side keeps its event-time watermark advancing::

        right = clicks.unionByName(
            heartbeat_stream(spark, clicks, "ts",
                             key_values={"user_id": -1},
                             delay_seconds=300.0))
        joined = stream_stream_join(purchases, right, by="user_id",
                                    how="left_outer")

    One row per ``interval_seconds`` (rate source), with ``time_col``
    = wall clock − ``delay_seconds``, the join keys pinned to the
    ``key_values`` SENTINELS, and every other column NULL.

    ``key_values`` must name every join key with a literal guaranteed
    OUTSIDE the real key domain (a reserved id, an impossible
    composite) — sentinel-keyed heartbeats can then never match a
    real row, and on the non-preserved right side of a left_outer
    join they produce no output at all: only watermark progress.  A
    NULL sentinel is rejected outright: measured on Spark 4.1.2, the
    join's key equality makes Catalyst infer ``IsNotNull(key)`` and
    push that filter BELOW the watermark node, so NULL-key rows are
    dropped before they can advance event time (the staged st21
    pytests pin both behaviors).  Do NOT union a heartbeat onto the
    PRESERVED (left) side: its rows would finalize as NULL-payload
    output.

    ``delay_seconds`` is the skew allowance — the heartbeat asserts
    "no genuine event with time earlier than now − delay will arrive
    on this side"; set it to the side's maximum expected event-time
    lag (an aggressive 0 finalizes NULLs for left rows a genuinely
    late right counterpart could still have matched).
    """
    if interval_seconds < 1:
        raise ValueError("interval_seconds must be >= 1 (rate source"
                         " emits whole rows per second)")
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .filter(
            F.col("value") % F.lit(int(round(interval_seconds))) == 0
        )  # rounded to whole seconds (rate source emits 1 row/s)
    )
    return rate.select(
        *_heartbeat_projection(template, time_col, delay_seconds,
                               key_values)
    )


def stream_resample(
    stream: DataFrame,
    time_col: str = "ts",
    *,
    step_minutes: float,
    aggs: dict[str, str | list[str]],
    key_cols: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of :func:`~qctimeseries_spark.windows.resample`:
    epoch-anchored tumbling buckets (``F.window``) with the same
    commutative aggregates and output naming, so a batch backfill and
    the live stream produce interchangeable tables.

    Watermark bounds state to the reorder horizon; buckets older than
    it finalize and evict (append mode).  Works identically on batch
    frames (watermark no-op), which is how the oracle compares it.
    """
    from qctimeseries_spark.windows import RESAMPLE_AGGS

    step_us = int(round(step_minutes * 60 * 1_000_000))
    if step_us <= 0 or step_us % 1_000_000:
        raise ValueError("step_minutes must be a positive whole-second step")
    src = (
        stream.withWatermark(time_col, watermark)
        if stream.isStreaming
        else stream
    )
    exprs = []
    for col, fns in aggs.items():
        for fn in [fns] if isinstance(fns, str) else list(fns):
            if fn not in RESAMPLE_AGGS:
                raise ValueError(
                    f"unsupported agg {fn!r} for {col!r}; use {RESAMPLE_AGGS}"
                )
            e = getattr(F, fn)(F.col(col))
            if fn == "avg":
                e = F.round(e, 6)
            exprs.append(e.alias(f"{col}_{fn}"))
    win = F.window(F.col(time_col), f"{step_us // 1_000_000} seconds")
    out = src.groupBy(*(key_cols or []), win.alias("_win")).agg(*exprs)
    return out.withColumn("bucket_ts", F.col("_win.start")).drop("_win")


def stream_ohlc(
    stream: DataFrame,
    time_col: str = "ts",
    value_col: str = "value",
    *,
    step_minutes: float,
    key_cols: list[str] | None = None,
    ties: list[str] | None = None,
    watermark: str = "1 hour",
    out_time_col: str = "bucket_ts",
) -> DataFrame:
    """Streaming twin of :func:`~qctimeseries_spark.windows.
    ohlc_resample`: live candlesticks per (keys, epoch-anchored
    tumbling bucket) — open/high/low/close + count, finalized and
    EVICTED at the watermark (append mode).

    Entirely JVM-side: open/close are the same lexicographic
    (time, ties, value) struct min/max as the batch operator, which
    Spark maintains as ordinary declarative aggregate state — no
    Python in the loop, no custom state schema, O(1) scalars per open
    bucket.  Values pass through untouched, so a drained stream is
    bit-exact against the batch OHLC of the finalized buckets (how
    the oracle checks it).  NULL values drop first, as in batch.
    """
    step_us = int(round(step_minutes * 60 * 1_000_000))
    if step_us <= 0 or step_us % 1_000_000:
        raise ValueError("step_minutes must be a positive whole-second step")
    keys = list(key_cols or [])
    tie_cols = list(ties or [])
    src = (
        stream.filter(F.col(value_col).isNotNull())
        .withWatermark(time_col, watermark)
        if stream.isStreaming
        else stream.filter(F.col(value_col).isNotNull())
    )
    ostruct = F.struct(
        F.unix_micros(F.col(time_col)).alias("_us"),
        *[F.col(c) for c in tie_cols],
        F.col(value_col).alias("_y"),
    )
    win = F.window(F.col(time_col), f"{step_us // 1_000_000} seconds")
    agg = src.groupBy(*keys, win.alias("_win")).agg(
        F.min(ostruct).alias("_first"),
        F.max(ostruct).alias("_last"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
    )
    return agg.select(
        *keys,
        F.col("_win.start").alias(out_time_col),
        F.col("_first").getField("_y").alias("open"),
        "high",
        "low",
        F.col("_last").getField("_y").alias("close"),
        "n_obs",
    )


def stream_psi(
    stream: DataFrame,
    reference: DataFrame,
    *,
    value_col: str = "value",
    time_col: str = "ts",
    edges: list[float],
    window_minutes: float,
    watermark: str = "1 hour",
) -> DataFrame:
    """Live drift monitoring: per tumbling window, the per-bucket
    Population Stability Index of the streamed value distribution vs a
    fixed REFERENCE snapshot — the streaming twin of
    :func:`~qctimeseries_spark.datapipe.monitor.population_stability`,
    answering "is what's arriving right now still distributed like the
    corpus we trained on?" window by window.

    The reference's bucket shares are computed ONCE at construction
    (two thin aggregations over the snapshot) and ride into the
    streaming plan as literals — the stream side then needs ONE
    windowed aggregation with per-bucket conditional counters (buckets
    are the explicit ``edges``, a handful), so state per window is
    O(#buckets) scalars and the whole computation stays append-mode
    compatible: windows finalize and evict at the watermark, and the
    drained output equals the batch PSI computed per closed window
    (how the oracle checks it).  Every arithmetic step mirrors the
    batch operator exactly (integer-count shares, ``PSI_EPS`` floor,
    6-dp rounds), so stream and batch hash-agree.  NULL values are
    excluded, as in batch.

    Emits one row per (window, bucket): ``bucket_ts, bucket, n,
    share_cur, share_ref, psi``.
    """
    from qctimeseries_spark.datapipe.monitor import PSI_EPS, _bucketize

    nb = len(edges) + 1
    step_us = int(round(window_minutes * 60 * 1_000_000))
    if step_us <= 0 or step_us % 1_000_000:
        raise ValueError("window_minutes must be a positive whole-second step")

    # reference shares, frozen at construction: exact integer-count
    # ratios, identical to the batch operator's division
    ref_counts = dict.fromkeys(range(nb), 0)
    rows = (
        reference.filter(F.col(value_col).isNotNull())
        .select(_bucketize(F.col(value_col), edges).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in rows:
        ref_counts[r["b"]] = r["n"]
    ref_total = sum(ref_counts.values())
    if ref_total == 0:
        raise ValueError("reference snapshot has no non-NULL values")
    ref_share = {b: c / ref_total for b, c in ref_counts.items()}

    src = (
        stream.withWatermark(time_col, watermark)
        if stream.isStreaming
        else stream
    )
    src = src.filter(F.col(value_col).isNotNull())
    bucket = _bucketize(F.col(value_col), edges)
    win = F.window(F.col(time_col), f"{step_us // 1_000_000} seconds")
    counters = [
        F.sum(F.when(bucket == i, 1).otherwise(0)).alias(f"_c{i}")
        for i in range(nb)
    ]
    agg = src.groupBy(win.alias("_win")).agg(*counters)
    total = sum((F.col(f"_c{i}") for i in range(nb)), F.lit(0))
    terms = []
    for i in range(nb):
        share = F.col(f"_c{i}").cast("double") / total
        p = F.greatest(share, F.lit(PSI_EPS))
        q = F.greatest(F.lit(ref_share[i]), F.lit(PSI_EPS))
        terms.append(
            F.struct(
                F.lit(i).alias("bucket"),
                F.col(f"_c{i}").alias("n"),
                F.round(share, 6).alias("share_cur"),
                F.round(F.lit(ref_share[i]), 6).alias("share_ref"),
                F.round((p - q) * F.log(p / q), 6).alias("psi"),
            )
        )
    return (
        agg.select(
            F.col("_win.start").alias("bucket_ts"),
            F.explode(F.array(*terms)).alias("_t"),
        )
        .select("bucket_ts", "_t.*")
    )


def cusum_stateful(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key streaming CUSUM: every event emits with its key's
    running two-sided drift statistics (``s⁺ = max(0, s⁺ + v − target
    − slack)``, mirrored for ``s⁻``) and the alarm flag — the
    streaming twin of :func:`~qctimeseries_spark.windows.cusum`, which
    computes the identical recurrence batch-side via its prefix-sum
    closed form.

    State per key is four scalars; per-batch work is VECTORIZED — the
    recurrence unrolls to its prefix-sum closed form seeded with the
    carried state (``s⁺_i = max(s⁺_in + P_i, P_i − min_{k≤i} P_k)``
    with ``P`` the cumulative excess — two numpy passes, no per-row
    Python; a hot key delivering ~1M rows per micro-batch pays two
    cumsum/extrema sweeps instead of ~1M interpreter iterations), and
    for integer-unit inputs it is bit-identical to the sequential
    fold.  Feed integer-unit values (the ``a15`` discipline) and the
    running sums stay exact, so the drained stream hashes bit-equal
    against the batch closed-form oracle.  NULL values contribute
    nothing but EMIT with the key's carried statistics (matching the
    batch operator, whose windowed sums ignore NULLs); rows before the
    key's first non-NULL value emit NULL statistics with
    ``cusum_alarm=false``.  Rows at-or-before the carried timestamp
    drop (in-order-per-key contract, as :func:`ewma_stateful`).
    """
    import pandas as pd  # noqa: F401 — worker-side dependency

    hi = float(target) + float(slack)
    lo = float(target) - float(slack)
    thr = float(threshold) if threshold is not None else None
    out_schema = (
        f"{key_col} bigint, {id_col} bigint, "
        "cusum_pos double, cusum_neg double, cusum_alarm boolean"
    )
    state_schema = "sp double, sn double, last_us bigint, nseen bigint"

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        sp, sn, last_us, nseen = (
            state.get if state.exists else (0.0, 0.0, None, 0)
        )
        frames = [pdf[[id_col, time_col, value_col]] for pdf in pdf_iter]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values([time_col, id_col])
        us = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        if last_us is not None:
            keep = us > last_us
            pdf, us = pdf[keep], us[keep]
        if len(pdf) == 0:
            return
        v = pdf[value_col].to_numpy(dtype="float64")  # NULL -> NaN
        mask = ~np.isnan(v)
        vv = v[mask]
        pos = np.full(len(v), np.nan)
        neg = np.full(len(v), np.nan)
        if len(vv):
            P = np.cumsum(vv - hi)
            pos[mask] = np.maximum(sp + P, P - np.minimum.accumulate(P))
            M = np.cumsum(vv - lo)
            neg[mask] = np.maximum(sn - M, np.maximum.accumulate(M) - M)
            sp = float(pos[mask][-1])
            sn = float(neg[mask][-1])
        # NULL-value rows carry the statistic through (batch: windowed
        # sums ignore NULLs); before the key's first observation the
        # carried statistic is itself NULL
        pos = pd.Series(pos).ffill().to_numpy()
        neg = pd.Series(neg).ffill().to_numpy()
        if nseen > 0:
            pos = np.where(np.isnan(pos), sp, pos)
            neg = np.where(np.isnan(neg), sn, neg)
        state.update((sp, sn, int(us[-1]), int(nseen + len(vv))))
        out = pd.DataFrame(
            {
                key_col: key[0],
                id_col: pdf[id_col].to_numpy(),
                # NaN must land as SQL NULL, not double NaN: route the
                # stat columns through object dtype with None holes
                "cusum_pos": pd.Series(pos, dtype=object).where(
                    ~np.isnan(pos), None
                ),
                "cusum_neg": pd.Series(neg, dtype=object).where(
                    ~np.isnan(neg), None
                ),
                "cusum_alarm": (
                    (pos > thr) | (neg > thr)  # NaN compares False,
                    if thr is not None  # matching batch coalesce(false)
                    else np.zeros(len(v), dtype=bool)
                ),
            }
        )
        yield out

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = stream.withWatermark(time_col, watermark)
    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_stateful(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key streaming EWMA: every event emits with the running
    ``s = alpha·v + (1−alpha)·s_prev`` of its key (init ``s = v`` at
    the key's first observation) — the streaming twin of
    :func:`~qctimeseries_spark.windows.ewma`.

    State per key is two scalars (current smoothed value, last event
    time); per-batch work is VECTORIZED — the affine recurrence runs
    through pandas ``ewm(adjust=False)`` (C loop) seeded by prepending
    the carried state as a virtual first observation, which is
    bit-identical to the per-row Python fold (same ``α·v + (1−α)·s``
    product pair per step; verified in tests), so a hot key delivering
    ~1M rows per micro-batch pays one C sweep instead of ~1M
    interpreter iterations.  NULL values neither update state nor
    emit; rows at-or-before the carried timestamp drop, so on
    in-order-per-key streams the output equals the batch per-key
    sequential fold (the oracle).  Emitted values round to 6 dp for
    cross-engine comparison stability.
    """
    import pandas as pd  # noqa: F401 — worker-side dependency

    one_minus = 1.0 - alpha
    out_schema = (
        f"{key_col} bigint, {time_col} timestamp, {value_col} double, "
        f"{value_col}_ewma double"
    )
    state_schema = "s double, last_us bigint"

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        s, last_us = state.get if state.exists else (None, None)
        frames = [pdf[[time_col, value_col]] for pdf in pdf_iter]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values(time_col)
        pdf = pdf[pdf[value_col].notna()]
        us = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        if last_us is not None:
            keep = us > last_us
            pdf, us = pdf[keep], us[keep]
        if len(pdf) == 0:
            return
        v = pdf[value_col].to_numpy(dtype="float64")
        # seeded affine fold: ewm(adjust=False) computes the identical
        # (1−α)·s + α·v product pair per step, so prepending the carried
        # state as a virtual first sample reproduces the sequential
        # recurrence bit-for-bit in one C pass (one_minus kept for the
        # docstring contract; the C path multiplies by the same value)
        seed = np.empty(0) if s is None else np.array([s], dtype="float64")
        out = (
            pd.Series(np.concatenate([seed, v]))
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .to_numpy()[len(seed):]
        )
        cur = out[-1]
        state.update((float(cur), int(us[-1])))
        # round-half-away mirrors SQL ROUND (np.round is half-to-even,
        # which diverges at the exact halves dyadic alphas produce)
        yield pd.DataFrame(
            {
                key_col: key[0],
                time_col: pdf[time_col].to_numpy(),
                value_col: v,
                f"{value_col}_ewma": np.copysign(
                    np.floor(np.abs(out) * 1e6 + 0.5) / 1e6, out
                ),
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = stream.withWatermark(time_col, watermark)
    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_ingest_stream(
    stream: DataFrame,
    out_path: str,
    *,
    text_col: str = "text",
    depth: int | None = None,
    width: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Streaming count-min sketch maintenance: a live token-frequency
    monitor over an ingest stream, the streaming twin of
    :func:`~qctimeseries_spark.datapipe.sketches.cms_build`.

    Count-min counters are plain integer sums, so per-batch PARTIAL
    sketches merge into the corpus sketch by cell-wise addition — the
    same algebra that lets a 1000-executor rollup or a month of daily
    sketches combine exactly.  Each micro-batch therefore aggregates
    its own ≤ ``depth·width`` cell counts (map-side combine bounds the
    shuffle at the grid size regardless of batch rows) and writes them
    to a committed ``sink_batch=<id>/`` dir (:func:`_prepare_batch_dir`
    — a replayed batch skips, a crashed partial rewrites), making the
    on-disk partials exact under at-least-once delivery; the merged
    sketch is then ONE grid-sized aggregation over the partial files.
    The result is bit-identical to the batch sketch over the union of
    all batches — integer addition commutes — which is exactly what
    the oracle checks.

    Returns the merged ``(row, bucket, cnt)`` sketch — empty with that
    schema if the stream produced no batches.
    """
    import uuid as _uuid

    from pyspark.sql.utils import AnalysisException

    from qctimeseries_spark.datapipe.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_build,
    )

    depth = CMS_DEPTH if depth is None else depth
    width = CMS_WIDTH if width is None else width

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        bdir = _prepare_batch_dir(batch.sparkSession, out_path, batch_id)
        if bdir is None:  # committed by a previous attempt
            return
        cms_build(
            batch, text_col=text_col, depth=depth, width=width
        ).write.mode("append").parquet(bdir)

    checkpoint_dir = (
        checkpoint_dir or f"/tmp/qcts_cms_ckpt_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream.sparkSession
    try:
        parts = spark.read.parquet(out_path)
    except AnalysisException:
        return spark.createDataFrame(
            [], "row int, bucket int, cnt bigint"
        )
    return (
        parts.groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def stratified_sample_ingest_stream(
    stream: DataFrame,
    out_path: str,
    *,
    weight_col: str,
    n_per_group: int,
    group_col: str,
    key_col: str,
    seed: str = "qcts",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Streaming per-stratum weighted-sample maintenance: a live
    "best N docs per source, quality-biased" view over an ingest
    stream — the streaming twin of
    :func:`~qctimeseries_spark.datapipe.sample.stratified_sample`
    (t41) and the top-k member of the committed-partials family
    (:func:`cms_ingest_stream` merges by SUM, :func:`hll_ingest_stream`
    by MAX, this by per-group TOP-N).

    Exactness is the `_topk_exact` inclusion argument with BATCHES as
    the shards: the Efraimidis–Vitter race key is a pure function of
    (seed, key, weight) — no PRNG, no arrival-order dependence — so
    the corpus-wide per-group top-n is contained in the union of
    per-batch per-group top-ns under the same (key desc, id) total
    order.  Each micro-batch therefore keeps only its own ≤
    ``n_per_group`` winners per stratum (one partitioned window over
    the batch — the shuffle is bounded by the batch, never the
    history) and lands them in a committed ``sink_batch=<id>/`` dir
    (:func:`_prepare_batch_dir`: replay skips, crashed partial
    rewrites); the drained result re-ranks the tiny union (≤ batches ×
    groups × n rows).  The merge additionally drops duplicate
    (group, key) rows, so a row REDELIVERED across different batches
    (which the per-batch commit protocol cannot see) still counts
    once — its race key is identical wherever it appears, making the
    dedup exact.  Result is bit-identical to batch t41 over the union
    of batches, which is what the oracle checks.

    Returns the winner frame (original columns + ``es_key`` +
    ``sample_rank``) — empty with that schema if the stream produced
    no batches.
    """
    import uuid as _uuid

    from pyspark.sql import Window
    from pyspark.sql.utils import AnalysisException

    from qctimeseries_spark.datapipe.sample import stratified_sample

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        bdir = _prepare_batch_dir(batch.sparkSession, out_path, batch_id)
        if bdir is None:  # committed by a previous attempt
            return
        (
            stratified_sample(
                batch, weight_col, n_per_group,
                group_col=group_col, key_col=key_col, seed=seed,
            )
            .drop("sample_rank")  # batch-relative; re-ranked at merge
            .write.mode("append").parquet(bdir)
        )

    checkpoint_dir = (
        checkpoint_dir or f"/tmp/qcts_ssamp_ckpt_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream.sparkSession
    try:
        parts = spark.read.parquet(out_path).drop(_SINK_BATCH_COL)
    except AnalysisException:
        schema = stream.schema.simpleString()[7:-1]  # struct<...> body
        return spark.createDataFrame(
            [], f"{schema}, es_key double, sample_rank int"
        )
    wk = Window.partitionBy(group_col).orderBy(
        F.col("es_key").desc(), F.col(key_col)
    )
    return (
        parts.dropDuplicates([group_col, key_col])
        .withColumn("sample_rank", F.row_number().over(wk).cast("int"))
        .filter(F.col("sample_rank") <= int(n_per_group))
    )


def hll_ingest_stream(
    stream: DataFrame,
    out_path: str,
    value_col,
    *,
    group_cols: tuple = (),
    m: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Streaming HyperLogLog maintenance: live distinct counting over
    an ingest stream, the streaming twin of
    :func:`~qctimeseries_spark.datapipe.sketches.hll_distinct` and the
    max-merge sibling of :func:`cms_ingest_stream` (CMS counters merge
    by SUM, HLL registers by element-wise MAX — both commute, so both
    drain bit-identical to their batch sketch over the union of
    batches).

    Each micro-batch reduces to its OWN register partial (≤ m rows per
    group after map-side max-combining) and lands in a committed
    ``sink_batch=<id>/`` dir (:func:`_prepare_batch_dir` — replay
    skips, crashed partial rewrites), so the on-disk partials are
    exact under at-least-once delivery.  The drained result merges the
    partials with one grid-sized ``max`` and applies the SAME estimate
    tail as batch
    (:func:`~qctimeseries_spark.datapipe.sketches.hll_estimate_from_registers`),
    hence hash-equality with the batch operator is structural, not
    coincidental.

    Returns the estimate frame ``(group_cols..., n_registers, n_zero,
    reg_sum_scaled, est_distinct)`` — empty with that schema if the
    stream produced no batches.
    """
    import uuid as _uuid

    from pyspark.sql.utils import AnalysisException

    from qctimeseries_spark.datapipe.sketches import (
        HLL_M,
        hll_estimate_from_registers,
        hll_registers,
    )

    m = HLL_M if m is None else m

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        bdir = _prepare_batch_dir(batch.sparkSession, out_path, batch_id)
        if bdir is None:  # committed by a previous attempt
            return
        hll_registers(
            batch, value_col, group_cols=group_cols, m=m
        ).write.mode("append").parquet(bdir)

    checkpoint_dir = (
        checkpoint_dir or f"/tmp/qcts_hll_ckpt_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream.sparkSession
    try:
        parts = spark.read.parquet(out_path)
    except AnalysisException:
        # group-column TYPES come from the input stream's schema (the
        # _read_survivors precedent) — an all-string fallback would
        # make the empty path's schema disagree with a drained one
        from pyspark.sql import types as T

        schema = T.StructType(
            [stream.schema[c] for c in group_cols]
            + [
                T.StructField("n_registers", T.IntegerType()),
                T.StructField("n_zero", T.IntegerType()),
                T.StructField("reg_sum_scaled", T.LongType()),
                T.StructField("est_distinct", T.DoubleType()),
            ]
        )
        return spark.createDataFrame([], schema)
    merged = parts.groupBy(*group_cols, "_bucket").agg(
        F.max("_M").alias("_M")
    )
    return hll_estimate_from_registers(
        merged, group_cols=group_cols, m=m
    )


def stream_change_intervals(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "event_type",
    tiebreak_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming SCD-type-2 maintenance: the stateful twin of
    :func:`~qctimeseries_spark.windows.change_intervals` — a live
    change log compresses into validity intervals AS IT ARRIVES, each
    key carrying exactly one OPEN interval (value, valid_from, dense
    version) as state; when the value changes, the closed interval is
    emitted and the new one opens.  State per key is four scalars +
    one string — O(#keys), never O(#rows).

    Emission contract: CLOSED intervals only (append-mode); the open
    run lives in state until a later batch closes it.  For per-key
    in-order streams (a CDC/changelog feed — equal timestamps must not
    straddle batches) the drained output equals the batch operator's
    rows with ``valid_to IS NOT NULL``, which is what the oracle
    checks.  Two late-data rules apply: rows at-or-before the carried
    per-key (time, tiebreak) high-water mark are dropped by the
    operator (the :func:`stream_gaps` rule), and — like every
    watermarked stateful operator — the ENGINE drops rows more than
    ``watermark`` behind the stream's GLOBAL max event time, so a key
    whose feed lags other keys by more than the delay loses rows: size
    ``watermark`` to the cross-KEY skew of the feed, not just to
    per-key reordering.

    Batch work is vectorized: rows sort once, run boundaries come from
    one null-safe shift-compare, and only the collapsed RUNS (not the
    rows) pass through Python — the carried open run prepends as a
    pseudo-row so an unchanged value extends it without a version
    bump.
    """
    import pandas as pd  # noqa: F401 — worker-side dependency

    # key type FOLLOWS the stream (r8 advisor: a hardcoded bigint key
    # crashed string-keyed changelogs at runtime); the value column is
    # genuinely string-typed by contract (it's stored in state as one)
    key_type = stream.schema[key_col].dataType.simpleString()
    val_type = stream.schema[value_col].dataType.simpleString()
    if val_type != "string":
        raise TypeError(
            f"stream_change_intervals tracks a STRING value column "
            f"(state stores one open value per key); {value_col} is "
            f"{val_type} — cast it first"
        )
    out_schema = (
        f"{key_col} {key_type}, {value_col} string, version int, "
        "valid_from timestamp, valid_to timestamp"
    )
    state_schema = (
        "open_val string, open_from_us bigint, version int, "
        "last_us bigint, last_tb bigint"
    )

    def fn(key, pdf_iter, state):
        import pandas as pd

        frames = [pdf[[time_col, value_col, tiebreak_col]]
                  for pdf in pdf_iter]
        if not frames:
            return
        df = pd.concat(frames)
        df["_us"] = df[time_col].astype("datetime64[us]").astype("int64")
        df = df.sort_values(["_us", tiebreak_col], kind="stable")
        if state.exists:
            open_val, open_from_us, version, last_us, last_tb = state.get
            keep = (df["_us"] > last_us) | (
                (df["_us"] == last_us) & (df[tiebreak_col] > last_tb)
            )
            df = df[keep]
        else:
            open_val = open_from_us = version = None
        if not len(df):
            return
        vals = df[value_col].tolist()
        uss = df["_us"].tolist()
        # prepend the carried open run; run 0 then inherits its
        # version and valid_from, and an unchanged value extends it
        if version is not None:
            vals = [open_val] + vals
            uss = [open_from_us] + uss
            base_version = version
        else:
            base_version = 1
        # collapse to runs: a fresh sentinel never equals any value,
        # and None != None is False, so plain != is null-safe here
        run_vals, run_from = [], []
        prev = object()
        for v, u in zip(vals, uss):
            vv = None if pd.isna(v) else v
            if vv != prev:
                run_vals.append(vv)
                run_from.append(u)
            prev = vv
        n_closed = len(run_vals) - 1
        if n_closed > 0:
            yield pd.DataFrame(
                {
                    key_col: key[0],
                    value_col: run_vals[:-1],
                    "version": [
                        base_version + i for i in range(n_closed)
                    ],
                    "valid_from": pd.Series(
                        run_from[:-1], dtype="int64"
                    ).astype("datetime64[us]"),
                    "valid_to": pd.Series(
                        run_from[1:], dtype="int64"
                    ).astype("datetime64[us]"),
                }
            )
        state.update(
            (
                run_vals[-1],
                int(run_from[-1]),
                int(base_version + n_closed),
                int(uss[-1]),
                int(df[tiebreak_col].iloc[-1]),
            )
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = stream.withWatermark(time_col, watermark)
    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stage_file_batches(frames, src_dir: str, *, start_mtime: int = 1_700_000_000) -> None:
    """Write each frame as ONE parquet file under ``src_dir`` with
    strictly increasing mtimes, so a ``maxFilesPerTrigger=1``
    file-source stream replays them as ordered micro-batches — the
    planted-batch protocol the streaming queries and tests share
    (previously copy-pasted per site; any change to the protocol now
    lands once).

    The single file materializes via ``repartition(1)``, NOT
    ``coalesce(1)``: coalesce narrows the parent into ONE task that
    evaluates every upstream partition SEQUENTIALLY, which for a
    Python-created local relation costs one worker round-trip PER
    EMPTY PARTITION (~6 s for a 1-row frame on 32 cores, measured —
    it dominated the st23 drain benchmark), and for a parquet-scan
    parent single-threads the whole scan.  The protocol guarantees
    batch MEMBERSHIP and batch ORDER only — intra-file row order is
    unspecified (every stateful consumer sorts within the batch).

    Same-schema frame lists (every query-registry caller: the batches
    are filters of one table) stage in ONE Spark job: tag each frame
    with its batch ordinal, union, hash-repartition on the tag and
    ``partitionBy`` it on write — dynamic partitioning emits exactly
    one file per non-empty tag value (a value lives in exactly one
    hash partition), which then renames to ``batch<i>.parquet``.  One
    scan of the shared parent instead of one per frame.  Mixed
    schemas, a single frame, or an empty frame (no file for its tag)
    fall back to the original per-frame loop — identical staged bytes
    semantics either way (membership + order; row order within a file
    is unspecified in both paths)."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    os.makedirs(src_dir, exist_ok=True)
    frames = list(frames)

    def _finalize(i: int, part_file: str) -> None:
        dst = os.path.join(src_dir, f"batch{i}.parquet")
        shutil.move(part_file, dst)
        os.utime(dst, (start_mtime + i * 100,) * 2)

    tag = "__qcts_stage_batch__"
    schemas = {
        tuple((f.name, f.dataType.simpleString()) for f in fr.schema.fields)
        for fr in frames
    }
    if len(frames) > 1 and len(schemas) == 1 and tag not in frames[0].columns:
        tagged = frames[0].withColumn(tag, F.lit(0))
        for i, fr in enumerate(frames[1:], 1):
            tagged = tagged.unionByName(fr.withColumn(tag, F.lit(i)))
        stage = tempfile.mkdtemp(prefix="qcts_stage_")
        try:
            (
                tagged.repartition(len(frames), F.col(tag))
                .write.mode("overwrite")
                .partitionBy(tag)
                .parquet(stage)
            )
            parts = {
                i: glob.glob(os.path.join(stage, f"{tag}={i}", "part-*.parquet"))
                for i in range(len(frames))
            }
            if all(len(p) == 1 for p in parts.values()):
                for i in range(len(frames)):
                    _finalize(i, parts[i][0])
                return
        finally:
            shutil.rmtree(stage, ignore_errors=True)
    for i, frame in enumerate(frames):
        stage = tempfile.mkdtemp(prefix="qcts_stage_")
        frame.repartition(1).write.mode("overwrite").parquet(stage)
        _finalize(i, glob.glob(stage + "/part-*.parquet")[0])
        shutil.rmtree(stage, ignore_errors=True)
