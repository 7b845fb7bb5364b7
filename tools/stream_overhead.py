"""Fixed vs marginal cost of the availableNow streaming drains
(st12–st26) — VERDICT r7 task 6, extended with the sketch streams,
the native session_window sessionization, and the round-12 event /
candlestick streams.

The bench times each streaming ingest/serve query as one opaque drain,
but most of that cost is FIXED micro-batch machinery (stream planning,
checkpoint/WAL commits per batch, source file listing) that amortizes
in a long-running stream.  Grading streaming entries on the drain
total therefore overstates their steady-state cost.  This tool
separates the two: drain the SAME total data as 1 micro-batch and as
4 micro-batches, fit T(n) = fixed + n * marginal, and report both —
the marginal per-batch cost is the number a long-running deployment
actually pays per arriving batch.

Prints one JSON line per flow and a summary table.

Usage: python tools/stream_overhead.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPEATS = 2  # best-of per (flow, n_batches) point


def _stage_files(df, src: str, n: int, key: str) -> None:
    """Write df as n separate parquet files with ascending mtimes so
    the file source delivers n micro-batches (maxFilesPerTrigger=1)."""
    from pyspark.sql import functions as F

    os.makedirs(src, exist_ok=True)
    for i in range(n):
        part = df.filter(F.pmod(F.xxhash64(key), F.lit(n)) == i)
        stage = src + f"_stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        dst = os.path.join(src, f"batch{i}.parquet")
        shutil.move(glob.glob(stage + "/part-*.parquet")[0], dst)
        shutil.rmtree(stage, ignore_errors=True)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)


def _time_flow(fn) -> float:
    best = None
    for _ in range(REPEATS):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])  # optional flow-name filter (e.g. st19)

    from pyspark.sql import functions as F

    from qctimeseries_spark.datapipe.similarity import build_ivf_index
    from qctimeseries_spark.session import get_spark
    from qctimeseries_spark.sources import read_table
    from qctimeseries_spark.streaming import (
        cms_ingest_stream,
        hll_ingest_stream,
        ingest_dedup_stream,
        ingest_embedding_stream,
        ingest_neardup_stream,
        knn_serve_stream,
    )

    spark = get_spark("stream-overhead")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = read_table(spark, sf_dir, "embeddings")
    docs.persist().count()
    emb.persist().count()

    root = tempfile.mkdtemp(prefix="qcts_overhead_")
    ix = os.path.join(root, "index")
    build_ivf_index(emb, ix, nlist=16)

    def read_stream(src, schema):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    def st12(src, run):
        d = os.path.join(root, f"st12_{run}")
        ingest_dedup_stream(
            read_stream(src, "doc_id bigint, text string"),
            d + "/store", d + "/out", checkpoint_dir=d + "/ckpt",
        ).count()

    def st13(src, run):
        d = os.path.join(root, f"st13_{run}")
        ingest_neardup_stream(
            read_stream(src, "doc_id bigint, text string"),
            d + "/store", d + "/out",
            k=15, bands=5, ngram=3, threshold=0.6,
            checkpoint_dir=d + "/ckpt",
        ).count()

    def st14(src, run):
        d = os.path.join(root, f"st14_{run}")
        ingest_embedding_stream(
            read_stream(src, "vec_id bigint, embedding array<float>"),
            d + "/store", d + "/out",
            id_col="vec_id", threshold=0.98,
            checkpoint_dir=d + "/ckpt",
        ).count()

    def st15(src, run):
        d = os.path.join(root, f"st15_{run}")
        knn_serve_stream(
            read_stream(src, "query_id bigint, embedding array<float>"),
            ix, d + "/out", k=10, nprobe=4,
            checkpoint_dir=d + "/ckpt",
        ).count()

    def st16(src, run):
        d = os.path.join(root, f"st16_{run}")
        cms_ingest_stream(
            read_stream(src, "doc_id bigint, text string"),
            d + "/out", checkpoint_dir=d + "/ckpt",
        ).count()

    def st19(src, run):
        from qctimeseries_spark.streaming import (
            run_available_now,
            stream_sessions,
        )

        run_available_now(
            stream_sessions(
                read_stream(src, "user_id bigint, ts timestamp"),
                gap_minutes=30.0,
            ),
            output_mode="append",
        ).count()

    def st21(src, run):
        from qctimeseries_spark.streaming import (
            run_available_now,
            stream_stream_join,
        )

        schema = (
            "event_id bigint, user_id bigint, ts timestamp,"
            " event_type string"
        )

        def side(kind):
            return (
                read_stream(src, schema)
                .filter(F.col("event_type") == kind)
                .select("event_id", "user_id", "ts")
            )

        run_available_now(
            stream_stream_join(
                side("purchase"), side("click"),
                by="user_id", lookback_seconds=4 * 3600.0,
            ),
            output_mode="append",
        ).count()

    def st18(src, run):
        from qctimeseries_spark.streaming import (
            run_available_now,
            stream_change_intervals,
        )

        schema = (
            "event_id bigint, user_id bigint, ts timestamp,"
            " event_type string"
        )
        run_available_now(
            stream_change_intervals(read_stream(src, schema)),
            output_mode="append",
        ).count()

    def st22(src, run):
        from qctimeseries_spark.streaming import (
            run_available_now,
            stream_funnel,
        )

        run_available_now(
            stream_funnel(
                read_stream(
                    src,
                    "event_id bigint, user_id bigint, ts timestamp,"
                    " event_type string",
                ).select("user_id", "ts", "event_type"),
                ["signup", "click", "purchase"],
                horizon_seconds=7 * 86400.0,
            ),
            output_mode="append",
        ).count()

    def st24(src, run):
        from qctimeseries_spark.streaming import (
            run_available_now,
            stream_transitions,
        )

        run_available_now(
            stream_transitions(
                read_stream(
                    src,
                    "event_id bigint, user_id bigint, ts timestamp,"
                    " event_type string",
                ).select("user_id", "ts", "event_type", "event_id")
            ),
            output_mode="append",
        ).count()

    def st25(src, run):
        from qctimeseries_spark.streaming import (
            run_available_now,
            stream_attribution,
        )

        run_available_now(
            stream_attribution(
                read_stream(
                    src,
                    "event_id bigint, user_id bigint, ts timestamp,"
                    " event_type string",
                ).select("user_id", "ts", "event_type", "event_id"),
                conversion_type="purchase",
                touch_types=["signup", "click"],
                lookback_seconds=7 * 86400.0,
            ),
            output_mode="append",
        ).count()

    def st26(src, run):
        from qctimeseries_spark.streaming import (
            run_available_now,
            stream_ohlc,
        )

        run_available_now(
            stream_ohlc(
                read_stream(
                    src,
                    "event_id bigint, user_id bigint, ts timestamp,"
                    " value double",
                ).select("user_id", "ts", "value", "event_id"),
                "ts", "value", step_minutes=360.0,
                key_cols=["user_id"], ties=["event_id"],
            ),
            output_mode="append",
        ).count()

    def st23(src, run):
        from qctimeseries_spark.streaming import (
            run_available_now,
            stream_stream_join,
        )

        schema = (
            "event_id bigint, user_id bigint, ts timestamp,"
            " event_type string"
        )

        def side(kind):
            return (
                read_stream(src, schema)
                .filter(F.col("event_type") == kind)
                .select("event_id", "user_id", "ts")
            )

        # mirror q_st23's scoped state-partition sizing (8) so the
        # decomposition prices the same configuration the bench runs
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            run_available_now(
                stream_stream_join(
                    side("purchase"), side("click"),
                    by="user_id", lookback_seconds=4 * 3600.0,
                    watermark="1 hour", how="left_outer",
                ),
                output_mode="append",
            ).count()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    def stage_st23(src: str, n: int) -> None:
        """st23's staging is SEMANTIC (VERDICT r12 task 3): the click
        side goes quiet at Jan 16 and sentinel heartbeats arrive in
        LATER micro-batches to advance its watermark, so batch
        boundaries cannot be a plain hash split.  The decomposition
        therefore splits only the pre-cut DATA into n hash batches and
        keeps the 3-batch guard tail (post-cut purchases + heartbeat,
        heartbeat, heartbeat) constant between the two configs — the
        (t4 − t1)/3 marginal isolates the per-data-batch cost, and
        "fixed" deliberately INCLUDES the constant heartbeat/
        finalization drain tail, which is exactly st23's drain-heavy
        profile."""
        from qctimeseries_spark.streaming import (
            _heartbeat_projection,
            stage_file_batches,
        )

        cut = F.lit("2024-01-16").cast("timestamp")
        template = events_full.select("event_id", "user_id", "ts")

        def hb(iso: str):
            return (
                spark.createDataFrame([(iso,)], "t string")
                .select(F.col("t").cast("timestamp").alias("timestamp"))
                .select(
                    *_heartbeat_projection(template, "ts", 0.0,
                                           {"user_id": -1}),
                    F.lit("click").alias("event_type"),
                )
            )

        pre = events_full.filter(F.col("ts") < cut)
        batches = [
            pre.filter(F.pmod(F.xxhash64("user_id"), F.lit(n)) == i)
            for i in range(n)
        ]
        batches.append(
            events_full.filter(
                (F.col("ts") >= cut)
                & (F.col("event_type") == "purchase")
            ).unionByName(hb("2024-01-16 00:00:00"))
        )
        batches.append(hb("2024-02-05 00:00:00"))
        batches.append(hb("2024-02-06 00:00:00"))
        stage_file_batches(batches, src)

    def st17(src, run):
        from qctimeseries_spark.datapipe.text import tokens

        d = os.path.join(root, f"st17_{run}")
        toks = read_stream(src, "doc_id bigint, lang string, text string").select(
            "lang", F.explode(tokens(F.col("text"))).alias("term")
        )
        hll_ingest_stream(
            toks, d + "/out", "term", group_cols=("lang",),
            checkpoint_dir=d + "/ckpt",
        ).count()

    docs_lang = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    docs_lang.persist().count()

    events_ut = read_table(spark, sf_dir, "events").select("user_id", "ts")
    events_ut.persist().count()

    events_full = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    events_full.persist().count()

    events_val = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    events_val.persist().count()

    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flows = {
        "st12": (docs, "doc_id", st12),
        "st13": (docs, "doc_id", st13),
        "st14": (emb, "vec_id", st14),
        "st15": (queries, "query_id", st15),
        "st16": (docs, "doc_id", st16),
        "st17": (docs_lang, "doc_id", st17),
        "st19": (events_ut, "user_id", st19),
        # NOTE st21's batches split by user_id hash, so both sides of
        # a (purchase, click) match land in the SAME batch — the
        # marginal cost measured here is the per-batch state-store +
        # checkpoint work, the steady-state number
        "st21": (events_full, "user_id", st21),
        # st23 = st21's left_outer form under the heartbeat guard;
        # custom SEMANTIC stager (see stage_st23) — its "fixed" column
        # includes the constant 3-batch heartbeat finalization tail
        "st23": (events_full, "user_id", st23, stage_st23),
        # st18 likewise hash-splits by user_id, so every key's change
        # log stays in-order inside one batch (the operator's in-order
        # contract) — added for the r11 bench watch-item decomposition
        "st18": (events_full, "user_id", st18),
        # round-12 event/candlestick streams: same user_id hash split
        # (each user's rows land whole in one batch, satisfying the
        # per-user in-order contracts of st22/st24/st25; st26 is an
        # order-free windowed aggregation)
        "st22": (events_full, "user_id", st22),
        "st24": (events_full, "user_id", st24),
        "st25": (events_full, "user_id", st25),
        "st26": (events_val, "user_id", st26),
    }

    results = {}
    run_id = 0
    for name, entry in flows.items():
        df, key, flow = entry[:3]
        stager = entry[3] if len(entry) > 3 else None
        if only and name not in only:
            continue
        times = {}
        for n in (1, 4):
            src = os.path.join(root, f"{name}_src{n}")
            if stager is not None:
                stager(src, n)
            else:
                _stage_files(df, src, n, key)

            def once():
                nonlocal run_id
                run_id += 1
                flow(src, run_id)

            times[n] = round(_time_flow(once), 3)
        marginal = round((times[4] - times[1]) / 3, 3)
        fixed = round(times[1] - marginal, 3)
        results[name] = {
            "t_1batch": times[1],
            "t_4batch": times[4],
            "fixed": fixed,
            "marginal_per_batch": marginal,
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "flows": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
