"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is forced through the noop sink so every column is actually
computed (``count()`` would let Catalyst prune projections).  The set
spans the engine's surface: QC aggregation/updates/windows, relational
joins, sessionization, dedup, similarity search, text analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

#: the round-1/2 headline set — kept intact so round-over-round totals
#: stay comparable (reported as core_subtotal)
CORE = [
    "a1_progress",
    "u6_flag_approve_advance",
    "w3_admitted_windows",
    "v1_downsample",
    "h1_pricing_summary",
    "h3_segment_revenue",
    "h5_nation_revenue",
    "t1_sessionize",
    "d1_exact_dedup",
    "d2_minhash_dedup",
    "d5_embedding_dups",
    "x1_knn_bruteforce",
    "t3_quality",
    "m2_media_features",
]

#: round-2 operators folded into regression tracking from round 3 on
EXTENDED = [
    "j1_asof_join",
    "j2_range_join",
    "c1_dup_clusters",
    "t7_contamination",
    "t8_hash_sample",
    "a9_percentiles",
    "c2_curate",
    "w11_interpolate",
    "a12_rolling_by_key",
    "m3_media_decode",
    "t12_bpe_pairs",
    "a15_cusum",
    # round-5 additions: stateful streaming + incremental stores +
    # corpus-model text quality + the embedding store
    "st9_stream_asof",
    "st10_stream_cusum",
    "d6_incremental_dedup",
    "d7_incremental_neardup",
    "d8_embedding_store",
    "t17_tfidf",
    "t18_unigram_nll",
    "t19_repetition",
    # round-6 additions: streaming ingestion dedup (exact + NEAR)
    "st12_stream_ingest_dedup",
    "st13_stream_ingest_neardup",
    "st14_stream_ingest_embedding",
    "st15_stream_knn_serve",
    # round-7 additions: the dedup granularity ladder tail (line /
    # span / semantic), tokenizer application + bigram screen, and the
    # persisted-index ANN serve path
    "h4_order_priority",
    "h6_forecast_revenue",
    "t20_line_dedup",
    "t21_bpe_encode",
    "t22_bigram_nll",
    "t23_span_dedup",
    "t24_source_cap",
    "t25_quality_classifier",
    "d9_semantic_dedup",
    "x3_knn_persisted",
    "x4_radius_search",
    "m4_resize",
    "m5_frame_sample",
    # round-8 additions: incremental growth of the persisted IVF
    # index; int8-quantized brute search
    "x5_knn_index_append",
    "x6_quantized_knn",
    # round-8 late additions: PQ ANN, skew-hardened join, seasonal
    # anomaly screen, deterministic corpus shuffle
    "x7_pq_knn",
    "x8_pq_index",
    "j4_skew_join",
    "a16_seasonal",
    "t26_shuffle_shard",
    # round-8 final additions: BM25 retrieval, cross-corpus LSH join,
    # leakage-safe split, filtered ANN
    "t27_bm25",
    "d10_cross_neardup",
    "t28_safe_split",
    "x9_filtered_knn",
    "d11_canonical_keep",
    "x10_cell_sample",
    # round-8 closing additions: hybrid RRF retrieval, weighted
    # sampling, n-gram novelty, IVF cell diagnostics
    "t29_hybrid_rrf",
    "t30_weighted_sample",
    "t31_ngram_novelty",
    "x11_cell_stats",
    # sketch tier: bounded-state Bloom / count-min / HLL
    "t32_bloom_prune",
    "t33_cms_heavyhitters",
    "t34_hll_distinct",
    # snapshot delta, embedding drift, and the Q3/Q5-shape relational
    # plans
    "d12_snapshot_diff",
    "x12_embedding_drift",
    "h7_top_unshipped",
    "h8_local_nation_revenue",
    "t35_perplexity_buckets",
    "t36_nfc_dedup",
    "h9_big_orders",
    # round-8 continuation: RAG chunking, temperature mixture, SCD2
    # intervals, negative sampling, streaming CMS, ORC roundtrip
    "t37_chunk_docs",
    "t38_temperature_mix",
    "a17_change_intervals",
    "x13_negative_sample",
    "st16_stream_heavyhitters",
    "s11_orc_roundtrip",
    # wave 2: exact k-means, sequence packing, streaming HLL
    "x14_kmeans",
    "t39_pack_sequences",
    "st17_stream_distinct",
    # wave 3: interval-overlap join, Q10 shape, ANN recall eval
    "j5_interval_join",
    "h10_returned_revenue",
    "x15_recall_eval",
    # wave 4: benchmark-span excision, MMR diversified rerank
    "t40_excise_contamination",
    "x16_mmr_rerank",
    # wave 5: IVF tombstone deletes (build -> append -> delete -> purge)
    "x17_knn_after_delete",
    # wave 6: per-source duplicate-rate KPI
    "d13_dup_rate",
    # wave 7: TPC-H Q7/Q14/Q19 shapes
    "h11_nation_volume",
    "h12_promo_share",
    "h13_disjunctive_filter",
    # wave 8: streaming SCD2 maintenance
    "st18_stream_scd2",
    # round 9: binary-signature recall tier + exact rerank; native
    # session_window streaming sessionization
    "x18_binary_knn",
    "st19_stream_sessions",
    # round 10: per-source stratified weighted sampling (batch +
    # streaming committed-partials twin); tolerance as-of join (the
    # staleness-nulling projection under driver hash)
    "t41_stratified_sample",
    "j6_asof_tolerance",
    "st20_stream_stratified",
    "w14_bfill",
    "x19_ivfpq_residual",
    "h14_order_distribution",
    # round-10 continuation: the remaining TPC-H semantics (correlated
    # avg gate, global-threshold scalar, max/argmin attach, distinct
    # counts + anti-join, multi-EXISTS, scalar-avg gate + anti-join)
    # and exact per-key OLS trend
    "h15_small_qty_revenue",
    "h16_important_parts",
    "h17_top_supplier",
    "h18_supplier_part_counts",
    "h19_waiting_supplier",
    "h20_balance_gate",
    "h21_min_cost_supplier",
    "a18_trend",
    "j7_nearest_join",
    "st21_stream_stream_join",
    # wave 4: perceptual-hash media dedup, rollup aggregate,
    # partition-pruned roundtrip, exact lag-1 autocorrelation
    "m6_phash_dedup",
    "h22_rollup_revenue",
    "s12_partitioned_roundtrip",
    "a19_autocorr",
    "d14_containment",
    # round 11: JPEG DCT-domain pHash over the DC grid; time-weighted
    # resample; ordered funnel + cohort retention event analytics
    "m7_jpeg_dc_phash",
    "w15_time_weighted",
    "e1_funnel",
    "e2_retention",
    "st22_stream_funnel",
    "e3_funnel_lags",
    # round 12: carry-in time-weighted resample; heartbeat-guard
    # left_outer stream-join drain; OHLC candlesticks; event-type
    # transition matrix
    "w16_twa_carry",
    "st23_heartbeat_guard",
    "w17_ohlc",
    "e4_transitions",
    "d15_edit_distance",
    # round 12 (late): last-touch attribution; streaming transition
    # pair stream (e4's stateful twin); streaming last-touch
    # attribution (e5's stateful twin)
    "e5_attribution",
    "st24_stream_transitions",
    "st25_stream_attribution",
    # round 12 (late): streaming candlesticks (w17's pure-JVM
    # windowed-aggregation twin); max-gap-capped LOCF (the production
    # imputation-integrity knob under the driver hash)
    "st26_stream_ohlc",
    "w18_ffill_maxgap",
    # round 12 (late): rolling active users (the DAU/WAU KPI)
    "e6_active_users",
]

HEADLINE = CORE + EXTENDED

#: the pinned quiet-host RAW core_subtotal span, r8-r11 (BENCHNOTES.md
#: "bench noise" addendum: 10.33-12.08 s across every run where the
#: calibration samples and /proc/loadavg both read quiet).  A run whose
#: core lands above this span +10% headroom is load-inflated and says
#: so in its own record (VERDICT r11 task 7) — no BENCHNOTES forensics
#: needed.  Faster-than-span is fine (quiet hosts only get faster).
QUIET_CORE_SPAN = (10.33, 12.08)

#: the PINNED reference calibration (VERDICT r12 task 2): the median
#: per-run calibration across the committed driver records r9-r12
#: (0.111 / 0.102 / 0.103 / 0.103).  ``queries_normalized`` divides by
#: THIS RUN's calibration sample — correct for cross-HOST comparison,
#: but two same-host records with different calibration samples (r12's
#: quiet run sampled 0.081 vs the driver's 0.103) then disagree by the
#: denominator ratio alone, which read as a fabricated ~1.27×
#: across-the-board regression.  ``queries_normalized_pinned`` divides
#: by this constant instead: same units in every record from r13 on,
#: so cross-ROUND per-query ratios on this host read directly with no
#: denominator forensics.  Update only if the host fleet changes (and
#: say so in BENCHNOTES).
PINNED_CALIBRATION = 0.103


def _calibration_probe(spark) -> float:
    """One timed run of the fixed synthetic workload: a constant-size
    JVM-side hash+aggregate over ``range(2^26)``.  Identical plan every
    round, so its time moves only with HOST speed — cross-round query
    ratios divide by it to cancel host drift (three rounds of bench
    deltas were host-confounded before this existed; see
    BENCHNOTES.md §1).

    The probe is sampled SEVERAL times, INTERLEAVED through the query
    loop, and the normalizer is the MEDIAN of the samples: round 6
    recorded a single pre-run probe of 0.274 s against a cross-round
    series of 0.155–0.221 s, which made every normalized number that
    round read as a fake ~40% regression (VERDICT r7).  A median over
    probes spread across the run is robust to one load burst and also
    *sees* load that arrives mid-run, which a start-only probe cannot.
    """
    from pyspark.sql import functions as F

    runs = []
    for _ in range(3):  # min-of-3 per sample point: a GC pause or an
        # external load burst lands in single runs, not the sample
        t0 = time.time()
        # mask before summing: a raw Σ xxhash64 overflows int64 under
        # ANSI mode
        spark.range(1 << 26).select(
            F.sum(F.xxhash64("id").bitwiseAND(F.lit(0xFFFF))).alias("h")
        ).write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    return min(runs)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _micro_probe(spark) -> float:
    """One ~20-40 ms fixed synthetic job, timed ONCE — the per-query
    burst sentinel (VERDICT r13 task 2).  The full calibration probe
    samples only every ~34 queries, so a multi-second external load
    burst can inflate a contiguous extended-tier segment while the
    record still says ``noisy_run: false`` (the r13 driver record:
    st10 read 7.97 s in-record vs 1.74 s in every other record, and
    attributing it took six-record forensics).  Running this micro
    probe after EVERY query stamps each reading with the host state
    it ran under; it is 1/16 the calibration workload so the whole
    sweep adds ~3-5 s outside every timed region.
    """
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(1 << 22).select(
        F.sum(F.xxhash64("id").bitwiseAND(F.lit(0xFFFF))).alias("h")
    ).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def burst_flags(probes: dict[str, float]) -> dict[str, bool]:
    """Per-query ``burst_suspect``: a micro-probe reading more than 2×
    the run's median probe (with a 50 ms absolute floor so scheduler
    jitter on a ~25 ms job cannot trip it) means the host was loaded
    when that query's best-of-N finished — read that query's raw time
    with suspicion and prefer the other committed records for it.
    A flag is a SENTINEL, not a verdict: best-of-N often sheds the
    burst even when the probe catches it."""
    if not probes:
        return {}
    med = _median(list(probes.values()))
    gate = max(2.0 * med, med + 0.05)
    return {q: bool(p > gate) for q, p in probes.items()}


def _stream_fixed_probe(spark) -> float:
    """Fixed cost of ONE availableNow micro-batch drain over a trivial
    source + aggregation: stream planning, checkpoint/WAL commits, and
    source file listing — machinery every st-entry pays regardless of
    its data (VERDICT r10 task 6: st21 reads 7 s in the record but is
    ~1.6 s marginal).  Emitting this in the record lets a reader price
    streaming entries on both columns (drain total vs steady-state ≈
    total − fixed) without BENCHNOTES forensics;
    ``tools/stream_overhead.py`` measures the exact per-flow split.
    """
    import shutil
    import tempfile

    from qctimeseries_spark.streaming import run_available_now

    root = tempfile.mkdtemp(prefix="qcts_bench_stream_")
    src = os.path.join(root, "src")
    spark.range(1000).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v"
    ).coalesce(1).write.parquet(src)
    best = None
    try:
        for _ in range(2):
            t0 = time.time()
            run_available_now(
                spark.readStream.schema("id bigint, v double")
                .parquet(src)
                .groupBy()
                .count()
            ).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return round(best, 3)


def result_json(
    times: dict[str, float],
    calibration: float,
    calibration_samples: list[float],
    spread: float,
    sf: float,
    *,
    stream_fixed_overhead: float | None = None,
    calibration_retried: bool = False,
    calibration_first_samples: list[float] | None = None,
    query_probes: dict[str, float] | None = None,
    query_loadavg: dict[str, float] | None = None,
) -> str:
    """One-line JSON bench record, TAIL-SAFE for the driver capture.

    KEY ORDER MATTERS: the driver records only the LAST 2,000 chars of
    this line (VERDICT r8 "what's wrong" #1 — with 92 headline queries
    the per-query maps alone exceed that, and in r8 they pushed every
    scalar summary field off the front of the capture).  The big
    per-query maps therefore go FIRST and every scalar field (metric/
    value/subtotals/calibration/spread) goes LAST, so the captured
    tail is always the complete scalar summary.  Pinned by
    tests/test_bench_contract.py::test_scalar_summary_survives_tail.
    """
    core_total = round(sum(times[q] for q in CORE if q in times), 3)
    # host-drift-free view: each query in CALIBRATION UNITS (raw time /
    # this run's calibration).  Cross-round regressions read directly
    # off these — no manual host forensics (BENCHNOTES.md §1): a query
    # whose normalized value doubles got slower in real terms no matter
    # what the host was doing that day.
    normalized = {q: round(t / calibration, 3) for q, t in times.items()}
    # cross-ROUND comparable view: same PINNED denominator in every
    # record (see PINNED_CALIBRATION — a per-run denominator made two
    # same-host records disagree by their calibration ratio alone)
    normalized_pinned = {
        q: round(t / PINNED_CALIBRATION, 3) for q, t in times.items()
    }
    # streaming entries priced on both columns: the raw drain total and
    # the steady-state view with the fixed availableNow machinery cost
    # subtracted (clamped at 0; big-map zone — the scalar probe value
    # itself rides the tail)
    stream_adjusted = (
        {
            q: round(max(0.0, t - stream_fixed_overhead), 3)
            for q, t in times.items()
            if q.startswith("st")
        }
        if stream_fixed_overhead is not None
        else {}
    )
    # r13 task 2: per-query burst sentinel — every query's reading is
    # stamped with the host state its best-of-N finished under, so an
    # extended-tier load burst self-diagnoses in THIS record instead of
    # needing cross-record forensics
    suspects = burst_flags(query_probes or {})
    return json.dumps(
        {
            # per-query raw times (big map — sacrificial head)
            "queries": times,
            # per-query ~25 ms micro-probe times (the burst sentinel:
            # one fixed tiny job timed right after each query, outside
            # every timed region) and the 1-min /proc/loadavg read at
            # the same moment — raw evidence for outlier attribution
            "queries_probe": query_probes or {},
            "queries_loadavg": query_loadavg or {},
            # probe > max(2× median probe, median + 50 ms) — read that
            # query's raw with suspicion (see burst_flags)
            "queries_burst_suspect": suspects,
            # per-query times in calibration units (raw/calibration)
            # — compare these across HOSTS; within one host across
            # rounds, prefer queries_normalized_pinned below
            "queries_normalized": normalized,
            # per-query times over the PINNED reference calibration —
            # identical denominator in every record, so cross-round
            # per-query ratios read directly (r12's quiet run sampled
            # calibration 0.081 vs the driver's 0.103 and its per-run
            # normalized column fabricated a ~1.27× "regression")
            "queries_normalized_pinned": normalized_pinned,
            # st-entries with the fixed drain cost subtracted — the
            # steady-state (long-running deployment) pricing column
            "queries_stream_adjusted": stream_adjusted,
            # ---- scalar tail: everything below must survive the
            # ---- driver's 2,000-char capture
            # "value" covers the SAME core set every round (the
            # r1/r2 baseline-comparable number); the round-2+
            # extension queries are timed in "queries" and summed
            # in extended_subtotal/all_total
            "metric": "headline_total",
            "value": core_total,
            "unit": "sec",
            "sf": sf,
            "core_subtotal": core_total,
            "extended_subtotal": round(
                sum(times[q] for q in EXTENDED if q in times), 3
            ),
            "all_total": round(sum(times.values()), 3),
            # host-drift normalizer: divide cross-round query times
            # by the calibration ratio before comparing.
            # "calibration" is the MEDIAN of the interleaved
            # samples; read the samples' spread before trusting a
            # normalized regression (>10% spread = noisy run,
            # judge on raw best-of-N instead)
            "calibration": calibration,
            "calibration_samples": calibration_samples,
            "calibration_spread": spread,
            "core_subtotal_normalized": round(
                sum(normalized[q] for q in CORE if q in normalized), 3
            ),
            # the same core sum over the PINNED denominator (scalar
            # twin of queries_normalized_pinned; survives the tail)
            "pinned_calibration": PINNED_CALIBRATION,
            "core_subtotal_normalized_pinned": round(
                sum(
                    normalized_pinned[q]
                    for q in CORE
                    if q in normalized_pinned
                ),
                3,
            ),
            # r9 verdict "what's wrong" #1: when the spread exceeds the
            # documented 10% gate the normalized numbers are NOT
            # trustworthy — say so IN the record so a reader of the
            # driver capture alone can't mistake host noise for a
            # regression (judge on raw best-of-N / slowest_raw instead)
            "noisy_run": bool(spread > 0.10),
            # r11 task 7: the raw-core self-check against the pinned
            # r8-r11 quiet-host span — a load-inflated run reads false
            # here even when its calibration set happened to sample
            # quiet moments (the r11 A/C case).  Judged on RAW core
            # with +10% headroom; below-span is quiet by definition.
            "quiet_core_span": list(QUIET_CORE_SPAN),
            "core_within_quiet_span": bool(
                core_total <= QUIET_CORE_SPAN[1] * 1.10
            ),
            # r10 task 3: when the first calibration set blew the 10%
            # gate the run re-sampled once and kept the cleaner set —
            # a still-noisy record after a retry is genuine host noise
            "calibration_retried": calibration_retried,
            # when a retry replaced the first set, the ORIGINAL
            # samples stay here: a clean retry set normalizes raws
            # that ran under the load the first set witnessed — read
            # both before trusting a normalized cross-round delta
            "calibration_first_samples": calibration_first_samples,
            # fixed cost of one availableNow drain (stream planning +
            # checkpoint/WAL + listing); steady-state st-entry cost ≈
            # raw − this (full map in queries_stream_adjusted /
            # BENCH_LOCAL.json)
            "stream_fixed_overhead": stream_fixed_overhead,
            # per-flow fixed/marginal split measured by
            # tools/stream_overhead.py on a quiet host (committed
            # artifact; includes the r11 watch-item st18: ~0.8 s fixed
            # + ~1.3 s per micro-batch — the raw drain total is mostly
            # machinery + staging I/O, not operator work)
            "stream_overhead_record": "STREAM_OVERHEAD.json",
            # the COMPLETE record (all maps, never truncated) is
            # written to this repo file every run — read it instead of
            # reconstructing the head of this line (r10 task 2)
            "full_record": "BENCH_LOCAL.json",
            # scalar twin of queries_burst_suspect (tail-safe): how
            # many queries ran with a tripped burst sentinel, and
            # which ones (names only — raws are in slowest_raw /
            # BENCH_LOCAL.json).  0 on a quiet run.
            "burst_suspect_count": sum(suspects.values()),
            "burst_suspects": sorted(
                q for q, s in suspects.items() if s
            )[:10],
            # ...and keep the 10 slowest RAW times in the tail so the
            # record stays self-sufficient even though the full raw
            # "queries" map is sacrificed to the 2,000-char capture
            "slowest_raw": dict(
                sorted(times.items(), key=lambda kv: -kv[1])[:10]
            ),
        }
    )



def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    from qctimeseries_spark.queries import QUERIES
    from qctimeseries_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + the Python worker pool so per-query numbers measure
    # the queries, not session startup (excluded from the reported
    # total).  The mapInPandas no-op forks one pyspark worker per core —
    # without it the first Arrow-batched query pays ~10s of pool
    # spin-up that belongs to the session, not the query.
    import pandas as _pd  # noqa: F401

    def _ident(it):
        yield from it

    cores = spark.sparkContext.defaultParallelism
    spark.range(cores * 10).repartition(cores).mapInPandas(
        _ident, "id long"
    ).write.format("noop").mode("overwrite").save()

    # calibration sampling plan: one DISCARDED warmup probe (codegen +
    # plan compilation for the probe plan itself), then a sample before
    # the first query and one after every `probe_every` queries, so ≥5
    # samples bracket the whole run.  The normalizer is their median.
    # TWO discarded warmups: with one, the first RECORDED sample still
    # ran ~60% high in back-to-back quiet-host runs (0.166/0.167 vs a
    # 0.09-0.12 steady state — JIT/code-cache effects outlive the
    # first probe), which alone pushed calibration_spread to 75-97%
    # and made the spread gate cry wolf.  The MEDIAN was always robust
    # to it; this makes the spread diagnostic meaningful too.
    _calibration_probe(spark)
    _calibration_probe(spark)
    # the burst sentinel's own plan warms separately (different range
    # size ⇒ different codegen) — without this, query #1's micro probe
    # reads JIT compilation and false-flags
    _micro_probe(spark)
    _micro_probe(spark)
    calibration_samples = [round(_calibration_probe(spark), 3)]
    probe_every = max(1, len(HEADLINE) // 4)

    # best-of-N per query: this host sees multi-second external load
    # bursts (measured 10x swings on identical plans); the minimum is
    # the reproducible cost of the query itself.  Repeat up to 5 times
    # but stop early once the two fastest runs agree within 15% — so a
    # noise burst spanning one run can't inflate the number, and a
    # quiet machine pays only 3 runs.  Cache is cleared between queries
    # so DataFrames persisted inside one pipeline (minhash/simhash
    # signature tables) don't accumulate across the run and skew later
    # measurements via memory pressure.
    times: dict[str, float] = {}
    query_probes: dict[str, float] = {}
    query_loadavg: dict[str, float] = {}
    for i, name in enumerate(HEADLINE):
        fn = QUERIES[name]
        runs: list[float] = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            if len(runs) >= 3:
                lo = sorted(runs)
                if lo[1] <= lo[0] * 1.15:
                    break
        times[name] = round(min(runs), 3)
        spark.catalog.clearCache()
        # burst sentinel: stamp the reading with the host state it ran
        # under (outside the timed region — the query's clock stopped
        # above).  ~25 ms micro job + one /proc/loadavg read.
        query_probes[name] = round(_micro_probe(spark), 4)
        query_loadavg[name] = round(os.getloadavg()[0], 2)
        print(f"# {name}: {times[name]}s {[round(r, 2) for r in runs]}"
              f" probe={query_probes[name]} load={query_loadavg[name]}",
              file=sys.stderr)
        if (i + 1) % probe_every == 0:
            calibration_samples.append(round(_calibration_probe(spark), 3))

    if len(calibration_samples) < 3:  # short HEADLINE (e.g. a subset run)
        while len(calibration_samples) < 3:
            calibration_samples.append(round(_calibration_probe(spark), 3))
    # TRIMMED spread: drop the single worst sample before measuring.
    # The first recorded sample runs ~0.165 s vs an 0.08-0.12 steady
    # state on this host EVEN after two discarded warmups (deeper-tier
    # JIT compilation, not first-run cache effects), which pushed the
    # raw max-min spread to 75-99% on provably quiet runs — a
    # diagnostic that always fires distinguishes nothing.  The median
    # normalizer was never affected; the full samples list stays in
    # the record so a genuinely noisy run (several high samples) still
    # shows itself both here and in the raw list.
    def _spread_of(samples: list[float]) -> tuple[float, float]:
        med = round(_median(samples), 3)
        trimmed = sorted(samples)[:-1] or samples
        return med, round((max(trimmed) - min(trimmed)) / med, 3)

    calibration, spread = _spread_of(calibration_samples)
    calibration_retried = False
    first_samples = None
    if spread > 0.10:
        # r10 task 3: 3 of 4 recorded r10 runs were noisy-flagged.  A
        # load burst that lands on one or two samples mid-run does not
        # mean the HOST is still noisy now — re-sample once and keep
        # the cleaner set (the queries' best-of-N already shed bursts).
        # Two noisy sets back-to-back = genuinely noisy; record it.
        retry_samples = [
            round(_calibration_probe(spark), 3) for _ in range(3)
        ]
        retry_cal, retry_spread = _spread_of(retry_samples)
        calibration_retried = True
        print(
            f"# calibration retry: {retry_samples} (spread"
            f" {retry_spread:.1%}) vs first set spread {spread:.1%}",
            file=sys.stderr,
        )
        if retry_spread < spread:
            first_samples = calibration_samples
            calibration_samples = retry_samples
            calibration, spread = retry_cal, retry_spread
    print(
        f"# calibration: median {calibration}s over {calibration_samples}"
        f" (spread {spread:.1%})",
        file=sys.stderr,
    )

    stream_fixed = (
        _stream_fixed_probe(spark)
        if any(q.startswith("st") for q in times)
        else None
    )
    if stream_fixed is not None:
        print(f"# stream fixed overhead: {stream_fixed}s", file=sys.stderr)

    line = result_json(
        times, calibration, calibration_samples, spread, sf,
        stream_fixed_overhead=stream_fixed,
        calibration_retried=calibration_retried,
        calibration_first_samples=first_samples,
        query_probes=query_probes,
        query_loadavg=query_loadavg,
    )
    # the driver captures only the stdout tail; the COMPLETE record
    # (identical JSON, indented) lands in-repo so the full per-query
    # map survives every round (r10 task 2)
    local = Path(__file__).resolve().parent / "BENCH_LOCAL.json"
    local.write_text(json.dumps(json.loads(line), indent=1) + "\n")
    print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
