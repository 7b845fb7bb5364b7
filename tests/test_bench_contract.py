"""Driver-contract pins for the bench record (no Spark needed).

The driver captures only the LAST 2,000 characters of bench.py's one
JSON line (VERDICT r8 "what's wrong" #1: in round 8 the 92-query maps
pushed every scalar summary field off the front of the capture, making
BENCH_r08.json unreadable for raw trend analysis).  These tests pin the
repair: the scalar summary (metric/value/subtotals/calibration/spread)
must always sit inside the final 2,000 characters, no matter how large
the per-query maps grow.
"""

from __future__ import annotations

import json

import bench


def _fake_times(n: int) -> dict[str, float]:
    # worst-case realistic names: long, like "st14_stream_ingest_embedding"
    return {f"q{i:03d}_some_long_operator_name_{i}": 1.234 + i * 0.01
            for i in range(n)}


def test_scalar_summary_survives_tail():
    # 3x the current headline count — the pin must hold as the registry
    # keeps growing, not just at today's 92
    for n in (len(bench.HEADLINE), 3 * len(bench.HEADLINE)):
        out = bench.result_json(
            _fake_times(n), 0.123, [0.11, 0.123, 0.13], 0.163, 0.1
        )
        assert "\n" not in out  # ONE line — the driver contract
        tail = out[-2000:]
        for field in (
            '"metric"', '"value"', '"unit"', '"sf"',
            '"core_subtotal"', '"extended_subtotal"', '"all_total"',
            '"calibration"', '"calibration_samples"',
            '"calibration_spread"', '"core_subtotal_normalized"',
            '"noisy_run"', '"slowest_raw"', '"calibration_retried"',
            '"stream_fixed_overhead"', '"full_record"',
            '"pinned_calibration"', '"core_subtotal_normalized_pinned"',
        ):
            assert field in tail, (
                f"scalar field {field} fell outside the driver's "
                f"2,000-char tail capture at n={n} — big maps must "
                f"stay FIRST in bench.result_json"
            )


def test_noisy_run_flag_and_slowest_raw():
    """r9 verdict tasks: a spread past the 10% gate must self-describe
    as noisy IN the record, and the 10 slowest RAW times must ride the
    scalar tail so the driver capture is self-sufficient."""
    times = _fake_times(100)
    noisy = json.loads(bench.result_json(times, 0.123, [0.1, 0.2], 0.486, 0.1))
    quiet = json.loads(bench.result_json(times, 0.123, [0.1, 0.11], 0.05, 0.1))
    assert noisy["noisy_run"] is True
    assert quiet["noisy_run"] is False
    slowest = noisy["slowest_raw"]
    assert len(slowest) == 10
    assert set(slowest.values()) == set(
        sorted(times.values(), reverse=True)[:10]
    )
    # raw values, not normalized
    assert all(slowest[k] == times[k] for k in slowest)
    # and the whole map sits inside the captured tail
    raw = bench.result_json(times, 0.123, [0.1, 0.2], 0.486, 0.1)
    assert '"slowest_raw"' in raw[-2000:]


def test_result_json_values():
    times = {q: 1.0 for q in bench.CORE} | {q: 2.0 for q in bench.EXTENDED}
    rec = json.loads(bench.result_json(times, 0.5, [0.5], 0.0, 0.01))
    assert rec["metric"] == "headline_total"
    assert rec["value"] == rec["core_subtotal"] == float(len(bench.CORE))
    assert rec["extended_subtotal"] == 2.0 * len(bench.EXTENDED)
    assert rec["all_total"] == rec["core_subtotal"] + rec["extended_subtotal"]
    # normalized = raw / calibration
    assert rec["queries_normalized"][bench.CORE[0]] == 2.0
    assert rec["core_subtotal_normalized"] == 2.0 * len(bench.CORE)
    # pinned view = raw / PINNED_CALIBRATION, a CONSTANT denominator —
    # two records with different per-run calibration samples must
    # agree in this column whenever their raws agree (VERDICT r12
    # task 2: r12's 0.081-vs-0.103 denominators fabricated a ~1.27×
    # cross-record "regression")
    assert rec["pinned_calibration"] == bench.PINNED_CALIBRATION
    exp = round(1.0 / bench.PINNED_CALIBRATION, 3)
    assert rec["queries_normalized_pinned"][bench.CORE[0]] == exp
    rec_other_cal = json.loads(
        bench.result_json(times, 0.081, [0.081], 0.0, 0.01)
    )
    assert (
        rec_other_cal["queries_normalized_pinned"]
        == rec["queries_normalized_pinned"]
    )
    assert (
        rec_other_cal["core_subtotal_normalized_pinned"]
        == rec["core_subtotal_normalized_pinned"]
    )
    assert rec["sf"] == 0.01
    # headline set and registry window stay disjoint concerns, but the
    # bench must never time a query that the registry no longer exports
    from qctimeseries_spark.queries import QUERIES

    missing = [q for q in bench.HEADLINE if q not in QUERIES]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"


def test_stream_adjusted_pricing_and_tail_survival():
    """r10 task 6: streaming entries priced on both columns — the raw
    drain total stays in "queries", the steady-state view (raw minus
    the fixed availableNow machinery cost, clamped at 0) lands in
    "queries_stream_adjusted", and the scalar probe value itself rides
    the 2,000-char tail."""
    times = _fake_times(150) | {
        "st12_stream_ingest_dedup": 4.0,
        "st21_stream_stream_join": 7.06,
        "st16_stream_heavyhitters": 0.3,
    }
    out = bench.result_json(
        times, 0.123, [0.11, 0.123, 0.13], 0.05, 0.1,
        stream_fixed_overhead=0.5, calibration_retried=True,
    )
    rec = json.loads(out)
    adj = rec["queries_stream_adjusted"]
    assert adj["st12_stream_ingest_dedup"] == 3.5
    assert adj["st21_stream_stream_join"] == 6.56
    assert adj["st16_stream_heavyhitters"] == 0.0  # clamped
    assert set(adj) == {k for k in times if k.startswith("st")}
    assert rec["stream_fixed_overhead"] == 0.5
    assert rec["calibration_retried"] is True
    assert rec["full_record"] == "BENCH_LOCAL.json"
    assert rec["calibration_first_samples"] is None  # not passed here
    tail = out[-2000:]
    assert '"stream_fixed_overhead"' in tail
    assert '"calibration_retried"' in tail
    # without a probe the map is empty and the scalar is null
    rec2 = json.loads(
        bench.result_json(times, 0.123, [0.11], 0.05, 0.1)
    )
    assert rec2["queries_stream_adjusted"] == {}
    assert rec2["stream_fixed_overhead"] is None


def test_burst_sentinel_maps_and_tail():
    """VERDICT r13 task 2: per-query burst sentinel.  The probe and
    loadavg maps ride the sacrificial head; the suspect COUNT and the
    suspect names ride the 2,000-char tail so the driver capture alone
    attributes outliers.  The flag gate is 2× the median probe with a
    50 ms floor (scheduler jitter on a ~25 ms job must not trip it)."""
    times = _fake_times(150)
    probes = {q: 0.025 for q in times}
    loads = {q: 0.4 for q in times}
    # one burst-hit segment: 6 queries with 4-20x probe readings
    hit = sorted(times)[40:46]
    for q in hit:
        probes[q] = 0.25
    out = bench.result_json(
        times, 0.123, [0.11, 0.123, 0.13], 0.05, 0.1,
        query_probes=probes, query_loadavg=loads,
    )
    rec = json.loads(out)
    assert rec["queries_probe"] == probes
    assert rec["queries_loadavg"] == loads
    sus = rec["queries_burst_suspect"]
    assert all(sus[q] for q in hit)
    assert not any(sus[q] for q in times if q not in hit)
    assert rec["burst_suspect_count"] == len(hit)
    assert rec["burst_suspects"] == sorted(hit)
    tail = out[-2000:]
    assert '"burst_suspect_count"' in tail
    assert '"burst_suspects"' in tail
    # jitter below the 50 ms floor never flags, even at 2x median
    calm = bench.burst_flags({"a": 0.02, "b": 0.021, "c": 0.045})
    assert not any(calm.values())
    # records built without sentinel data (subset runs, old tests)
    # stay valid: empty maps, zero count
    rec2 = json.loads(
        bench.result_json(times, 0.123, [0.11], 0.05, 0.1)
    )
    assert rec2["queries_probe"] == {}
    assert rec2["queries_burst_suspect"] == {}
    assert rec2["burst_suspect_count"] == 0


def test_calibration_first_samples_preserved():
    """When a retry replaced the first calibration set, the original
    samples must survive in the record — a clean retry set normalizes
    raws that ran under the load the first set witnessed, and without
    it a reader can't tell load-inflated raw from real regression."""
    out = bench.result_json(
        _fake_times(20), 0.068, [0.068, 0.066, 0.084], 0.029, 0.1,
        calibration_retried=True,
        calibration_first_samples=[0.166, 0.07, 0.132, 0.068, 0.071],
    )
    rec = json.loads(out)
    assert rec["calibration_first_samples"] == [0.166, 0.07, 0.132,
                                                0.068, 0.071]
    assert '"calibration_first_samples"' in out[-2000:]
