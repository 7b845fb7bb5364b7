"""Property/metamorphic checks mirroring the reference's runtime
invariants (SURVEY.md §5): the warnings inside ``qc_progress``
(``R/qc_summary.R:51-66``) promoted to generated-input laws, plus the
update-vocabulary guarantees the reference relies on implicitly.

Laws under random series + random U-op sequences:

1. A2: after ``add_flags``, #NULL values == #(flag == -1), and this
   survives every U-op (the -1 guard).
2. A3: flags stay inside {-2, -1, 0, 1}.
3. Guard: a row that starts at -1 is still -1 after any op sequence,
   and no non-NULL row ever becomes -1.
4. Idempotency: every U-op applied twice == applied once.
5. U5 ∘ A1: after reset_all, pct_unchecked + pct_missing == 100.
6. W3 monotonicity: growing the include-set never shrinks the admitted
   window set.
7. P4 vs P5: apply_flags masks exactly flag < 0; the strict plot
   variant masks exactly flag < 1.
8. F2: rowid is a dense 1..n permutation consistent with time order.

Hypothesis drives the data shapes; examples are kept small and few
because every example is a full Spark job (deadline disabled — JVM
scheduling jitter would flake time-based limits).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from qctimeseries_spark import (
    add_flags,
    apply_flags,
    approve_window,
    assign_windows,
    admitted_windows,
    flag_and_approve_window,
    flag_window,
    progress,
    reset_all,
    reset_window,
    set_flag,
    strict_clean,
    with_rowid,
)

T0 = dt.datetime(2024, 1, 1)

# value series: None (missing) or a small float; length 8-40 keeps each
# example one fast Spark job while still crossing window boundaries
values_st = st.lists(
    st.one_of(st.none(), st.floats(-50, 50, allow_nan=False)),
    min_size=8,
    max_size=40,
)

# an op is (kind, window_or_ids); windows 0-2 exist for hourly data
# bucketed at 12h with ≤40 rows
ops_st = st.lists(
    st.one_of(
        st.tuples(st.just("flag_window"), st.integers(0, 2)),
        st.tuples(st.just("approve_window"), st.integers(0, 2)),
        st.tuples(st.just("reset_window"), st.integers(0, 2)),
        st.tuples(st.just("reset_all"), st.just(0)),
        st.tuples(
            st.just("set_sel"),
            st.lists(st.integers(1, 40), min_size=1, max_size=6),
        ),
        st.tuples(
            st.just("u6"),
            st.lists(st.integers(1, 40), min_size=1, max_size=6),
        ),
    ),
    min_size=0,
    max_size=3,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _series(spark, values):
    rows = [(T0 + dt.timedelta(hours=i), v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "DateTime timestamp, temp double")
    df = with_rowid(add_flags(df, ["temp"]), "DateTime")
    return assign_windows(df, "DateTime", hours=12)


def _apply(df, op):
    kind, arg = op
    if kind == "flag_window":
        return flag_window(df, "temp", arg)
    if kind == "approve_window":
        return approve_window(df, "temp", arg)
    if kind == "reset_window":
        return reset_window(df, "temp", arg)
    if kind == "reset_all":
        return reset_all(df, "temp")
    if kind == "set_sel":
        return set_flag(df, "temp", -2, selection=arg)
    if kind == "u6":
        return flag_and_approve_window(df, "temp", 0, arg)
    raise AssertionError(kind)


@given(values=values_st, ops=ops_st)
@SETTINGS
def test_invariants_hold_under_op_sequences(spark, values, ops):
    df = _series(spark, values)
    start = {r.rowid: r.temp_qcflag for r in df.collect()}
    for op in ops:
        df = _apply(df, op)
    rows = df.collect()
    flags = {r.rowid: r.temp_qcflag for r in rows}
    # A3: domain
    assert set(flags.values()) <= {-2, -1, 0, 1}
    # A2 + guard: -1 iff value NULL, preserved through every op
    for r in rows:
        if r.temp is None:
            assert r.temp_qcflag == -1
        else:
            assert r.temp_qcflag != -1
    # untouched start state only transitions via ops (sanity: same keys)
    assert set(flags) == set(start)


@given(values=values_st, op=ops_st.filter(lambda o: len(o) == 1).map(lambda o: o[0]))
@SETTINGS
def test_updates_idempotent(spark, values, op):
    df = _series(spark, values)
    once = sorted(
        (r.rowid, r.temp_qcflag) for r in _apply(df, op).collect()
    )
    twice = sorted(
        (r.rowid, r.temp_qcflag) for r in _apply(_apply(df, op), op).collect()
    )
    assert once == twice


@given(values=values_st)
@SETTINGS
def test_reset_all_progress_sums_to_100(spark, values):
    df = flag_window(_series(spark, values), "temp", 0)
    out = progress(reset_all(df, "temp"), ["temp"]).collect()[0]
    # each pct is INDEPENDENTLY rounded to 2 dp (the reference's F9
    # rounding), so two buckets can sum to 100.01 when both halves
    # round up (hypothesis found 66.665/33.335) — the invariant the
    # semantics actually give is 100 ± one ulp per rounded bucket
    assert out.pct_unchecked + out.pct_missing == pytest.approx(
        100.0, abs=0.011
    )
    assert out.pct_approved == 0.0 and out.pct_flagged == 0.0


@given(values=values_st, ids=st.lists(st.integers(1, 40), min_size=1, max_size=8))
@SETTINGS
def test_admission_monotone_in_include_set(spark, values, ids):
    df = set_flag(_series(spark, values), "temp", -2, selection=ids)
    small = {r.win_id for r in admitted_windows(df, "temp", include=(0,)).collect()}
    grown = {
        r.win_id
        for r in admitted_windows(df, "temp", include=(0, 1, -2)).collect()
    }
    assert small <= grown


@given(values=values_st, ids=st.lists(st.integers(1, 40), min_size=1, max_size=8))
@SETTINGS
def test_mask_semantics_p4_vs_p5(spark, values, ids):
    df = approve_window(
        set_flag(_series(spark, values), "temp", -2, selection=ids), "temp", 0
    )
    joined = (
        df.select("rowid", "temp", "temp_qcflag")
        .join(
            apply_flags(df, ["temp"]).select(
                "rowid", F.col("temp").alias("p4")
            ),
            "rowid",
        )
        .join(
            strict_clean(df, ["temp"]).select(
                "rowid", F.col("temp").alias("p5")
            ),
            "rowid",
        )
        .collect()
    )
    for r in joined:
        assert (r.p4 is None) == (r.temp_qcflag < 0 or r.temp is None)
        assert (r.p5 is None) == (r.temp_qcflag < 1 or r.temp is None)


@given(
    lhours=st.lists(st.integers(0, 48), min_size=1, max_size=12, unique=True),
    rhours=st.lists(st.integers(0, 48), min_size=1, max_size=6, unique=True),
)
@SETTINGS
def test_asof_join_matches_pandas_merge_asof(spark, lhours, rhours):
    """Law: asof_join == pandas merge_asof(direction='backward') on a
    single key — pandas is the semantics oracle for random timestamps,
    including exact-tie matching."""
    import pandas as pd

    from qctimeseries_spark.joins import asof_join

    left = spark.createDataFrame(
        [(i, 1, T0 + dt.timedelta(hours=h)) for i, h in enumerate(lhours)],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, T0 + dt.timedelta(hours=h), float(h)) for h in rhours],
        "k long, ts timestamp, payload double",
    )
    got = {
        r.event_id: r.r_payload
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    lp = pd.DataFrame(
        {"event_id": range(len(lhours)),
         "ts": [T0 + dt.timedelta(hours=h) for h in lhours]}
    ).sort_values("ts")
    rp = pd.DataFrame(
        {"ts": [T0 + dt.timedelta(hours=h) for h in sorted(rhours)],
         "payload": [float(h) for h in sorted(rhours)]}
    )
    want = pd.merge_asof(lp, rp, on="ts", direction="backward")
    for _, row in want.iterrows():
        expect = None if pd.isna(row.payload) else row.payload
        assert got[row.event_id] == expect


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0, max_size=15,
    )
)
@SETTINGS
def test_dup_clusters_valid_partition(spark, edges):
    """Laws: every cluster_id is the minimum member of its cluster;
    every edge's endpoints share a cluster; node set is preserved."""
    from qctimeseries_spark.datapipe.dedup import dup_clusters

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = dup_clusters(pairs).collect()
    label = {r.id: r.cluster_id for r in rows}
    nodes = {n for e in edges for n in e}
    assert set(label) == nodes
    for a, b in edges:
        assert label[a] == label[b]  # connected ⇒ same cluster
    by_cluster: dict[int, list[int]] = {}
    for n, c in label.items():
        by_cluster.setdefault(c, []).append(n)
    for c, members in by_cluster.items():
        assert c == min(members)


@given(values=values_st)
@SETTINGS
def test_rowid_dense_time_ordered(spark, values):
    rows = _series(spark, values).select("DateTime", "rowid").collect()
    ids = sorted(r.rowid for r in rows)
    assert ids == list(range(1, len(values) + 1))
    by_id = sorted(rows, key=lambda r: r.rowid)
    times = [r.DateTime for r in by_id]
    assert times == sorted(times)


def test_curate_quality_threshold_monotone(spark):
    """Raising quality_min can only shrink the curated set, and every
    curated id is an input id."""
    from pyspark.sql import types as T

    from qctimeseries_spark.datapipe import curate_corpus

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(5 + i % 20)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    prev = set(range(40))
    for qmin in (0.0, 0.5, 0.8, 1.01):
        ids = {
            r["doc_id"]
            for r in curate_corpus(docs, None, quality_min=qmin)
            .select("doc_id")
            .collect()
        }
        assert ids <= prev  # monotone shrink
        assert ids <= set(range(40))
        prev = ids
    assert prev == set()  # nothing clears quality > 1


@given(
    hours=st.lists(
        st.integers(0, 400), min_size=2, max_size=40, unique=True
    ),
    alpha_pct=st.integers(5, 95),
)
@SETTINGS
def test_ewma_block_fold_matches_sequential(spark, hours, alpha_pct):
    """Law: the affine block fold equals the plain sequential recurrence
    for arbitrary irregular timestamps and alphas (block boundaries
    land anywhere relative to the data)."""
    import datetime as dt

    from qctimeseries_spark.windows import ewma

    alpha = alpha_pct / 100.0
    t0 = dt.datetime(2024, 1, 1)
    hs = sorted(hours)
    vals = [float((h * 31) % 97) for h in hs]
    df = spark.createDataFrame(
        [(t0 + dt.timedelta(hours=h), v) for h, v in zip(hs, vals)],
        "ts timestamp, value double",
    )
    got = {
        r["ts"]: r["value_ewma"]
        for r in ewma(df, "ts", "value", alpha=alpha, block_hours=48.0).collect()
    }
    s = None
    for h, v in zip(hs, vals):
        s = v if s is None else alpha * v + (1 - alpha) * s
        assert abs(got[t0 + dt.timedelta(hours=h)] - round(s, 6)) < 2e-6


@given(
    hours=st.lists(st.integers(0, 300), min_size=1, max_size=30, unique=True),
    step=st.sampled_from([30, 60, 180, 360]),
)
@SETTINGS
def test_regularize_grid_laws(spark, hours, step):
    """Laws: the grid spans exactly [min, max] at the step cadence;
    every observation lands on its instant with is_gap=0; every other
    grid row is a NULL gap."""
    import datetime as dt

    from qctimeseries_spark.windows import regularize

    t0 = dt.datetime(2024, 1, 1)
    hs = sorted(hours)
    df = spark.createDataFrame(
        [(t0 + dt.timedelta(hours=h), float(h)) for h in hs],
        "ts timestamp, value double",
    )
    out = regularize(df, "ts", step_minutes=float(step)).collect()
    span_min = (hs[-1] - hs[0]) * 60
    assert len(out) == span_min // step + 1
    by_ts = {r["grid_ts"]: r for r in out}
    for h in hs:
        ts = t0 + dt.timedelta(hours=h)
        if (h - hs[0]) * 60 % step == 0:  # on-grid observation
            assert by_ts[ts]["value"] == float(h)
            assert by_ts[ts]["is_gap"] == 0
    n_obs_on_grid = sum(
        1 for h in hs if (h - hs[0]) * 60 % step == 0
    )
    assert sum(r["is_gap"] for r in out) == len(out) - n_obs_on_grid


@given(
    n=st.integers(1, 60),
    step=st.sampled_from([60, 720, 1440]),
)
@SETTINGS
def test_resample_conserves_counts_and_bounds(spark, n, step):
    """Laws: bucket counts sum to the row count; per-bucket min ≤ avg ≤
    max; bucket starts are step-aligned."""
    import datetime as dt

    from qctimeseries_spark import resample

    t0 = dt.datetime(2024, 1, 3, 7, 13)
    df = spark.createDataFrame(
        [(t0 + dt.timedelta(minutes=37 * i), float((i * 11) % 23))
         for i in range(n)],
        "ts timestamp, value double",
    )
    out = resample(
        df, "ts", step_minutes=float(step),
        aggs={"value": ["avg", "min", "max", "count"]},
    ).collect()
    assert sum(r["value_count"] for r in out) == n
    for r in out:
        assert r["value_min"] <= r["value_avg"] <= r["value_max"]
        assert (r["bucket_ts"].timestamp() * 1000) % (step * 60 * 1000) == 0


@given(
    bw=st.integers(1, 5),
    bh=st.integers(1, 4),
    data=st.data(),
)
@SETTINGS
def test_jpeg_codec_roundtrip_property(bw, bh, data):
    """Law: encode → decode reconstructs every block's 128+qdc pixels
    exactly, for any block grid and any legal DC sequence (the encoder
    is pure Python — no Spark session involved)."""
    from qctimeseries_spark.datapipe.multimodal import (
        decode_jpeg,
        encode_jpeg_dc,
    )

    nb = bw * bh
    qdcs = data.draw(
        st.lists(st.integers(-16, 15), min_size=nb, max_size=nb)
    )
    payload = encode_jpeg_dc(bw * 8, bh * 8, qdcs)
    dec = decode_jpeg(payload)
    assert (dec["width"], dec["height"]) == (bw * 8, bh * 8)
    px = dec["pixels"]
    assert len(px) == bw * 8 * bh * 8
    for b, q in enumerate(qdcs):
        by, bx = divmod(b, bw)
        block = [
            px[(by * 8 + y) * bw * 8 + bx * 8 + x]
            for y in range(8)
            for x in range(8)
        ]
        want = max(0, min(255, 128 + q))
        assert block == [want] * 64, (b, q)


# ---------------------------------------------------------------------------
# round-8 continuation laws: chunking tiles, packing is a tiling of the
# concatenated stream
# ---------------------------------------------------------------------------


@given(
    ns=st.lists(st.integers(min_value=0, max_value=90), min_size=1,
                max_size=6),
    chunk=st.integers(min_value=2, max_value=40),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@SETTINGS
def test_chunk_documents_tiling_laws(spark, ns, chunk, overlap_frac):
    """For ANY doc lengths and (chunk_tokens, overlap): every token
    position is covered, every chunk is the verbatim token slice at
    its start, chunk_ids are dense from 0, and consecutive chunks
    advance by exactly the stride."""
    from qctimeseries_spark.datapipe.text import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(n)))
        for i, n in enumerate(ns)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(
        df, chunk_tokens=chunk, overlap=overlap
    ).collect()
    toks = {i: rows[i][1].split(" ") if ns[i] else [] for i in range(len(ns))}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(ns):
        rs = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rs] == list(range(len(rs)))
        covered = set()
        for r in rs:
            want = toks[i][r.start_token - 1: r.start_token - 1 + chunk]
            assert r.chunk == " ".join(want)
            assert r.n_chunk_tokens == len(want)
            covered.update(
                range(r.start_token, r.start_token + r.n_chunk_tokens)
            )
        assert covered == set(range(1, n + 1))
        for a, b in zip(rs, rs[1:]):
            assert b.start_token - a.start_token == stride


@given(
    ns=st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=8),
    ctx=st.integers(min_value=1, max_value=64),
)
@SETTINGS
def test_pack_sequences_tiling_laws(spark, ns, ctx):
    """Packing is the tiling of the concatenated token stream: offsets
    are the exclusive prefix sum in key order, seq_first/last are the
    floor-divided window ids of the doc's first/last token, and
    crosses_boundary <=> the doc spans more than one window."""
    from qctimeseries_spark.datapipe.sample import pack_sequences

    rows = [(i, n) for i, n in enumerate(ns)]
    df = spark.createDataFrame(rows, "doc long, n long")
    out = {
        r.doc: r
        for r in pack_sequences(
            df, "n", key_col="doc", ctx_len=ctx
        ).collect()
    }
    off = 0
    for i, n in enumerate(ns):
        r = out[i]
        assert r.start_offset == off
        assert r.seq_first == off // ctx
        if n > 0:
            assert r.seq_last == (off + n - 1) // ctx
        else:
            assert r.seq_last == r.seq_first
        assert r.crosses_boundary == (r.seq_last > r.seq_first)
        off += n


# scores quantize to 3 dp so ties actually occur (the tie-break path
# is the risky one for rank equality); ids are dense ints
_topk_pool = st.lists(
    st.integers(0, 999), min_size=1, max_size=60, unique=True
).flatmap(
    lambda ids: st.tuples(
        st.just(ids),
        st.lists(
            st.integers(0, 50), min_size=len(ids), max_size=len(ids)
        ),
        st.integers(1, 2),   # number of query groups
        st.integers(1, 8),   # k
        st.integers(1, 5),   # shard count (1 == the single-window plan)
    )
)


@given(pool=_topk_pool)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_topk_exact_law_sharded_equals_single_window(spark, pool):
    """9. _topk_exact law (VERDICT r8 task 4): for ANY pool, any k,
    and any shard count, the two-phase sharded top-k is row- and
    RANK-identical to the one-window formulation — including ties on
    the score (broken by id) and pools smaller than k.  The planted
    hot-cell test covers the scale shape; this is the exactness law
    the inclusion argument claims for all inputs."""
    from pyspark.sql import Window

    from qctimeseries_spark.datapipe.similarity import _topk_exact

    ids, scores, nq, k, shards = pool
    rows = [
        (q, i, s / 10.0)
        for q in range(nq)
        for i, s in zip(ids, scores)
    ]
    df = spark.createDataFrame(
        rows, "query_id int, neighbor_id int, cos double"
    ).repartition(3)
    order = [F.col("cos").desc(), F.col("neighbor_id")]
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cos)
        for r in _topk_exact(df, k, order, shards=shards).collect()
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    want = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cos)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# round-10 continuation laws: nearest_join and containment
# ---------------------------------------------------------------------------

_nj_left_st = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 500)),  # (key, minute)
    min_size=1, max_size=12,
)
_nj_right_st = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 500)),
    min_size=0, max_size=8,
)


@given(left=_nj_left_st, right=_nj_right_st)
@SETTINGS
def test_nearest_join_matches_brute_force_model(spark, left, right):
    """nearest_join == the brute-force model: per key, the right
    record minimizing |Δt|, exact ties resolved to the EARLIER
    record; keys with no right rows give NULL."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    t = lambda m: base + dt.timedelta(minutes=m)
    from qctimeseries_spark.joins import nearest_join

    ldf = spark.createDataFrame(
        [(i, k, t(m)) for i, (k, m) in enumerate(left)],
        "event_id long, k long, ts timestamp",
    )
    # right unique per (k, ts) — the documented contract
    rrows = sorted({(k, m) for k, m in right})
    rdf = spark.createDataFrame(
        [(k, t(m), float(k * 1000 + m)) for k, m in rrows],
        "k long, ts timestamp, payload double",
    ) if rrows else spark.createDataFrame(
        [], "k long, ts timestamp, payload double"
    )
    got = {
        r.event_id: r.r_payload
        for r in nearest_join(ldf, rdf, on="ts", by="k").collect()
    }

    def model(k, m):
        cands = [(abs(rm - m), rm) for rk, rm in rrows if rk == k]
        if not cands:
            return None
        d, rm = min(cands)  # tie -> smaller rm == earlier record
        return float(k * 1000 + rm)

    want = {i: model(k, m) for i, (k, m) in enumerate(left)}
    assert got == want


_ct_docs_st = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30), min_size=2, max_size=5
)


@given(texts=_ct_docs_st)
@SETTINGS
def test_containment_equals_exact_set_arithmetic(spark, texts):
    """containment_on == exact shingle-set arithmetic on every pair,
    and containment_x >= jaccard always (the dilution inequality)."""
    from qctimeseries_spark.datapipe import containment_on, jaccard_on

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(a, b) for a in range(len(texts)) for b in range(len(texts))
         if a < b],
        "id_a long, id_b long",
    )
    out = {(r.id_a, r.id_b): r for r in
           containment_on(pairs, docs, ngram=2).collect()}
    jac = {(r.id_a, r.id_b): r.jaccard for r in
           jaccard_on(pairs, docs, ngram=2).collect()}

    def grams(s):
        # mirror dedup.shingles: lowercase whitespace tokens, <n tokens
        # -> ONE whole-text shingle (an empty doc shingles to {""})
        toks = s.lower().split()
        if len(toks) < 2:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)}

    for (a, b), r in out.items():
        ga, gb = grams(texts[a]), grams(texts[b])
        assert r.n_a == len(ga) and r.n_b == len(gb)
        inter = len(ga & gb)
        if ga:
            assert r.containment_a == pytest.approx(inter / len(ga), abs=1e-6)
            assert r.containment_a >= jac[(a, b)] - 1e-9
        if gb:
            assert r.containment_b == pytest.approx(inter / len(gb), abs=1e-6)
            assert r.containment_b >= jac[(a, b)] - 1e-9


_trend_series_st = st.lists(
    st.tuples(st.integers(0, 10_000),          # second offset
              st.integers(-50_000, 50_000)),   # value in cents
    min_size=2, max_size=12,
).filter(lambda xs: len({s for s, _ in xs}) >= 2)  # den != 0 needs 2 distinct x


@given(series=_trend_series_st)
@SETTINGS
def test_a18_trend_equals_numpy_least_squares(spark, series):
    """The exact-integer OLS machinery is not just cross-engine
    consistent — it must equal an independent float least-squares fit
    (numpy lstsq) to within float tolerance on generated series."""
    import datetime as dt

    import numpy as np

    from qctimeseries_spark.queries import q_a18_trend

    # build an events-shaped table for ONE user; route through the
    # registered query by monkey-free construction: replicate its body
    # via the same public pieces — simplest is to call the query on a
    # temp view? q_a18 reads parquet; instead test the formula through
    # a direct frame using the same expressions.
    from pyspark.sql import functions as F  # noqa: F811

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 7, base + dt.timedelta(seconds=s), c / 100.0)
        for i, (s, c) in enumerate(series)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("_us"),
        (F.col("value").cast("decimal(18,2)") * F.lit(100))
        .cast("decimal(20,0)")
        .alias("_y"),
    )
    mins = ev.groupBy("user_id").agg(F.min("_us").alias("_us0"))
    b = ev.join(mins, "user_id").select(
        "user_id",
        (F.col("_us") - F.col("_us0")).cast("decimal(20,0)").alias("_x"),
        "_y",
    )
    s_ = b.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("_n"),
        F.sum("_x").alias("_sx"), F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    got = s_.select(
        ((num.cast("double") / den.cast("double")) * F.lit(10000.0))
        .alias("slope_per_sec")
    ).collect()[0].slope_per_sec

    xs = np.array([s for s, _ in series], dtype=float) * 1e6  # µs
    xs -= xs.min()
    ys = np.array([c for _, c in series], dtype=float)        # cents
    a = np.vstack([xs, np.ones_like(xs)]).T
    slope_cents_per_us = np.linalg.lstsq(a, ys, rcond=None)[0][0]
    want = slope_cents_per_us * 1e4  # value-units per second
    assert got == pytest.approx(want, rel=1e-6, abs=1e-9)


_twa_obs_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=179),   # minute offset
        st.integers(min_value=-9999, max_value=9999),  # value in cents
    ),
    min_size=1,
    max_size=12,
)


@given(obs=_twa_obs_st)
@SETTINGS
def test_time_weighted_resample_matches_python_model(spark, obs):
    """time_weighted_resample == a pure-python exact model: per
    60-min bucket, sum(value_cents * held_us) / sum(held_us) / 100
    with each value held until the next observation in the bucket
    (bucket end for the last), ties by event_id giving the earlier
    row zero weight."""
    import datetime as dt

    from qctimeseries_spark.windows import time_weighted_resample

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=m), cents / 100.0)
        for i, (m, cents) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    )
    got = {
        r.bucket_ts: (r.n_obs, r.twa_value)
        for r in time_weighted_resample(
            df, "ts", "value", step_minutes=60.0, ties=["event_id"]
        ).collect()
    }

    step_us = 60 * 60 * 1_000_000
    buckets: dict[int, list[tuple[int, int]]] = {}
    for i, (m, cents) in enumerate(obs):
        us = m * 60 * 1_000_000
        buckets.setdefault(us // step_us, []).append((us, i, cents))
    want = {}
    for bk, items in buckets.items():
        items.sort(key=lambda t: (t[0], t[1]))
        num = den = 0
        for j, (us, _i, cents) in enumerate(items):
            nxt = items[j + 1][0] if j + 1 < len(items) else (bk + 1) * step_us
            w = nxt - us
            num += cents * w
            den += w
        want[base + dt.timedelta(hours=bk)] = (
            len(items),
            round(num / den / 100.0, 9),
        )
    assert got == want


_funnel_events_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=500),    # minute offset
        st.sampled_from(["signup", "click", "purchase", "view"]),
    ),
    min_size=0,
    max_size=25,
)


@given(events=_funnel_events_st,
       horizon_min=st.one_of(st.none(), st.integers(60, 300)))
@SETTINGS
def test_funnel_matches_ordered_python_model(spark, events, horizon_min):
    """funnel == the brute model: stage k's time is the MIN event of
    its type STRICTLY after stage k-1's time (within the optional
    horizon); users counted per deepest ordered stage reached."""
    import datetime as dt

    from qctimeseries_spark.events import funnel

    base = dt.datetime(2024, 1, 1)
    stages = ["signup", "click", "purchase"]
    rows = [
        (i, u, base + dt.timedelta(minutes=m), ty)
        for i, (u, m, ty) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    horizon_s = horizon_min * 60.0 if horizon_min is not None else None
    got = {
        r.stage_idx: r.n_users
        for r in funnel(df, stages, horizon_seconds=horizon_s).collect()
    }

    per_user: dict[int, list[int]] = {}
    for u, m, ty in events:
        per_user.setdefault(u, []).append((m, ty))
    counts = [0, 0, 0]
    for u, evs in per_user.items():
        t_prev = None
        for k, stage in enumerate(stages):
            cands = [
                m for m, ty in evs
                if ty == stage
                and (k == 0 or (
                    m > t_prev
                    and (horizon_min is None or m <= t_prev + horizon_min)
                ))
            ]
            if not cands:
                break
            t_prev = min(cands)
            counts[k] += 1
    want = {k: c for k, c in enumerate(counts)}
    assert got == want


_ret_events_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # user
        st.integers(min_value=0, max_value=40),    # day offset
    ),
    min_size=1,
    max_size=20,
)


@given(events=_ret_events_st)
@SETTINGS
def test_retention_matches_python_model(spark, events):
    """retention_cohorts == the brute model: cohort = epoch-anchored
    period of the user's first event; n_active counts cohort users
    with any activity at offset k; k=0 always equals the cohort."""
    import datetime as dt

    from qctimeseries_spark.events import retention_cohorts

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(days=d), "view")
        for i, (u, d) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r.cohort_ts, r.period_k): (r.n_active, r.n_cohort)
        for r in retention_cohorts(
            df, period_days=7.0, max_periods=4
        ).collect()
    }

    week_us = 7 * 86400 * 1_000_000
    epoch = dt.datetime(1970, 1, 1)

    def period(d):
        return (
            int((base + dt.timedelta(days=d) - epoch).total_seconds())
            * 1_000_000
        ) // week_us

    first: dict[int, int] = {}
    active: set[tuple[int, int]] = set()
    for u, d in events:
        pp = period(d)
        first[u] = min(first.get(u, pp), pp)
        active.add((u, pp))
    want: dict[tuple, list] = {}
    for u, p0 in first.items():
        for (au, ap) in active:
            if au == u and 0 <= ap - p0 < 4:
                key = (epoch + dt.timedelta(microseconds=p0 * week_us),
                       ap - p0)
                want.setdefault(key, [0, 0])[0] += 1
    cohort_sizes: dict = {}
    for u, p0 in first.items():
        cohort_sizes[p0] = cohort_sizes.get(p0, 0) + 1
    for (cts, k), v in want.items():
        p0 = (int((cts - epoch).total_seconds()) * 1_000_000) // week_us
        v[1] = cohort_sizes[p0]
    assert got == {k: tuple(v) for k, v in want.items()}


_attr_events_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=200),    # minute offset
        st.sampled_from(["signup", "click", "purchase", "view"]),
    ),
    min_size=0,
    max_size=25,
)


@given(events=_attr_events_st,
       mode=st.sampled_from(["first", "last"]),
       lookback_min=st.one_of(st.none(), st.integers(30, 120)))
@SETTINGS
def test_attribution_matches_python_model(spark, events, mode,
                                          lookback_min):
    """attribution == the brute model: per conversion, elect among
    strictly-earlier in-lookback touches by lexicographic
    (time, event_id) — max for last-touch, min for first-touch; no
    qualifying touch yields the NULL-touch row."""
    import datetime as dt

    from qctimeseries_spark.events import attribution

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(minutes=m), ty)
        for i, (u, m, ty) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    lookback_s = lookback_min * 60.0 if lookback_min is not None else None
    got = {
        r.event_id: (r.touch_type, r.touch_ts, r.lag_us)
        for r in attribution(
            df, conversion_type="purchase",
            touch_types=["signup", "click"], mode=mode,
            lookback_seconds=lookback_s, ties=["event_id"],
        ).collect()
    }

    by_user_touch = {}
    for i, (u, m, ty) in enumerate(events):
        if ty in ("signup", "click"):
            by_user_touch.setdefault(u, []).append((m, i, ty))
    want = {}
    for i, (u, m, ty) in enumerate(events):
        if ty != "purchase":
            continue
        cands = [
            (mt, j, tt) for (mt, j, tt) in by_user_touch.get(u, [])
            if mt < m
            and (lookback_min is None or mt >= m - lookback_min)
        ]
        if not cands:
            want[i] = (None, None, None)
        else:
            mt, j, tt = (max if mode == "last" else min)(cands)
            want[i] = (
                tt,
                base + dt.timedelta(minutes=mt),
                (m - mt) * 60 * 1_000_000,
            )
    assert got == want


@given(events=_attr_events_st)
@SETTINGS
def test_event_transitions_matches_python_model(spark, events):
    """event_transitions == the brute model: consecutive pairs per
    user in (time, event_id) order, counted globally; frac_of_from is
    the exact 9-dp HALF_UP quotient of the two counts."""
    import datetime as dt
    from decimal import ROUND_HALF_UP, Decimal

    from qctimeseries_spark.events import event_transitions

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(minutes=m), ty)
        for i, (u, m, ty) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r.from_type, r.to_type): (r.n_pairs, r.n_from, r.frac_of_from)
        for r in event_transitions(df, ties=["event_id"]).collect()
    }

    per_user: dict[int, list[tuple[int, int, str]]] = {}
    for i, (u, m, ty) in enumerate(events):
        per_user.setdefault(u, []).append((m, i, ty))
    pairs: dict[tuple[str, str], int] = {}
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    from_tot: dict[str, int] = {}
    for (a, _), n in pairs.items():
        from_tot[a] = from_tot.get(a, 0) + n
    want = {
        k: (
            n,
            from_tot[k[0]],
            float(
                (Decimal(n) / Decimal(from_tot[k[0]])).quantize(
                    Decimal("0.000000001"), rounding=ROUND_HALF_UP
                )
            ),
        )
        for k, n in pairs.items()
    }
    assert got == want


_au_events_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # user
        st.integers(min_value=0, max_value=20),    # day offset
    ),
    min_size=1,
    max_size=25,
)


@given(events=_au_events_st,
       window=st.integers(min_value=1, max_value=4))
@SETTINGS
def test_active_users_matches_python_model(spark, events, window):
    """active_users == the brute model: per active day, the distinct
    users that day and the distinct users over the trailing window —
    duplicate (user, day) activity never double-counts, empty days
    emit nothing."""
    import datetime as dt

    from qctimeseries_spark.events import active_users

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(days=d, hours=1), "a")
        for i, (u, d) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r.period_ts: (r.n_active_period, r.n_active_window)
        for r in active_users(
            df, period_days=1.0, window_periods=window
        ).collect()
    }

    by_day: dict[int, set[int]] = {}
    for u, d in events:
        by_day.setdefault(d, set()).add(u)
    want = {
        base + dt.timedelta(days=d): (
            len(us),
            len(set().union(*(
                by_day.get(d - k, set()) for k in range(window)
            ))),
        )
        for d, us in by_day.items()
    }
    assert got == want
