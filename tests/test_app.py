"""QcSession: the interactive event loop replayed over batch operators.

The gold standard (VERDICT r1 item 3): a full session script — navigate
→ brush-flag → approve-rest → advance → window ops → checkpoint →
finish — must produce exactly the table the equivalent batch U-op chain
produces.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from qctimeseries_spark import (
    QcSession,
    add_flags,
    approve_window,
    assign_windows,
    display_tz,
    flag_and_approve_window,
    flag_window,
    progress,
    set_flag,
    utc_from_display,
    with_rowid,
)


@pytest.fixture()
def flagged(multivar):
    return add_flags(multivar, ["temp"])


def _flags(df):
    return {
        r.rowid: r.temp_qcflag
        for r in df.select("rowid", "temp_qcflag").collect()
    }


def test_session_script_matches_batch_chain(spark, flagged, tmp_path):
    sess = QcSession(flagged, "temp", time_col="DateTime", win_hours=24)
    assert sess.n_windows == 9  # 200 hourly rows / 24 h
    assert "Window 1 / 9" in sess.window_label()

    # --- the interactive script ---
    sess.next()                               # -> window 1
    sess.flag_selection([30, 31, 32])         # brush 3 points -> -2
    sess.approve_unflagged()                  # rest of window 1 -> 1
    sess.jump(3)
    sess.flag_window()                        # all of window 3 -> -2
    sess.flag_selection_and_advance([100, 101])  # U6 in window 3, then -> 4
    assert sess.current_win == 4
    sess.checkpoint(str(tmp_path / "ckpt"))   # compact mid-session
    sess.reset_window()                       # window 4 -> 0 (no-op here)
    sess.approve_selection([150])
    final = sess.finish()

    # --- the equivalent batch chain ---
    base = with_rowid(flagged, "DateTime")
    b = assign_windows(base, "DateTime", 24)
    b = set_flag(b, "temp", -2, selection=[30, 31, 32])
    b = approve_window(b, "temp", 1)
    b = flag_window(b, "temp", 3)
    b = flag_and_approve_window(b, "temp", 3, [100, 101])
    b = set_flag(b, "temp", 0, window=4)
    b = set_flag(b, "temp", 1, selection=[150])

    assert _flags(final) == _flags(b)
    # lineage restarted: the physical plan is ONE leaf scan — a
    # FileScan right after the durable checkpoint(), or an
    # ExistingRDD when the session's automatic overlay compaction
    # (compact_every, r9) cut lineage after later U-ops; either way
    # no when()-stack or rowid machinery survives into the plan
    plan = final._jdf.queryExecution().executedPlan().toString()
    leaves = plan.count("FileScan") + plan.count("ExistingRDD")
    assert leaves == 1 and "Scan" in plan, plan[:400]


def test_session_reindex_and_clamp(flagged):
    sess = QcSession(flagged, "temp", time_col="DateTime", win_hours=24)
    sess.jump(8)
    sess.rewindow(win_hours=96)  # 200 h / 96 h -> 3 windows
    assert sess.n_windows == 3
    assert sess.current_win == 2  # pointer clamped, not reset

    # unchecked-only filter after approving everything in window 0
    sess2 = QcSession(flagged, "temp", time_col="DateTime", win_hours=24)
    sess2.approve_unflagged()
    sess2.rewindow(include=(0,))
    assert sess2.n_windows == 8  # fully-approved window 0 dropped
    assert 0 not in sess2._win_ids


def test_session_navigation_bounds(flagged):
    sess = QcSession(flagged, "temp", time_col="DateTime", win_hours=24)
    assert sess.prev() == 0  # clamped at first
    sess.jump(8)
    assert sess.next() == 8  # clamped at last
    sess.brush_zoom(y_range=(1.0, 2.0))
    assert sess.y_range == (1.0, 2.0)
    sess.next()  # no-op at the edge keeps zoom
    assert sess.y_range == (1.0, 2.0)
    sess.jump(0)  # real navigation resets zoom (reference redraw(FALSE))
    assert sess.y_range is None


def test_session_slices_and_progress(flagged):
    sess = QcSession(flagged, "temp", time_col="DateTime", win_hours=24)
    sess.flag_selection([5])
    mt = sess.main_trace(hide_flagged=True)
    assert mt.filter(F.col("rowid") == 5).count() == 0  # hidden
    assert sess.flagged_overlay().filter(F.col("rowid") == 5).count() == 1
    sess.approve_selection([6])
    assert sess.approved_overlay().filter(F.col("rowid") == 6).count() == 1
    sec = sess.secondary_trace("hum")
    assert "hum" in sec.columns and sec.count() > 0
    prog = progress(sess.finish(), ["temp"]).collect()[0]
    assert prog.pct_flagged > 0 and prog.pct_approved > 0


def test_display_tz_round_trip(spark):
    ts = [dt.datetime(2024, 1, 10, h) for h in range(6)]
    df = spark.createDataFrame([(t,) for t in ts], "DateTime timestamp")
    local = display_tz(df, "DateTime", "America/Denver")
    # Denver is UTC-7 in January
    got = [r.DateTime for r in local.orderBy("DateTime").collect()]
    assert got[0] == ts[0] - dt.timedelta(hours=7)
    back = utc_from_display(local, "DateTime", "America/Denver")
    assert [r.DateTime for r in back.orderBy("DateTime").collect()] == ts


def test_session_tz_applied_at_edge_only(flagged):
    sess = QcSession(
        flagged, "temp", time_col="DateTime", win_hours=24,
        tz_user="America/Denver",
    )
    # slices render Denver wall-clock (Jan -> UTC-7); the first
    # displayed row is 01:00 UTC (row 0 is NULL, filtered by P7)
    first = sess.main_trace().agg(F.min("DateTime")).collect()[0][0]
    assert first == dt.datetime(2024, 1, 1, 1) - dt.timedelta(hours=7)
    # ...but stored state stays UTC
    stored = sess.finish().agg(F.min("DateTime")).collect()[0][0]
    assert stored == dt.datetime(2024, 1, 1)


def test_suggest_outliers_proposes_then_reviewer_flags(spark):
    """A planted spike is proposed as an outlier candidate; flagging the
    suggestion marks exactly that row -2 and leaves the rest unchecked."""
    import datetime as dt

    from qctimeseries_spark import QcSession, add_flags

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(hours=h), 500.0 if h == 50 else 20.0 + (h % 5))
        for h in range(96)
    ]
    df = add_flags(
        spark.createDataFrame(rows, "ts timestamp, value double"),
        "value",
        time_col="ts",
    )
    sess = QcSession(df, "value", time_col="ts", win_hours=96.0)
    ids = sess.suggest_outliers(window_seconds=24 * 3600.0, z=4.0)
    assert len(ids) == 1
    sess.flag_selection(ids)
    out = sess.finish()
    flagged = out.filter(F.col("value_qcflag") == -2).collect()
    assert len(flagged) == 1 and flagged[0]["value"] == 500.0


def test_plan_summary_counts_exchanges_and_pushdown(spark):
    from qctimeseries_spark import plan_summary
    from qctimeseries_spark.sources import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    narrow = ev.filter(F.col("event_id") > 100).select("event_id", "value")
    s = plan_summary(narrow)
    assert s["shuffles"] == 0 and s["nested_loop_joins"] == 0
    assert s["scans"] and s["scans"][0]["columns"] <= 3
    assert "GreaterThan(event_id" in s["scans"][0]["pushed_filters"]

    agg = ev.groupBy("event_type").count()
    assert plan_summary(agg)["shuffles"] >= 1


def test_qc_pipeline_rules_stage_flags_violations(spark):
    """The rules= parameter screens and flags automatically; helper
    columns do not leak into the returned frames."""
    import datetime as dt

    from qctimeseries_spark import qc_pipeline

    t0 = dt.datetime(2024, 1, 1)
    vals = [20.0 + (h % 7) for h in range(80)]
    vals[30] = 900.0
    rows = [(t0 + dt.timedelta(hours=h), vals[h]) for h in range(80)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    flagged, clean, prog = qc_pipeline(
        df, "value", time_col="ts",
        rules={"value": {"lo": 0.0, "hi": 500.0, "max_step": 200.0}},
    )
    assert set(flagged.columns) == {"ts", "value", "value_qcflag"}
    bad = flagged.filter(F.col("value_qcflag") == -2).collect()
    assert {r["value"] for r in bad} >= {900.0}
    # the masked clean output nulls the violation
    assert clean.filter(F.col("value") == 900.0).count() == 0


def test_session_window_progress_dashboard(spark):
    import datetime as dt

    from qctimeseries_spark import QcSession, add_flags

    t0 = dt.datetime(2024, 1, 1)
    rows = [(t0 + dt.timedelta(hours=h), float(h)) for h in range(96)]
    df = add_flags(
        spark.createDataFrame(rows, "ts timestamp, value double"),
        "value", time_col="ts",
    )
    sess = QcSession(df, "value", time_col="ts", win_hours=24.0)
    sess.approve_unflagged()  # window 0 fully checked
    dash = {r["win_id"]: r["pct_checked"] for r in sess.window_progress().collect()}
    assert dash[0] == 100.0 and all(dash[w] == 0.0 for w in (1, 2, 3))
    todo = [r["win_id"] for r in
            sess.window_progress(hide_complete=True).collect()]
    assert todo == [1, 2, 3]


def test_suggest_drift_flags_planted_creep(spark):
    """A slow upward creep in one window must surface CUSUM candidates
    there (rows after the drift onset), and none in a clean window."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(96):  # 4 x 24h windows, hourly
        v = 100.0 + (i % 3 - 1) * 0.5        # flat noise
        if 30 <= i < 48:                     # creep inside window 1
            v += (i - 29) * 0.8
        rows.append((t0 + dt.timedelta(hours=i), v))
    df = add_flags(
        spark.createDataFrame(rows, "DateTime timestamp, temp double"),
        ["temp"],
    )
    sess = QcSession(df, "temp", time_col="DateTime", win_hours=24)
    sess.jump(1)
    ids = sess.suggest_drift(target=100.0, slack=1.0, threshold=10.0)
    assert ids  # the creep fires
    sess.jump(3)
    assert sess.suggest_drift(target=100.0, slack=1.0, threshold=10.0) == []
    # candidates already flagged are not re-proposed
    sess.jump(1)
    sess.flag_selection(ids)
    assert sess.suggest_drift(target=100.0, slack=1.0, threshold=10.0) == []


def test_u_op_job_ceiling(spark, flagged):
    """VERDICT r8 task 7: the interactive loop's per-event Spark job
    count is a LATENCY budget — each U-op (flag/approve a selection,
    window ops) must stay within a small fixed number of jobs, or the
    sub-second event loop degrades as hidden actions creep in.
    Ceilings are the measured counts (tools/qcsession_latency.py)
    plus zero slack: a regression that adds a job per event fails
    here before it ships."""
    from qctimeseries_spark.plans import job_audit

    sess = QcSession(flagged, "temp", time_col="DateTime", win_hours=24)
    sess.compact_every = 0  # measure raw per-op cost; the periodic
    # lineage cut is pinned by test_overlay_auto_compaction_bounds_
    # plan_depth (it costs ~1 job burst every compact_every events)
    ids = [r.rowid for r in
           sess.df.select("rowid").limit(5).collect()]

    # selection U-ops: the flag overlay itself is LAZY; the measured
    # jobs are the dirty-extent agg evaluated through the two-phase
    # rowid lineage under AQE (6 on the measurement host).  The pin
    # is the measured count — AND that it is FLAT: event N+1 must
    # cost the same jobs as event 1 no matter how deep the overlay
    # stack gets (the property that keeps the loop sub-second until
    # the next checkpoint()).
    counts = []
    for op in (sess.flag_selection, sess.approve_selection,
               sess.unflag_selection, sess.flag_selection):
        audit = job_audit(spark, lambda: op(ids))
        counts.append(audit["jobs"])
        assert audit["jobs"] <= 6, (op.__name__, audit["jobs"])
    assert len(set(counts)) == 1, f"per-event jobs not flat: {counts}"

    # window U-ops are pure overlay stacking: ZERO jobs (the cost is
    # paid at the next redraw/reindex, never per button press)
    for op in (sess.flag_window, sess.approve_unflagged,
               sess.reset_window):
        audit = job_audit(spark, op)
        assert audit["jobs"] == 0, (op.__name__, audit["jobs"])

    # a redraw slice pays a bounded handful of jobs (AQE stages over
    # the overlay lineage)
    audit = job_audit(
        spark,
        lambda: sess.main_trace().write.format("noop")
        .mode("overwrite").save(),
    )
    assert audit["jobs"] <= 5, audit["jobs"]
    # navigation is driver-side only
    assert job_audit(spark, sess.next)["jobs"] == 0


def test_overlay_auto_compaction_bounds_plan_depth(spark, flagged):
    """The superlinear-latency fix (VERDICT r8 task 7): every
    `compact_every` U-ops the session cuts lineage with an eager
    localCheckpoint — measured at sf0.1, the 16th flag+redraw event
    cost 185.8 s WITHOUT the cut and 0.54 s with it.  Pin the
    mechanism (plan depth resets to a scan), not wall times."""
    sess = QcSession(flagged, "temp", time_col="DateTime", win_hours=24)
    sess.compact_every = 3
    # non-null rows only: the missing-value guard (-1) would silently
    # hold one id out of the flagged count below
    ids = [r.rowid for r in
           sess.df.filter(F.col("temp").isNotNull())
           .select("rowid").limit(3).collect()]

    def depth():
        plan = sess.df._jdf.queryExecution().logical().toString()
        return len(plan.splitlines())

    sess.flag_selection(ids)        # overlay 1
    sess.approve_selection(ids)     # overlay 2
    d2 = depth()
    sess.flag_selection(ids)        # overlay 3 -> compaction fires
    d3 = depth()
    assert d3 < d2, (d2, d3)
    plan = sess.df._jdf.queryExecution().logical().toString()
    # post-compaction root is a materialized scan, not a when() stack
    assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan[:300]
    # flag state survives the cut
    flagged_now = sess.df.filter(F.col("temp_qcflag") == -2).count()
    assert flagged_now == len(ids)
    # disabling keeps the old stack-only behavior
    sess.compact_every = 0
    before = depth()
    sess.flag_selection(ids)
    assert depth() > before
