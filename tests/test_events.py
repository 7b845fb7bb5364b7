"""Event analytics (funnel, retention) + time-weighted resample:
hand-computed semantics, ordering traps, exactness."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from qctimeseries_spark.events import funnel, retention_cohorts
from qctimeseries_spark.windows import time_weighted_resample


def _ts(d, h=0, m=0):
    return dt.datetime(2024, 1, 1 + d, h, m)


_EV = "event_id long, user_id long, ts timestamp, event_type string"


def test_funnel_orders_stages_strictly(spark):
    rows = [
        # u1: clean signup -> click -> purchase
        (1, 1, _ts(0), "signup"), (2, 1, _ts(1), "click"),
        (3, 1, _ts(2), "purchase"),
        # u2: purchase BEFORE click -> converts click only
        (4, 2, _ts(0), "signup"), (5, 2, _ts(1), "purchase"),
        (6, 2, _ts(2), "click"),
        # u3: click before signup doesn't count; the later one does
        (7, 3, _ts(1), "click"), (8, 3, _ts(2), "signup"),
        (9, 3, _ts(3), "click"),
        # u4: no signup -> contributes nowhere
        (10, 4, _ts(0), "click"), (11, 4, _ts(1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, _EV)
    got = {
        r.stage: (r.stage_idx, r.n_users, r.frac_of_first)
        for r in funnel(ev, ["signup", "click", "purchase"]).collect()
    }
    assert got["signup"] == (0, 3, 1.0)
    assert got["click"] == (1, 3, 1.0)       # u1, u2, u3
    assert got["purchase"] == (2, 1, round(1 / 3, 9))  # only u1


def test_funnel_horizon_cuts_slow_conversions(spark):
    rows = [
        (1, 1, _ts(0), "signup"), (2, 1, _ts(1), "click"),   # within 2d
        (3, 2, _ts(0), "signup"), (4, 2, _ts(5), "click"),   # 5d > 2d
    ]
    ev = spark.createDataFrame(rows, _EV)
    got = {
        r.stage: r.n_users
        for r in funnel(
            ev, ["signup", "click"], horizon_seconds=2 * 86400.0
        ).collect()
    }
    assert got == {"signup": 2, "click": 1}


def test_funnel_validates_stages(spark):
    ev = spark.createDataFrame([], _EV)
    with pytest.raises(ValueError, match="at least 2"):
        funnel(ev, ["signup"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(ev, ["click", "click"])


def test_retention_cohorts_counts_and_self_check(spark):
    # weekly periods anchored at the epoch: 2024-01-01 is a Monday and
    # epoch-week boundaries fall on Thursdays — use day offsets only
    rows = []
    eid = 0
    # u1 first active day 0, again day 14 (k=2 weeks later or same
    # epoch-week boundary; compute expectations from the operator's
    # own floor rule below)
    for u, days in [(1, [0, 14]), (2, [0]), (3, [7, 21]), (4, [8])]:
        for d in days:
            eid += 1
            rows.append((eid, u, _ts(d), "view"))
    ev = spark.createDataFrame(rows, _EV)
    out = retention_cohorts(ev, period_days=7.0, max_periods=4).collect()
    per = {(r.cohort_ts, r.period_k): (r.n_active, r.n_cohort, r.retention)
           for r in out}
    # every cohort's k=0 row is the full cohort (the self-check)
    for (cts, k), (na, nc, ret) in per.items():
        if k == 0:
            assert na == nc and ret == 1.0
    # total cohort sizes across k=0 rows = number of distinct users
    assert sum(nc for (c, k), (na, nc, r) in per.items() if k == 0) == 4
    # a user active exactly 2 periods after their first shows at k=2
    week_us = 7 * 86400 * 1_000_000
    import math

    def period(d):
        us = int(_ts(d).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        return us // week_us

    for u, d0, d1 in [(1, 0, 14), (3, 7, 21)]:
        k = period(d1) - period(d0)
        cohort = dt.datetime.fromtimestamp(
            period(d0) * 7 * 86400, dt.timezone.utc
        ).replace(tzinfo=None)
        assert per[(cohort, k)][0] >= 1


def test_time_weighted_resample_hand_computed(spark):
    # one user, one 60-min bucket starting 00:00: obs at 00:00 (v=1.00)
    # holds 15 min, obs at 00:15 (v=3.00) holds 45 min
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0), 1.00),
        (2, 1, dt.datetime(2024, 1, 1, 0, 15), 3.00),
        # second bucket: single obs holds the whole remaining bucket
        (3, 1, dt.datetime(2024, 1, 1, 1, 30), 10.00),
        # NULL value: dropped, previous value holds across it
        (4, 1, dt.datetime(2024, 1, 1, 0, 45), None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        r.bucket_ts: (r.n_obs, r.twa_value)
        for r in time_weighted_resample(
            df, "ts", "value", step_minutes=60.0,
            key_cols=["user_id"], ties=["event_id"],
        ).collect()
    }
    # bucket 0: (1.00*15 + 3.00*45) / 60 = 2.5
    assert out[dt.datetime(2024, 1, 1, 0, 0)] == (2, 2.5)
    # bucket 1: single obs -> its own value
    assert out[dt.datetime(2024, 1, 1, 1, 0)] == (1, 10.0)


def test_time_weighted_resample_ties_and_guards(spark):
    # same-instant observations: the earlier tie-order row gets ZERO
    # weight, the later one holds
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0), 100.0),
        (2, 1, dt.datetime(2024, 1, 1, 0, 0), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = time_weighted_resample(
        df, "ts", "value", step_minutes=60.0,
        key_cols=["user_id"], ties=["event_id"],
    ).collect()
    assert len(out) == 1 and out[0].twa_value == 4.0 and out[0].n_obs == 2

    with pytest.raises(ValueError, match="positive"):
        time_weighted_resample(df, "ts", "value", step_minutes=0.0)
    with pytest.raises(TypeError, match="timestamp"):
        time_weighted_resample(df, "value", "value", step_minutes=1.0)
    # r12 advisor: internal aliases are reserved for key/tie names in
    # BOTH paths (a key named "_b" would silently corrupt the
    # carry_in bucket split), matching ohlc_resample's guard
    clash = df.withColumnRenamed("user_id", "_b")
    for carry in (False, True):
        with pytest.raises(ValueError, match="reserved"):
            time_weighted_resample(
                clash, "ts", "value", step_minutes=60.0,
                key_cols=["_b"], carry_in=carry,
            )
    from qctimeseries_spark.windows import ohlc_resample

    with pytest.raises(ValueError, match="reserved"):
        ohlc_resample(
            df.withColumnRenamed("user_id", "_bk"),
            "ts", "value", step_minutes=60.0, key_cols=["_bk"],
        )


def test_time_weighted_vs_plain_avg_regime_bias(spark):
    """The reason this operator exists: a chatty low regime must NOT
    drag the average when it holds only a sliver of the time."""
    from qctimeseries_spark.windows import resample

    rows = [(i, 1, dt.datetime(2024, 1, 1, 0, 59, i), 0.0)
            for i in range(10)]           # 10 rapid zeros in the last min
    rows.append((100, 1, dt.datetime(2024, 1, 1, 0, 0), 60.0))  # held 59min
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    twa = time_weighted_resample(
        df, "ts", "value", step_minutes=60.0,
        key_cols=["user_id"], ties=["event_id"],
    ).collect()[0].twa_value
    plain = resample(
        df, "ts", step_minutes=60.0, aggs={"value": "avg"},
        key_cols=["user_id"],
    ).collect()[0].value_avg
    assert plain < 6.0          # 11-row mean: dominated by the zeros
    assert twa == 59.0          # exact: 60.0 * 59min / 60min


def test_funnel_lags_hand_computed(spark):
    from qctimeseries_spark.events import funnel_lags

    rows = [
        # u1: signup 0h -> click +2h -> purchase +5h (lag 3h)
        (1, 1, _ts(0, 0), "signup"), (2, 1, _ts(0, 2), "click"),
        (3, 1, _ts(0, 5), "purchase"),
        # u2: signup 0h -> click +4h; no purchase
        (4, 2, _ts(0, 0), "signup"), (5, 2, _ts(0, 4), "click"),
    ]
    ev = spark.createDataFrame(rows, _EV)
    got = {
        r.stage: (r.n_converted, r.avg_lag_s, r.min_lag_s, r.max_lag_s)
        for r in funnel_lags(
            ev, ["signup", "click", "purchase"]
        ).collect()
    }
    assert got["click"] == (2, 3.0 * 3600, 2.0 * 3600, 4.0 * 3600)
    assert got["purchase"] == (1, 3.0 * 3600, 3.0 * 3600, 3.0 * 3600)
    # a stage nobody converts emits a NULL-stat row, not a missing row
    got2 = {
        r.stage: (r.n_converted, r.avg_lag_s)
        for r in funnel_lags(ev, ["signup", "error"]).collect()
    }
    assert got2["error"] == (0, None)

def test_time_weighted_carry_in_fills_and_disambiguates(spark):
    """carry_in=True vs False on the SAME fixture: the silent bucket
    between two observations gets a held-value row (n_obs=0) under
    carry-in and NO row without it, and the partially-covered third
    bucket blends the carried level with its own observation — the
    kdb/Influx TWA semantic the r11 verdict ordered as an opt-in."""
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0), 1.00),
        (2, 1, dt.datetime(2024, 1, 1, 0, 15), 3.00),
        # next obs two buckets later: 3.00 must carry through all of
        # bucket 1 and the first half of bucket 2
        (3, 1, dt.datetime(2024, 1, 1, 2, 30), 10.00),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    kw = dict(step_minutes=60.0, key_cols=["user_id"], ties=["event_id"])
    no_carry = {
        r.bucket_ts: (r.n_obs, r.twa_value)
        for r in time_weighted_resample(df, "ts", "value", **kw).collect()
    }
    carry = {
        r.bucket_ts: (r.n_obs, r.twa_value)
        for r in time_weighted_resample(
            df, "ts", "value", carry_in=True, **kw
        ).collect()
    }
    b = lambda h: dt.datetime(2024, 1, 1, h, 0)
    # shared bucket 0 identical in both modes
    assert no_carry[b(0)] == carry[b(0)] == (2, 2.5)
    # the silent bucket: absent without carry, held level with it
    assert b(1) not in no_carry
    assert carry[b(1)] == (0, 3.0)
    # the last bucket: carry blends 30 min of 3.0 with 30 min of 10.0;
    # no-carry sees only its own observation
    assert no_carry[b(2)] == (1, 10.0)
    assert carry[b(2)] == (1, 6.5)
    # last observation holds only to ITS bucket end — nothing beyond
    assert b(3) not in carry
    # zero-weight ties still count as observations under carry-in
    ties_df = spark.createDataFrame(
        [(1, 1, b(0), 100.0), (2, 1, b(0), 4.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = time_weighted_resample(
        ties_df, "ts", "value", carry_in=True, **kw
    ).collect()
    assert len(out) == 1 and (out[0].n_obs, out[0].twa_value) == (2, 4.0)


def test_time_weighted_value_scale(spark):
    """value_scale is the input-domain knob (r11 advisor): the default
    2-dp cast snaps finer values, a larger scale keeps them, and an
    out-of-range scale is refused."""
    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1, 0, 0), 0.005)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    kw = dict(step_minutes=60.0, key_cols=["user_id"], ties=["event_id"])
    snapped = time_weighted_resample(df, "ts", "value", **kw).collect()
    kept = time_weighted_resample(
        df, "ts", "value", value_scale=3, **kw
    ).collect()
    assert snapped[0].twa_value == 0.01   # HALF_UP to the cent grid
    assert kept[0].twa_value == 0.005     # preserved at 3 dp
    with pytest.raises(ValueError, match="value_scale"):
        time_weighted_resample(df, "ts", "value", value_scale=10, **kw)


def test_funnel_and_retention_drop_null_users(spark):
    """NULL user_id rows must not pool into a pseudo-user that
    converts stages or forms a cohort (r11 advisor) — both operators
    drop them before anything else."""
    rows = [
        (1, None, _ts(0), "signup"), (2, None, _ts(1), "click"),
        (3, 1, _ts(0), "signup"),
    ]
    ev = spark.createDataFrame(rows, _EV)
    got = {
        r.stage: r.n_users
        for r in funnel(ev, ["signup", "click"]).collect()
    }
    assert got == {"signup": 1, "click": 0}
    ret = retention_cohorts(ev, period_days=7.0, max_periods=2).collect()
    assert sum(r.n_cohort for r in ret if r.period_k == 0) == 1


def test_funnel_single_user_exchange_plan_shape(spark):
    """Pin the funnel family's one-exchange claim (r11 verdict task
    5): every stage's conditional-min window shares ONE hash exchange
    on the user key — a refactor to per-stage joins would re-shuffle
    the events table k times and could still pass on value hashes."""
    from qctimeseries_spark.events import funnel_lags

    rows = [(i, i % 3, _ts(i % 5), ["signup", "click", "purchase"][i % 3])
            for i in range(30)]
    ev = spark.createDataFrame(rows, _EV)
    for fn in (funnel, funnel_lags):
        out = fn(ev, ["signup", "click", "purchase"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_user_ex = plan.count("Exchange hashpartitioning(user_id")
        assert n_user_ex == 1, plan
        assert plan.count("Window") >= 1, plan


def test_retention_single_events_exchange_plan_shape(spark):
    """Pin e2's r12 rewrite: ONE user-key exchange over the events
    table, with the cohort-size branch riding a ReusedExchange of it
    (the r11 distinct()+join form exchanged the events table twice).
    Checked on the AQE FINAL plan — reuse materializes at runtime."""
    rows = [(i, i % 4, _ts(i % 20), "view") for i in range(40)]
    ev = spark.createDataFrame(rows, _EV)
    out = retention_cohorts(ev, period_days=7.0, max_periods=4)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # a ReusedExchange line NAMES the exchange it reuses — count only
    # real Exchange nodes
    real_user_exchanges = [
        ln for ln in final.splitlines()
        if "Exchange hashpartitioning(user_id" in ln
        and "ReusedExchange" not in ln
    ]
    assert len(real_user_exchanges) == 1, final
    assert final.count("ReusedExchange") == 1, final

def test_ohlc_resample_hand_computed(spark):
    """open/close follow (time, ties) order — same-instant rows break
    by the tie column, values pass through untouched, NULLs drop."""
    from qctimeseries_spark.windows import ohlc_resample

    b = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    rows = [
        (2, 1, b(0, 0), 5.0),    # same instant as event 1: tie-break
        (1, 1, b(0, 0), 9.0),    # event_id 1 wins the open
        (3, 1, b(0, 30), 1.0),   # the low
        (4, 1, b(0, 45), 7.0),   # the close
        (5, 1, b(0, 20), None),  # NULL: dropped
        (6, 1, b(1, 10), 3.0),   # next bucket: single obs
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        r.bucket_ts: (r.open, r.high, r.low, r.close, r.n_obs)
        for r in ohlc_resample(
            df, "ts", "value", step_minutes=60.0,
            key_cols=["user_id"], ties=["event_id"],
        ).collect()
    }
    assert out[b(0)] == (9.0, 9.0, 1.0, 7.0, 4)
    assert out[b(1)] == (3.0, 3.0, 3.0, 3.0, 1)
    with pytest.raises(ValueError, match="reserved"):
        ohlc_resample(df, "ts", "value", step_minutes=60.0,
                      ties=["_us"])
    with pytest.raises(ValueError, match="positive"):
        ohlc_resample(df, "ts", "value", step_minutes=0.0)


def test_event_transitions_hand_computed(spark):
    """Consecutive per-user pairs in (ts, tie) order; NULL user/ts/
    type rows drop; frac_of_from is the exact 9-dp quotient."""
    from qctimeseries_spark.events import event_transitions

    rows = [
        # u1: a -> b -> a  (pairs: a->b, b->a)
        (1, 1, _ts(0), "a"), (2, 1, _ts(1), "b"), (3, 1, _ts(2), "a"),
        # u2: a -> a  (pair: a->a)
        (4, 2, _ts(0), "a"), (5, 2, _ts(1), "a"),
        # same-instant tie on u3: event_id orders b before c
        (6, 3, _ts(0), "b"), (7, 3, _ts(0), "c"),
        # dropped rows: NULL user / NULL ts / NULL type
        (8, None, _ts(0), "a"), (9, 4, None, "a"), (10, 4, _ts(1), None),
    ]
    ev = spark.createDataFrame(rows, _EV)
    got = {
        (r.from_type, r.to_type): (r.n_pairs, r.n_from, r.frac_of_from)
        for r in event_transitions(ev, ties=["event_id"]).collect()
    }
    assert got[("a", "b")] == (1, 2, 0.5)
    assert got[("a", "a")] == (1, 2, 0.5)
    assert got[("b", "a")] == (1, 2, 0.5)
    assert got[("b", "c")] == (1, 2, 0.5)
    assert len(got) == 4  # nothing from the dropped rows

def test_ohlc_and_transitions_plan_shape(spark):
    """Pin the scale shapes: w17 is ONE exchange total (struct min/max
    in the grouped aggregate — a refactor to first/last windows would
    add a sort + second exchange); e4 touches the events table through
    ONE user-key exchange (the remaining exchanges sit on the tiny
    type-pair domain)."""
    from qctimeseries_spark.events import event_transitions
    from qctimeseries_spark.windows import ohlc_resample

    rows = [(i, i % 3, _ts(i % 5), ["a", "b", "c"][i % 3], float(i))
            for i in range(30)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp,"
        " event_type string, value double",
    )
    def real_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return [
            ln for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
            and "ReusedExchange" not in ln
        ]
    ohlc_ex = real_exchanges(ohlc_resample(
        ev, "ts", "value", step_minutes=60.0,
        key_cols=["user_id"], ties=["event_id"],
    ))
    assert len(ohlc_ex) == 1, ohlc_ex
    tr_ex = real_exchanges(event_transitions(ev, ties=["event_id"]))
    user_ex = [ln for ln in tr_ex if "user_id" in ln]
    assert len(user_ex) == 1, tr_ex


def test_attribution_hand_computed(spark):
    """Last/first-touch election: strictly-earlier µs, lookback cut,
    same-µs touch never attributes, ties break by event_id, no-touch
    conversions keep a NULL row, lag is exact integer µs."""
    from qctimeseries_spark.events import attribution

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: click then signup then purchase — last=signup, first=click
        (1, 1, t(0), "click"), (2, 1, t(5), "signup"),
        (3, 1, t(10), "purchase"),
        # u2: touch at the SAME µs as the conversion — never attributes
        (4, 2, t(0), "click"), (5, 2, t(0), "purchase"),
        # u3: no touch at all
        (6, 3, t(0), "purchase"),
        # u4: touch outside the 30-minute lookback
        (7, 4, t(0), "click"), (8, 4, t(50), "purchase"),
        # u5: two touches at the same µs — event_id breaks the tie
        (9, 5, t(1), "click"), (10, 5, t(1), "signup"),
        (11, 5, t(2), "purchase"),
        # dropped: NULL user / NULL ts
        (12, None, t(0), "purchase"), (13, 6, None, "purchase"),
    ]
    ev = spark.createDataFrame(rows, _EV)
    kw = dict(conversion_type="purchase",
              touch_types=["signup", "click"],
              lookback_seconds=1800.0, ties=["event_id"])
    last = {r.event_id: (r.touch_type, r.lag_us)
            for r in attribution(ev, mode="last", **kw).collect()}
    assert last == {
        3: ("signup", 300_000_000),
        5: (None, None),
        6: (None, None),
        8: (None, None),
        11: ("signup", 60_000_000),   # max (us, event_id) at the tie
    }
    first = {r.event_id: (r.touch_type, r.lag_us)
             for r in attribution(ev, mode="first", **kw).collect()}
    assert first[3] == ("click", 600_000_000)
    assert first[11] == ("click", 60_000_000)  # min event_id at the tie
    # NULL user / NULL ts conversions dropped entirely
    assert 12 not in last and 13 not in last


def test_attribution_guards_and_plan_shape(spark):
    """Parameter validation + the scale-shape pin: the election rides
    ONE user-key exchange (a refactor to a conversions×touches
    self-join would add a second events scan and exchange)."""
    from qctimeseries_spark.events import attribution

    ev = spark.createDataFrame([], _EV)
    with pytest.raises(ValueError, match="first.*last"):
        attribution(ev, conversion_type="p", touch_types=["c"],
                    mode="bogus")
    with pytest.raises(ValueError, match="non-empty"):
        attribution(ev, conversion_type="p", touch_types=[])
    with pytest.raises(ValueError, match="attribute to itself"):
        attribution(ev, conversion_type="p", touch_types=["p", "c"])
    with pytest.raises(ValueError, match="positive"):
        attribution(ev, conversion_type="p", touch_types=["c"],
                    lookback_seconds=0.0)

    rows = [(i, i % 3, _ts(i % 5), ["p", "c", "s"][i % 3])
            for i in range(30)]
    df = spark.createDataFrame(rows, _EV)
    out = attribution(df, conversion_type="p", touch_types=["c", "s"],
                      lookback_seconds=86400.0, ties=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    user_ex = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        and "ReusedExchange" not in ln and "user_id" in ln
    ]
    assert len(user_ex) == 1, plan
    # the type pre-filter reaches the source (scan-prunes at 100 TB)
    assert "event_type" in plan.split("Exchange")[-1]


def test_active_users_hand_computed(spark):
    """DAU/rolling-AU: per-day distinct users and the trailing-window
    distinct — a user active twice in one day counts once in both; a
    user active on two days inside one window counts once in the
    rolling figure; NULL user/ts rows drop; zero-activity days emit
    no row."""
    from qctimeseries_spark.events import active_users

    rows = [
        # day 0: u1 twice, u2 once -> DAU 2
        (1, 1, _ts(0), "a"), (2, 1, _ts(0, 5), "b"), (3, 2, _ts(0), "a"),
        # day 2: u1 again -> DAU 1; window(2) over days 1-2 sees {u1}
        (4, 1, _ts(2), "a"),
        # day 3: u3 -> DAU 1; window(2) over days 2-3 sees {u1, u3}
        (5, 3, _ts(3), "a"),
        # dropped
        (6, None, _ts(0), "a"), (7, 4, None, "a"),
    ]
    ev = spark.createDataFrame(rows, _EV)
    got = {
        r.period_ts: (r.n_active_period, r.n_active_window)
        for r in active_users(ev, period_days=1.0,
                              window_periods=2).collect()
    }
    assert got == {
        _ts(0): (2, 2),   # window days -1..0 = {u1, u2}
        _ts(2): (1, 1),   # window days 1..2 = {u1}
        _ts(3): (1, 2),   # window days 2..3 = {u1, u3}
    }
    # day 1 had no activity: no row
    assert _ts(1) not in got

    import pytest

    with pytest.raises(ValueError, match=">= 1"):
        active_users(ev, window_periods=0)
    with pytest.raises(ValueError, match="positive"):
        active_users(ev, period_days=0.0)
