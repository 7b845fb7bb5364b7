"""Event-stream analytics: ordered funnels and cohort retention.

The reference package is a single-table QC tool with no behavioral
analytics, but the events table this engine curates is exactly what
funnel/retention queries consume at scale, and both are pure
DataFrame compositions — no UDF, no driver loop — so they belong in
the engine proper (the `examples/event_analytics.py` pipeline was the
prototype).

Scale shape (both operators): every stage is either a keyed window
over ``user_id`` or a map-side-combinable aggregation on the same
key, so the whole computation rides ONE logical shuffle on the user
key plus bounded-size joins on the (tiny) cohort/stage dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _stage_times(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str,
    time_col: str,
    type_col: str,
    horizon_seconds: float | None,
) -> tuple[DataFrame, list[str]]:
    """Per-user ordered stage-conversion times: one row per user with
    ``_t0.._tk`` µs columns (NULL where the stage never converted in
    order).  The shared core of :func:`funnel` and
    :func:`funnel_lags`: stage k's time is the MIN event of its type
    STRICTLY after ``_t{k-1}`` (within the optional horizon), resolved
    as conditional min windows that all share ONE exchange on the
    user key.

    NULL-user rows are DROPPED before anything else: a window
    partition would otherwise pool every NULL user into one
    pseudo-user that can "convert" stages in order, which no
    per-user semantic supports (and which a SQL ``JOIN USING
    (user_id)`` twin would drop anyway — r11 advisor)."""
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    if len(set(stages)) != len(stages):
        raise ValueError(f"funnel stages must be distinct, got {stages}")
    horizon_us = (
        int(round(horizon_seconds * 1_000_000))
        if horizon_seconds is not None
        else None
    )
    src = events.filter(F.col(user_col).isNotNull()).select(
        F.col(user_col),
        F.col(type_col),
        F.unix_micros(F.col(time_col)).alias("_us"),
    )
    wu = Window.partitionBy(user_col)
    cur = src
    tcols: list[str] = []
    for k, stage in enumerate(stages):
        cond = F.col(type_col) == F.lit(stage)
        if tcols:
            prev = F.col(tcols[-1])
            cond = cond & (F.col("_us") > prev)
            if horizon_us is not None:
                cond = cond & (F.col("_us") <= prev + F.lit(horizon_us))
        name = f"_t{k}"
        cur = cur.withColumn(
            name, F.min(F.when(cond, F.col("_us"))).over(wu)
        )
        tcols.append(name)
    per_user = cur.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in tcols]
    )
    return per_user, tcols


def funnel(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    horizon_seconds: float | None = None,
) -> DataFrame:
    """ORDERED funnel: a user converts at stage k only via an event of
    ``stages[k]``'s type STRICTLY AFTER their stage-k−1 conversion
    time (first qualifying event wins), optionally within
    ``horizon_seconds`` of it.  This is the sequencing a plain
    per-type aggregate gets wrong — a purchase logged before the
    click must not count.

    Returns one row per stage: ``(stage_idx, stage, n_users,
    frac_of_first)`` with the fraction 9-dp rounded (NULL when stage
    0 converted nobody).

    Implementation: stage times resolve as conditional ``min`` windows
    over the user partition — k window expressions share ONE exchange
    on ``user_col`` (same partition spec), then a per-user collapse
    and a global count per stage.  No self-joins over the event table,
    no per-stage passes over storage.
    """
    per_user, tcols = _stage_times(
        events, stages, user_col=user_col, time_col=time_col,
        type_col=type_col, horizon_seconds=horizon_seconds,
    )
    counts = per_user.agg(
        *[
            F.count(c).cast("bigint").alias(f"_c{k}")
            for k, c in enumerate(tcols)
        ]
    )
    # ONE generator over the single counts row — a per-stage union of
    # selects would re-run the whole upstream aggregation once per
    # stage (3 corpus scans for a 3-stage funnel, explain-audited).
    # Built from lit()/struct(), not a stack() SQL string, so stage
    # names never pass through the SQL parser (a quote in a stage
    # name would otherwise be a ParseException; r11 reviewer).
    exploded = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("stage_idx"),
                        F.lit(stage).alias("stage"),
                        F.col(f"_c{k}").alias("n_users"),
                    )
                    for k, stage in enumerate(stages)
                ]
            )
        ).alias("_row"),
        F.col("_c0").alias("_first"),
    )
    return exploded.select(
        F.col("_row.stage_idx").alias("stage_idx"),
        F.col("_row.stage").alias("stage"),
        F.col("_row.n_users").alias("n_users"),
        F.when(
            F.col("_first") > 0,
            F.round(
                F.col("_row.n_users").cast("double")
                / F.col("_first").cast("double"),
                9,
            ),
        ).alias("frac_of_first"),
    )


def funnel_lags(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    horizon_seconds: float | None = None,
) -> DataFrame:
    """How long each funnel step takes: for every stage k ≥ 1, the
    number of users who converted it and their min / average / max
    lag from the stage-k−1 conversion, in seconds — the step-latency
    companion to :func:`funnel` (same ordered semantics, same shared
    stage-time core, one extra tiny aggregation).

    Lags accumulate as exact integer µs (sum in ``DECIMAL(38,0)``);
    only the final average division runs in double (9-dp round,
    division last), so the DuckDB oracle hash-matches bit-exactly.
    min/max are exact integer µs rendered as 6-dp seconds.
    """
    per_user, tcols = _stage_times(
        events, stages, user_col=user_col, time_col=time_col,
        type_col=type_col, horizon_seconds=horizon_seconds,
    )
    lagged = per_user.select(
        *[
            (F.col(tcols[k]) - F.col(tcols[k - 1]))
            .cast("decimal(20,0)")
            .alias(f"_lag{k}")
            for k in range(1, len(stages))
        ]
    )
    agg = lagged.agg(
        *[
            e
            for k in range(1, len(stages))
            for e in (
                F.count(f"_lag{k}").cast("bigint").alias(f"_n{k}"),
                F.sum(f"_lag{k}").alias(f"_s{k}"),
                F.min(f"_lag{k}").alias(f"_mn{k}"),
                F.max(f"_lag{k}").alias(f"_mx{k}"),
            )
        ]
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("stage_idx"),
                        F.lit(stages[k]).alias("stage"),
                        F.col(f"_n{k}").alias("n_converted"),
                        F.col(f"_s{k}").alias("_s"),
                        F.col(f"_mn{k}").alias("_mn"),
                        F.col(f"_mx{k}").alias("_mx"),
                    )
                    for k in range(1, len(stages))
                ]
            )
        ).alias("_row")
    ).select("_row.*")
    return rows.select(
        "stage_idx",
        "stage",
        "n_converted",
        F.when(
            F.col("n_converted") > 0,
            F.round(
                F.col("_s").cast("double")
                / F.col("n_converted").cast("double")
                / F.lit(1_000_000.0),
                9,
            ),
        ).alias("avg_lag_s"),
        F.round(F.col("_mn").cast("double") / F.lit(1_000_000.0), 6)
        .alias("min_lag_s"),
        F.round(F.col("_mx").cast("double") / F.lit(1_000_000.0), 6)
        .alias("max_lag_s"),
    )


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    ties: list[str] | None = None,
) -> DataFrame:
    """First-order behavioral transition counts: for every CONSECUTIVE
    pair of events per user (ordered by time, then ``ties``), count
    (from_type → to_type) globally — the Markov-chain view of the
    event stream (``frac_of_from`` is the empirical transition
    probability row).  The funnel answers "did the user follow THIS
    path"; this answers "which paths do users actually follow".

    Returns ``(from_type, to_type, n_pairs, n_from, frac_of_from)``
    sorted by nothing (callers order); ``frac_of_from`` is the exact
    9-dp HALF_UP quotient ``n_pairs / n_from`` computed as an integer
    nanodigit division in DECIMAL (no float before the final exact
    nanos→double cast — the w15/w16 discipline, overflow-safe at any
    corpus scale).

    NULL users, NULL times, and NULL types are dropped first (no
    per-user order or transition is defined for them).  ``ties`` is
    REQUIRED for determinism if (user, time) can collide.

    Scale shape: ONE exchange on the user key for the lead() window,
    then a map-side-combinable groupBy on the (tiny) type-pair domain;
    the per-from totals resolve as a window over that |types|²-row
    aggregate — no second pass over the events table.
    """
    src = events.filter(
        F.col(user_col).isNotNull()
        & F.col(time_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col),
        F.unix_micros(F.col(time_col)).alias("_us"),
        F.col(type_col).alias("from_type"),
        *(ties or []),
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col("_us").asc(), *[F.col(c).asc() for c in (ties or [])]
    )
    pairs = src.withColumn(
        "to_type", F.lead("from_type").over(w)
    ).filter(F.col("to_type").isNotNull())
    per = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    wf = Window.partitionBy("from_type")
    per = per.withColumn(
        "n_from", F.sum("n_pairs").over(wf).cast("bigint")
    )
    # exact 9-dp HALF_UP in DECIMAL: (2·n·10⁹ + tot) div (2·tot)
    nanos = F.expr(
        "(2 * cast(n_pairs as decimal(20,0)) * 1000000000"
        " + cast(n_from as decimal(20,0)))"
        " div (2 * cast(n_from as decimal(20,0)))"
    )
    return per.select(
        "from_type",
        "to_type",
        "n_pairs",
        "n_from",
        (nanos.cast("double") / F.lit(1e9)).alias("frac_of_from"),
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    time_col: str = "ts",
    period_days: float = 7.0,
    max_periods: int = 4,
) -> DataFrame:
    """Cohort retention: users cohort by the epoch-anchored
    ``period_days`` bucket of their FIRST event; for each offset
    ``k in [0, max_periods)``, count how many of them were active in
    cohort period + k.  Returns ``(cohort_ts, period_k, n_active,
    n_cohort, retention)`` with retention 9-dp rounded (``k = 0``
    rows read 1.0 by construction — the self-check).

    Scale shape: ONE user-key exchange over the events table —
    first-period (``min``) and distinct-activity (``collect_set`` of
    distinct period ids, bounded by the series span in periods, NOT
    by row count) resolve in the SAME ``groupBy(user)``; the offsets
    then explode from the per-user row with the cohort already
    attached, so no second events shuffle and no user-key join
    (the r11 ``distinct()`` + join form exchanged the events table
    twice).  The final rollup groups on the (tiny) (cohort, k) pair;
    the cohort-size attach is a broadcast join of that same rollup's
    ``k = 0`` slice — every user with a first period is by
    construction active at offset 0, so ``n_cohort = n_active(k=0)``
    and both branches share the exchange (``ReusedExchange``,
    plan-pinned in tests).

    NULL-user rows are dropped up front (they are not a cohort member
    under any per-user semantic; mirrors :func:`funnel` — r11
    advisor); rows with NULL ``time_col`` never produce a period and
    fall out of both the cohort and the activity set, exactly as
    before.
    """
    from qctimeseries_spark.windows import _floor_div_sql

    if max_periods < 1:
        raise ValueError("max_periods must be >= 1")
    period_us = int(round(period_days * 86400 * 1_000_000))
    if period_us <= 0:
        raise ValueError("period_days must be positive")
    pexpr = F.expr(
        _floor_div_sql(f"unix_micros(`{time_col}`)", period_us)
    )
    src = events.filter(F.col(user_col).isNotNull()).select(
        F.col(user_col), pexpr.alias("_p")
    )
    per_user = src.groupBy(user_col).agg(
        F.min("_p").alias("_p0"),
        F.collect_set("_p").alias("_ps"),
    )
    hits = (
        per_user.select("_p0", F.explode("_ps").alias("_p"))
        .select("_p0", (F.col("_p") - F.col("_p0")).alias("_k"))
        .filter((F.col("_k") >= 0) & (F.col("_k") < max_periods))
    )
    per_cell = hits.groupBy("_p0", "_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )
    cohort_sizes = per_cell.filter(F.col("_k") == 0).select(
        "_p0", F.col("n_active").alias("n_cohort")
    )
    return (
        per_cell.join(F.broadcast(cohort_sizes), "_p0")
        .select(
            F.expr(f"timestamp_micros(_p0 * {period_us}L)").alias(
                "cohort_ts"
            ),
            F.col("_k").cast("int").alias("period_k"),
            "n_active",
            "n_cohort",
            F.round(
                F.col("n_active").cast("double")
                / F.col("n_cohort").cast("double"),
                9,
            ).alias("retention"),
        )
    )


def active_users(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    time_col: str = "ts",
    period_days: float = 1.0,
    window_periods: int = 7,
) -> DataFrame:
    """Rolling active-user counts — the DAU/WAU KPI: for every
    epoch-anchored ``period_days`` bucket with ≥1 active user, the
    distinct users active IN that bucket (``n_active_period``) and in
    the trailing ``window_periods``-bucket window ending at it
    (``n_active_window`` — DAU and WAU at the defaults).

    Scale shape: the corpus pays ONE exchange to distinct the
    (user, period) pairs — everything after runs on that thin pair
    table: per-period counts are a map-side-combinable groupBy, and
    the rolling count explodes each pair into the ``window_periods``
    buckets it contributes to (a bounded ×k expansion of the PAIR
    table, not the events table) followed by a distinct count — a
    user active on several days inside one window still counts once.
    No self-join of the events table, no per-day range join.

    NULL user / time rows drop (no activity is attributable to
    them).  Periods with zero active users emit no row — the caller
    joins a calendar if gap rows matter.
    """
    if window_periods < 1:
        raise ValueError("window_periods must be >= 1")
    period_us = int(round(period_days * 86400 * 1_000_000))
    if period_us <= 0:
        raise ValueError("period_days must be positive")
    from qctimeseries_spark.windows import _floor_div_sql

    pairs = (
        events.filter(
            F.col(user_col).isNotNull() & F.col(time_col).isNotNull()
        )
        .select(
            F.col(user_col),
            F.expr(
                _floor_div_sql(f"unix_micros(`{time_col}`)", period_us)
            ).alias("_p"),
        )
        .distinct()
    )
    per = pairs.groupBy("_p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_period")
    )
    contrib = pairs.select(
        user_col,
        F.explode(
            F.sequence(
                F.col("_p"), F.col("_p") + F.lit(window_periods - 1)
            )
        ).alias("_td"),
    )
    rolling = contrib.groupBy("_td").agg(
        F.count_distinct(F.col(user_col))
        .cast("bigint")
        .alias("n_active_window")
    )
    return per.join(rolling, per["_p"] == rolling["_td"]).select(
        F.expr(f"timestamp_micros(_p * {period_us}L)").alias("period_ts"),
        "n_active_period",
        "n_active_window",
    )


def attribution(
    events: DataFrame,
    *,
    conversion_type: str,
    touch_types: list[str],
    mode: str = "last",
    lookback_seconds: float | None = None,
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    ties: list[str] | None = None,
) -> DataFrame:
    """Marketing-style touch attribution: for every CONVERSION event
    (``type_col == conversion_type``), find the user's attributed
    TOUCH event — the last (``mode="last"``) or first
    (``mode="first"``) ``touch_types`` event strictly earlier (in µs)
    than the conversion, optionally restricted to the trailing
    ``lookback_seconds`` window.  The funnel asks "did the user
    complete THIS path"; attribution asks the converse — "which touch
    gets credit for each conversion".

    Returns one row PER CONVERSION: ``(user_col, *ties, conv_ts,
    touch_type, touch_ts, lag_us)``; conversions with no qualifying
    touch keep their row with NULL touch columns (the
    "unattributed" bucket every attribution report needs).
    ``lag_us`` is the exact integer microsecond gap — no float.

    Strictness is µs-level: a touch at the SAME microsecond as the
    conversion never attributes (RANGE frames cannot see sub-µs
    order).  Among same-µs touches, ``ties`` breaks the first/last
    election deterministically (struct min/max is lexicographic), so
    pass a unique column (e.g. the event id) whenever (user, time)
    can collide.

    Scale shape: the type pre-filter prunes the scan to conversion ∪
    touch rows (pushed predicate — at 100 TB the other event types
    never leave parquet), then ONE exchange on the user key carries
    both the election window and the output projection; the lookback
    bounds each row's RANGE frame, so per-partition window state is
    the lookback's row span, not the user's history.  No join, no
    second pass.
    """
    if mode not in ("first", "last"):
        raise ValueError(f"mode must be 'first' or 'last', got {mode!r}")
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
    ties = list(ties or [])
    src = events.filter(
        F.col(user_col).isNotNull()
        & F.col(time_col).isNotNull()
        & F.col(type_col).isin([conversion_type, *touch_types])
    ).select(
        F.col(user_col),
        F.col(type_col).alias("_type"),
        F.unix_micros(F.col(time_col)).alias("_us"),
        *ties,
    )
    lo = -lookback_us if lookback_us is not None else Window.unboundedPreceding
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col("_us").asc())
        .rangeBetween(lo, -1)
    )
    touch = F.when(
        F.col("_type") != F.lit(conversion_type),
        F.struct(
            F.col("_us").alias("_tus"),
            *[F.col(c).alias(f"_t_{c}") for c in ties],
            F.col("_type").alias("_ttype"),
        ),
    )
    elect = (F.max if mode == "last" else F.min)(touch).over(w)
    out = src.withColumn("_touch", elect).filter(
        F.col("_type") == F.lit(conversion_type)
    )
    return out.select(
        F.col(user_col),
        *ties,
        F.timestamp_micros(F.col("_us")).alias("conv_ts"),
        F.col("_touch._ttype").alias("touch_type"),
        F.timestamp_micros(F.col("_touch._tus")).alias("touch_ts"),
        (F.col("_us") - F.col("_touch._tus"))
        .cast("bigint")
        .alias("lag_us"),
    )
