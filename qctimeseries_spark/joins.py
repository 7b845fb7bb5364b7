"""Time-series joins Spark lacks as built-ins: as-of (nearest-prior)
join.

The reference package has no join operators (single-table model), but
any QC workflow that needs "the calibration/config/deployment record in
effect at each observation" reaches for an as-of join.  DuckDB ships it
natively (``ASOF JOIN``), which doubles as the oracle.

Scale design — the union trick, not a range self-join: a naive
``l JOIN r ON r.t <= l.t`` explodes to O(|l|·|r|) per key before
picking the max.  Instead both sides are unioned with a side tag and
sorted once per key; ``last(record, ignorenulls=True)`` over a
rows-unbounded-preceding window carries each right row's payload
forward to every later left row.  The carry moves ONE struct holding
the matched timestamp plus every payload column — not one carry per
column — so the returned ``r_*`` fields always originate from a
single right row even when payload columns contain NULLs (a
per-column carry would fill a NULL column from an older right
record; r10 advisor).  One shuffle on the ``by`` key, one
sort, zero row amplification — the plan a native as-of operator would
produce.  Skewed ``by`` keys behave like any windowed aggregation —
detect them with :func:`qctimeseries_spark.windows.hot_keys` and split
hot keys upstream (e.g. sub-key by coarse time range, as
:func:`~qctimeseries_spark.windows.sessionize_salted` does for
sessionization) if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _check_left_collisions(
    left: DataFrame,
    payload: list[str],
    *,
    internals: tuple[str, ...],
    prefixed: list[str],
) -> None:
    """Reject left inputs whose column names would be silently
    clobbered by the join machinery (r10 advisor): the internal
    side-tag/carry columns (a left ``_side`` would be overwritten to 1
    by ``withColumn``, corrupting output) and the final prefixed output
    names (a left ``r_cal`` would produce a duplicate-named result),
    mirroring :func:`interval_join`'s reserved-name guard."""
    cols = set(left.columns)
    overlap = sorted(set(payload) & cols)
    if overlap:
        raise ValueError(
            f"right payload columns {overlap} collide with left;"
            " rename or rely on right_prefix before joining"
        )
    reserved = sorted(cols & set(internals))
    if reserved:
        raise ValueError(
            f"left columns {reserved} collide with internal join "
            "machinery names — rename those input columns"
        )
    out_clash = sorted(cols & set(prefixed))
    if out_clash:
        raise ValueError(
            f"left columns {out_clash} collide with the prefixed "
            "output columns — rename them or pick a different "
            "right_prefix"
        )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    *,
    time_col: str,
    lo_col: str,
    hi_col: str,
    by: list[str] | str | None = None,
    bucket_hours: float = 24.0,
) -> DataFrame:
    """Point-in-interval join: left rows × intervals with
    ``lo <= t <= hi`` (plus optional ``by`` key equality).

    A raw inequality join degenerates to a (per-key) nested loop.  The
    bucketing trick turns it into an equi-join: every interval explodes
    to the coarse time buckets it overlaps (tiny — intervals/bucket
    span, not rows), left rows carry their single bucket, and the join
    key becomes (by, bucket) with the exact BETWEEN as a post-filter.
    Each (row, interval) pair meets in exactly one bucket — the row's
    own — so no dedup stage is needed.  Shuffle volume is bounded by
    bucket co-location instead of |left| × |intervals|; pick
    ``bucket_hours`` ≈ the typical interval length.
    """
    from qctimeseries_spark.windows import _floor_div_sql

    by = [by] if isinstance(by, str) else list(by or [])
    width_us = round(float(bucket_hours) * 3600.0 * 1_000_000)
    l_bucket = F.expr(_floor_div_sql(f"unix_micros(`{time_col}`)", width_us))
    i_lo = F.expr(_floor_div_sql(f"unix_micros(`{lo_col}`)", width_us))
    i_hi = F.expr(_floor_div_sql(f"unix_micros(`{hi_col}`)", width_us))
    lb = left.withColumn("_rj_bucket", l_bucket)
    ib = intervals.withColumn(
        "_rj_bucket", F.explode(F.sequence(i_lo, i_hi))
    )
    out = lb.join(ib, [*by, "_rj_bucket"]).filter(
        F.col(time_col).between(F.col(lo_col), F.col(hi_col))
    )
    return out.drop("_rj_bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | str | None = None,
    tolerance_seconds: float | None = None,
    right_prefix: str = "r_",
    block_hours: float = 24.0,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: each left row gains the payload of the most
    recent right row with ``right.on <= left.on`` (per ``by`` key) —
    or, with ``direction='forward'``, the EARLIEST right row with
    ``right.on >= left.on`` (the "next calibration" lookup); ties match
    in both directions.

    Right payload columns are prefixed with ``right_prefix``; a
    ``<prefix><on>`` column carries the matched right timestamp.  With
    ``tolerance_seconds``, matches older than the tolerance are nulled
    (pandas ``merge_asof(tolerance=...)`` semantics).  Ties on the time
    column match (at-or-before).

    NULL ``on`` values: left rows are always PRESERVED (left-join
    semantics) and come back with NULL payload — a NULL timestamp
    compares unknown to every right timestamp, so nothing matches.
    Timestamp-less RIGHT rows never match any left row (their carry
    record is built NULL, so the ignorenulls carry skips them).

    The matched timestamp and all payload columns are carried as one
    struct per right row, so every returned ``<prefix>*`` field comes
    from the SAME right record even when payload columns are NULL.

    Without ``by`` the ordered carry has no key to partition on, so it
    runs the two-phase block pattern instead of a global window (which
    would funnel the union through ONE task — round 2 guarded that
    footgun behind a row cap; this removes it): the carry-forward runs
    per ``block_hours`` time block in parallel, each block's latest
    right record is cumulated over the tiny #blocks frame, and rows
    whose block has no earlier in-block right row take the carried
    record.  Row-identical to the global window at any size.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    by = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in right.columns if c != on and c not in by]
    carried = [f"{right_prefix}{on}"] + [f"{right_prefix}{c}" for c in payload]
    _check_left_collisions(
        left, payload,
        internals=("_side", "_rec", "_blk", "_carry"),
        prefixed=carried,
    )

    # tag sides; the sort places right rows on the frame side of equal
    # timestamps (before left for backward, after left for forward) so
    # an exact-time record matches its own instant.  Each right row's
    # matched timestamp + payload travel as ONE struct (`_rec`), built
    # NULL when the right timestamp is NULL — so the ignorenulls carry
    # below both skips timestamp-less right rows entirely AND keeps
    # every carried field from the same right record (per-column
    # carries could mix rows when payload columns hold NULLs).
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        F.when(
            F.col(on).isNotNull(),
            F.struct(
                F.col(on).alias(f"{right_prefix}{on}"),
                *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
            ),
        ).alias("_rec"),
    )
    l = left.withColumn("_side", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    side_order = F.col("_side").desc() if fwd else F.col("_side").asc()
    frame = (0, Window.unboundedFollowing) if fwd else (
        Window.unboundedPreceding, 0
    )
    pick = (
        F.first(F.col("_rec"), ignorenulls=True)
        if fwd
        else F.last(F.col("_rec"), ignorenulls=True)
    )
    if by:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), side_order)
            .rowsBetween(*frame)
        )
        merged = merged.withColumn("_rec", pick.over(w))
    else:
        from qctimeseries_spark.windows import _NULL_BUCKET, _floor_div_sql

        block_us = int(round(block_hours * 3600 * 1_000_000))
        # NULL `on` rows get a sentinel block that sorts before every
        # real block (the with_rowid discipline): a bare unix_micros
        # block id is NULL there, and the inner join-back onto the
        # carry frame would silently DROP those left rows — breaking
        # left-join row preservation.  In the sentinel block NULL-time
        # left rows can only match NULL-time right rows (none, once
        # right is sane), and its boundary record is excluded from the
        # cross-block carry below, so a timestamp-less right record
        # never leaks into real blocks.  The sentinel sits on the side
        # the carry never reaches: before all blocks for backward
        # (nothing precedes it), after all blocks for forward (nothing
        # follows it) — so NULL-time rows also never RECEIVE a carry.
        sentinel = -_NULL_BUCKET if fwd else _NULL_BUCKET
        merged = merged.withColumn(
            "_blk",
            F.coalesce(
                F.expr(_floor_div_sql(f"unix_micros(`{on}`)", block_us)),
                F.lit(sentinel),
            ),
        )
        w = (
            Window.partitionBy("_blk")
            .orderBy(F.col(on).asc(), side_order)
            .rowsBetween(*frame)
        )
        merged = merged.withColumn("_rec", pick.over(w))
        # each block's nearest boundary right record (latest for
        # backward, earliest for forward — its carried struct equals
        # its own record), cumulated across the tiny #blocks frame
        bound_pick = F.min_by if fwd else F.max_by
        block_last = (
            merged.filter((F.col("_side") == 0) & F.col(on).isNotNull())
            .groupBy("_blk")
            .agg(bound_pick(F.col("_rec"), F.col(on)).alias("_bl"))
        )
        carry_frame = (1, Window.unboundedFollowing) if fwd else (
            Window.unboundedPreceding, -1
        )
        carry_pick = (
            F.first(F.col("_bl"), ignorenulls=True)
            if fwd
            else F.last(F.col("_bl"), ignorenulls=True)
        )
        carry = (
            merged.select("_blk").distinct()
            .join(block_last, "_blk", "left")
            .withColumn(
                "_carry",
                carry_pick.over(
                    Window.orderBy("_blk").rowsBetween(*carry_frame)
                ),
            )
            .select("_blk", "_carry")
        )
        merged = merged.join(F.broadcast(carry), "_blk")
        merged = merged.withColumn(
            "_rec", F.coalesce(F.col("_rec"), F.col("_carry"))
        ).drop("_blk", "_carry")

    # NULL-`on` left rows must come back with NULL payload (the
    # left-join contract above).  The keyless path guarantees that via
    # the sentinel block, but in the KEYED forward direction a NULL
    # timestamp sorts FIRST under `on ASC`, so its
    # (0, unboundedFollowing) frame would pick up the partition's
    # earliest real right record (r11 reviewer, reproduced live) —
    # null the carried record explicitly before unpacking.
    rec = F.when(F.col(on).isNotNull(), F.col("_rec"))
    out = merged.filter(F.col("_side") == 1).select(
        *left.columns,
        *[rec[c].alias(c) for c in carried],
    )
    if tolerance_seconds is not None:
        # one projection: the staleness test reads the ORIGINAL matched
        # timestamp for every column (sequential withColumn would null
        # the timestamp first and blind the later checks)
        age = F.unix_micros(F.col(on)) - F.unix_micros(
            F.col(f"{right_prefix}{on}")
        )
        if fwd:
            age = -age
        stale: Column = age > int(tolerance_seconds * 1_000_000)
        out = out.select(
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                if c in carried
                else F.col(c)
                for c in out.columns
            ]
        )
    return out


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | str | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left nearest-in-time join: each left row gains the payload of
    the right row whose ``on`` is closest in EITHER direction (per
    ``by`` key).  An exact tie (equidistant before/after) takes the
    EARLIER right row, and a right record at the left row's own
    instant matches at distance zero.  Right rows should be unique per
    (``by``, ``on``) — pre-aggregate duplicates upstream (the asof
    oracle pattern) — otherwise which same-instant payload wins is
    nondeterministic.

    With ``by`` this is ONE union + ONE keyed sort: the backward carry
    (last non-null preceding) and the forward carry (first non-null
    following) are two frames over the SAME partition/order spec, so
    Catalyst resolves both in a single Window operator — one shuffle
    on the key, not two as-of joins.  Each direction carries ONE
    struct (timestamp + payload), so the returned ``r_*`` fields all
    come from the same right row even when payload columns are NULL
    (r10 advisor — per-column carries could mix records).  Without
    ``by`` it composes :func:`asof_join`'s two-phase block pattern
    once per direction, keeping the keyless case off the single-task
    global-window path.

    NULL ``on`` left rows are preserved with NULL payload (left-join
    semantics, matching ``asof_join``); NULL-``on`` right rows never
    match.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in right.columns if c != on and c not in by]
    carried = [on] + payload
    _check_left_collisions(
        left, payload,
        internals=("_side", "_nj_rec", "_njb", "_njf"),
        prefixed=[f"{right_prefix}{c}" for c in carried],
    )

    if not by:
        b = asof_join(left, right, on=on, right_prefix="_njb_")
        both = asof_join(
            b, right, on=on, right_prefix="_njf_", direction="forward"
        )
        t = F.col(on)
        db = F.unix_micros(t) - F.unix_micros(F.col(f"_njb_{on}"))
        df_ = F.unix_micros(F.col(f"_njf_{on}")) - F.unix_micros(t)
        take_b = F.col(f"_njf_{on}").isNull() | (
            F.col(f"_njb_{on}").isNotNull() & (db <= df_)
        )

        def _pick_cols(c: str) -> Column:
            # each asof direction is internally row-consistent, and
            # take_b is one boolean for all columns — so the chosen
            # r_* fields stay row-consistent too
            chosen = F.when(take_b, F.col(f"_njb_{c}")).otherwise(
                F.col(f"_njf_{c}")
            )
            return F.when(t.isNull(), F.lit(None)).otherwise(
                chosen
            ).alias(f"{right_prefix}{c}")

        return both.select(
            *left.columns, *[_pick_cols(c) for c in carried]
        )

    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        F.when(
            F.col(on).isNotNull(),
            F.struct(
                F.col(on).alias(on),
                *[F.col(c).alias(c) for c in payload],
            ),
        ).alias("_nj_rec"),
    )
    merged = left.withColumn("_side", F.lit(1)).unionByName(
        r, allowMissingColumns=True
    )
    # order (on asc, right-before-left at ties): the backward frame
    # includes a same-instant right record (distance 0), the forward
    # frame starts at the current row and so excludes it — the tie
    # then resolves backward, which is the same unique record anyway
    order = [F.col(on).asc(), F.col("_side").asc()]
    wb = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    merged = merged.withColumn(
        "_njb", F.last(F.col("_nj_rec"), ignorenulls=True).over(wb)
    ).withColumn(
        "_njf", F.first(F.col("_nj_rec"), ignorenulls=True).over(wf)
    )
    out = merged.filter(F.col("_side") == 1)
    t = F.col(on)
    db = F.unix_micros(t) - F.unix_micros(F.col("_njb")[on])
    df_ = F.unix_micros(F.col("_njf")[on]) - F.unix_micros(t)
    take_b = F.col("_njf").isNull() | (
        F.col("_njb").isNotNull() & (db <= df_)
    )
    rec = F.when(t.isNull(), F.lit(None)).otherwise(
        F.when(take_b, F.col("_njb")).otherwise(F.col("_njf"))
    )
    return out.select(
        *left.columns,
        *[rec[c].alias(f"{right_prefix}{c}") for c in carried],
    )


def skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    strategy: str = "broadcast",
    salt: int = 16,
    threshold_frac: float = 0.05,
    sample_frac: float = 0.01,
    max_hot: int = 1000,
    seed: int = 7,
) -> DataFrame:
    """Skew-hardened equi-join: route the hot keys around the shuffle.

    A shuffled equi-join hashes both sides by the key, so a power-law
    key (half the fact table on one customer/domain/device) lands on
    ONE reducer — the straggler that dominates the stage at 100 TB.
    AQE's skew-join splitter only rescues sort-merge joins whose
    partitions it can subdivide; an aggregation-fed or bucketed plan,
    or a hot key that also dominates the BUILD side, still funnels.

    This operator makes the routing explicit and row-identical to the
    plain join: a sampled frequency probe (the :func:`~qctimeseries_spark
    .windows.hot_keys` estimator, bounded by ``max_hot``) splits the
    left side into hot and cold key sets.  Cold keys take the normal
    shuffled join (AQE still free to pick its physical form).  Hot keys
    take one of two shuffle-free physical forms, then the two legs
    union:

    - ``strategy="broadcast"``: the right-side slice matching the hot
      keys broadcasts; hot left rows never shuffle at all.  Right for
      the overwhelmingly common case — a fact table skewed against a
      dimension (the hot slice is at most |hot keys| × right rows per
      key).
    - ``strategy="salt"``: for big-big joins where even the hot slice
      of the right side is too large to broadcast.  Hot left rows gain
      a DETERMINISTIC salt (hash of the whole row mod ``salt``), the
      hot right slice replicates ``salt`` ways, and the join key
      becomes ``(key, salt)`` — the hot key's rows spread over
      ``salt`` reducers at a replication cost of |right hot slice| ×
      ``salt``.  Deterministic salting keeps the plan replayable
      (retries and oracles see identical routing).

    ``how`` supports ``inner`` and ``left`` (the split is exhaustive
    and disjoint on left rows, so both legs preserve outer semantics
    leg-locally).  The result is row-identical to ``left.join(right,
    on, how)`` for ANY hot-key estimate — the probe only affects the
    physical route — which is what lets the j4 oracle stay a plain SQL
    join.  An empty probe result degrades to exactly the plain join.
    """
    from qctimeseries_spark.windows import hot_keys as _hot

    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    if strategy not in ("broadcast", "salt"):
        raise ValueError(f"unknown strategy {strategy!r}")
    keys = [on] if isinstance(on, str) else list(on)
    probe_key = keys[0]
    hot = (
        _hot(
            left.select(probe_key),
            probe_key,
            threshold_frac=threshold_frac,
            sample_frac=sample_frac,
            seed=seed,
        )
        .orderBy(F.col("est_share").desc(), probe_key)
        .limit(max_hot)  # bounded driver collect by construction
        .collect()
    )
    hot_vals = [r[probe_key] for r in hot]
    if not hot_vals:
        return left.join(right, keys, how)
    is_hot = F.col(probe_key).isin(hot_vals)
    cold = left.filter(~is_hot | F.col(probe_key).isNull()).join(
        right, keys, how
    )
    left_hot = left.filter(is_hot)
    right_hot = right.filter(F.col(probe_key).isin(hot_vals))
    if strategy == "broadcast":
        hot_leg = left_hot.join(F.broadcast(right_hot), keys, how)
    else:
        salt_l = F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
        ).cast("int").alias("_salt")
        lh = left_hot.select("*", salt_l)
        # replicate the hot right slice salt-ways via a literal-array
        # explode — a narrow generator, not a join (keeps the plan
        # free of nested-loop joins)
        rh = right_hot.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        hot_leg = lh.join(rh, keys + ["_salt"], how).drop("_salt")
    return cold.unionByName(hot_leg)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    by: list[str] | str | None = None,
    bucket_hours: float = 24.0,
) -> DataFrame:
    """Interval-OVERLAP join: every (left, right) pair whose CLOSED
    intervals intersect (``l_lo <= r_hi AND r_lo <= l_hi``), plus
    optional ``by`` key equality — the two-sided sibling of
    :func:`range_join` (downtime × sessions, maintenance × activity,
    annotation spans × retrieval spans).

    A raw double-inequality join is a (per-key) nested loop.  Here
    BOTH sides explode to the coarse time buckets they span and meet
    on (by, bucket) equality with the exact overlap as a post-filter.
    An overlapping pair co-occupies every bucket their overlap spans —
    so to emit it exactly once WITHOUT a dedup shuffle, the pair is
    kept only in the FIRST bucket of the overlap
    (``bucket(max(l_lo, r_lo))``), which both sides are guaranteed to
    have exploded to.  Shuffle volume is bounded by bucket co-location
    (each interval ships ~span/bucket_hours copies); pick
    ``bucket_hours`` ≈ the typical interval length.
    """
    from qctimeseries_spark.windows import _floor_div_sql

    by = [by] if isinstance(by, str) else list(by or [])
    width_us = round(float(bucket_hours) * 3600.0 * 1_000_000)

    # the post-join overlap filter must reference each side's bounds
    # UNAMBIGUOUSLY even when the two inputs share bound column names
    # (both sides using lo/hi is the natural spelling — r8 advisor:
    # bare F.col(left_lo) raised AnalysisException there), so each
    # side carries its bounds into the join under internal aliases
    internals = ("_ij_l_lo", "_ij_l_hi", "_ij_r_lo", "_ij_r_hi",
                 "_ij_bucket")
    taken = set(left.columns) | set(right.columns)
    clash = [c for c in internals if c in taken]
    if clash:
        raise ValueError(
            f"interval_join reserves column names {clash} for its "
            "bucket machinery — rename those input columns"
        )

    def _bucket(col: str) -> Column:
        return F.expr(_floor_div_sql(f"unix_micros(`{col}`)", width_us))

    lb = (
        left.withColumn("_ij_l_lo", F.col(left_lo))
        .withColumn("_ij_l_hi", F.col(left_hi))
        .withColumn(
            "_ij_bucket",
            F.explode(F.sequence(_bucket(left_lo), _bucket(left_hi))),
        )
    )
    rb = (
        right.withColumn("_ij_r_lo", F.col(right_lo))
        .withColumn("_ij_r_hi", F.col(right_hi))
        .withColumn(
            "_ij_bucket",
            F.explode(F.sequence(_bucket(right_lo), _bucket(right_hi))),
        )
    )
    # the overlap's first bucket: bucket(max(l_lo, r_lo)) — both sides
    # exploded to it, so the pair meets there exactly once
    first_bucket = F.expr(
        _floor_div_sql(
            "unix_micros(greatest(`_ij_l_lo`, `_ij_r_lo`))", width_us
        )
    )
    out = lb.join(rb, [*by, "_ij_bucket"]).filter(
        (F.col("_ij_l_lo") <= F.col("_ij_r_hi"))
        & (F.col("_ij_r_lo") <= F.col("_ij_l_hi"))
        & (F.col("_ij_bucket") == first_bucket)
    )
    return out.drop(*internals)
