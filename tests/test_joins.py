"""As-of join: nearest-prior matching, ties, tolerance, collisions."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from qctimeseries_spark.joins import asof_join


def _ts(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(5)), (3, 1, _ts(10)), (4, 2, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 10.0), (1, _ts(5), 20.0), (2, _ts(9), 30.0)],
        "user_id long, ts timestamp, cal double",
    )
    return left, right


def test_asof_matches_most_recent_prior(spark, sides):
    left, right = sides
    out = {
        r.event_id: (r.r_ts, r.r_cal)
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    assert out[1] == (None, None)            # nothing at-or-before t=0
    assert out[2] == (_ts(5), 20.0)          # exact-time record matches (ties)
    assert out[3] == (_ts(5), 20.0)          # carried forward past t=5
    assert out[4] == (None, None)            # user 2's record is later


def test_asof_tolerance_nulls_stale_matches(spark, sides):
    left, right = sides
    out = {
        r.event_id: r.r_cal
        for r in asof_join(
            left, right, on="ts", by="user_id",
            tolerance_seconds=3600.0,  # 1 h
        ).collect()
    }
    assert out[2] == 20.0   # same-instant match, age 0
    assert out[3] is None   # 5 h old > tolerance


def test_asof_rejects_column_collision(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("cal", "event_id"),
                  on="ts", by="user_id")


def test_range_join_bucket_boundaries(spark):
    """Intervals spanning bucket boundaries still match every contained
    row exactly once (the pair meets only in the row's own bucket)."""
    from qctimeseries_spark.joins import range_join

    left = spark.createDataFrame(
        [(i, 1, _ts(i)) for i in range(0, 60, 3)],  # hours 0..57
        "event_id long, user_id long, ts timestamp",
    )
    # one interval inside a bucket, one spanning the 24h bucket edge
    iv = spark.createDataFrame(
        [(100, 1, _ts(2), _ts(7)), (200, 1, _ts(20), _ts(30))],
        "iv_id long, user_id long, lo timestamp, hi timestamp",
    )
    out = range_join(
        left, iv, time_col="ts", lo_col="lo", hi_col="hi",
        by="user_id", bucket_hours=24,
    )
    counts = {r.iv_id: r.n for r in
              out.groupBy("iv_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {100: 2, 200: 4}  # h∈{3,6} and h∈{21,24,27,30}
    # no duplicates: every (event, interval) pair appears once
    assert out.count() == out.select("event_id", "iv_id").distinct().count()


def test_asof_no_by_key_global(spark):
    left = spark.createDataFrame(
        [(1, _ts(2)), (2, _ts(8))], "event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(_ts(1), "a"), (_ts(7), "b")], "ts timestamp, tag string"
    )
    out = {r.event_id: r.r_tag
           for r in asof_join(left, right, on="ts").collect()}
    assert out == {1: "a", 2: "b"}


def test_asof_keyless_block_path_equals_small_blocks(spark):
    """The keyless as-of runs block + boundary-carry (no global sort);
    shrinking blocks so matches cross many boundaries must not change
    the result, and rows before any right record stay unmatched."""
    base_us = int(
        dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    left = spark.range(200).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(base_us) + F.col("id") * 3600 * 1_000_000
        ).alias("ts"),
    )
    right = spark.createDataFrame(
        [(_ts(5), "a"), (_ts(90), "b")], "ts timestamp, tag string"
    )
    big = {r.event_id: r.r_tag
           for r in asof_join(left, right, on="ts",
                              block_hours=10000.0).collect()}
    small = {r.event_id: r.r_tag
             for r in asof_join(left, right, on="ts",
                                block_hours=6.0).collect()}
    assert big == small
    assert small[0] is None          # before the first right record
    assert small[6] == "a"
    assert small[89] == "a"          # carried across many 6h blocks
    assert small[199] == "b"


def test_asof_keyless_preserves_null_timestamp_left_rows(spark):
    """Left-join row preservation: NULL `on` left rows must come back
    (with NULL payload) in BOTH directions — the block path's join onto
    the carry frame once silently dropped them (NULL block id)."""
    left = spark.createDataFrame(
        [(1, _ts(2)), (2, None), (3, _ts(8)), (4, None)],
        "event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(_ts(1), "a"), (_ts(7), "b")], "ts timestamp, tag string"
    )
    for direction in ("backward", "forward"):
        out = {
            r.event_id: r.r_tag
            for r in asof_join(
                left, right, on="ts", direction=direction
            ).collect()
        }
        assert set(out) == {1, 2, 3, 4}, direction  # nothing dropped
        assert out[2] is None and out[4] is None, direction
    back = {
        r.event_id: r.r_tag
        for r in asof_join(left, right, on="ts").collect()
    }
    assert back[1] == "a" and back[3] == "b"


def test_asof_forward_matches_pandas(spark):
    """direction='forward' equals pandas merge_asof(direction='forward')
    for keyed and keyless (block path) inputs, including exact ties."""
    import pandas as pd

    lh = [0, 2, 5, 5, 9, 40]
    rh = [1, 5, 30]
    left = spark.createDataFrame(
        [(i, 1, _ts(h)) for i, h in enumerate(lh)],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(h), float(h)) for h in rh], "k long, ts timestamp, payload double"
    )
    want = pd.merge_asof(
        pd.DataFrame({"event_id": range(len(lh)),
                      "ts": [_ts(h) for h in lh]}).sort_values("ts"),
        pd.DataFrame({"ts": [_ts(h) for h in rh],
                      "payload": [float(h) for h in rh]}),
        on="ts", direction="forward",
    )
    expect = {
        r.event_id: (None if pd.isna(r.payload) else r.payload)
        for _, r in want.iterrows()
    }
    keyed = {
        r.event_id: r.r_payload
        for r in asof_join(left, right, on="ts", by="k",
                           direction="forward").collect()
    }
    keyless = {
        r.event_id: r.r_payload
        for r in asof_join(left.drop("k"), right.drop("k"), on="ts",
                           direction="forward", block_hours=2.0).collect()
    }
    assert keyed == expect and keyless == expect
    assert expect[2] == 5.0   # exact tie at h=5 matches its own instant
    assert expect[5] is None  # after the last right record


# ---------------------------------------------------------------------------
# skew_join (j4)
# ---------------------------------------------------------------------------


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def skewed_sides(spark):
    # 80% of fact rows on key 1; some keys absent from the dim side
    fact = spark.createDataFrame(
        [(i, 1 if i % 5 != 0 else (i % 7) + 1, float(i)) for i in range(500)],
        "row_id bigint, k bigint, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 5)], "k bigint, label string"
    )
    return fact, dim


@pytest.mark.parametrize("strategy", ["broadcast", "salt"])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_join_row_identical_to_plain_join(
    spark, skewed_sides, strategy, how
):
    from qctimeseries_spark.joins import skew_join

    fact, dim = skewed_sides
    got = skew_join(
        fact, dim, "k", how=how, strategy=strategy, salt=4,
        threshold_frac=0.05, sample_frac=0.5,
    )
    want = fact.join(dim, "k", how)
    cols = ["row_id", "k", "v", "label"]
    assert _sorted_rows(got.select(cols), cols) == _sorted_rows(
        want.select(cols), cols
    )


def test_skew_join_routes_hot_keys_off_the_shuffle(spark, skewed_sides):
    from qctimeseries_spark.joins import skew_join

    fact, dim = skewed_sides
    got = skew_join(
        fact, dim, "k", strategy="broadcast",
        threshold_frac=0.05, sample_frac=0.5,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # two legs unioned; the hot leg is a broadcast join (no shuffle of
    # the hot fact rows)
    assert "Union" in plan and "BroadcastHashJoin" in plan


def test_skew_join_empty_probe_degrades_to_plain_join(spark):
    from qctimeseries_spark.joins import skew_join

    fact = spark.createDataFrame(
        [(i, i, float(i)) for i in range(40)], "row_id bigint, k bigint, v double"
    )
    dim = spark.createDataFrame([(1, "a")], "k bigint, label string")
    # uniform keys: nothing crosses threshold_frac -> plain join path
    got = skew_join(fact, dim, "k", how="left", threshold_frac=0.5)
    assert got.count() == 40
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan


def test_interval_join_exactly_once_across_buckets(spark):
    """Overlap pairs are emitted exactly once even when the overlap
    spans several buckets; touching endpoints count (closed
    intervals); disjoint pairs don't; result equals the naive theta
    join."""
    import datetime as dt

    from qctimeseries_spark.joins import interval_join

    t0 = dt.datetime(2024, 1, 1)
    h = lambda x: t0 + dt.timedelta(hours=x)
    left = spark.createDataFrame(
        [(1, h(0), h(60)),   # spans 3 daily buckets
         (2, h(5), h(6)),
         (3, h(100), h(101))],
        "lid long, a_lo timestamp, a_hi timestamp",
    )
    right = spark.createDataFrame(
        [(10, h(50), h(70)),   # overlaps lid=1 across a bucket edge
         (11, h(6), h(7)),     # touches lid=2 at h(6) exactly
         (12, h(200), h(201))],
        "rid long, m_lo timestamp, m_hi timestamp",
    )
    out = interval_join(
        left, right,
        left_lo="a_lo", left_hi="a_hi",
        right_lo="m_lo", right_hi="m_hi",
        bucket_hours=24.0,
    ).select("lid", "rid").collect()
    got = sorted((r.lid, r.rid) for r in out)
    naive = sorted(
        (l.lid, r.rid)
        for l in left.collect()
        for r in right.collect()
        if l.a_lo <= r.m_hi and r.m_lo <= l.a_hi
    )
    assert got == naive == [(1, 10), (1, 11), (2, 11)]
    assert len(got) == len(set(got))  # exactly-once, no bucket dups


def test_interval_join_respects_by_keys(spark):
    """With a by key, pairs only form within the same key even when
    intervals from different keys overlap in time."""
    import datetime as dt

    from qctimeseries_spark.joins import interval_join

    t0 = dt.datetime(2024, 1, 1)
    h = lambda x: t0 + dt.timedelta(hours=x)
    left = spark.createDataFrame(
        [("u1", 1, h(0), h(10)), ("u2", 2, h(0), h(10))],
        "u string, lid long, a_lo timestamp, a_hi timestamp",
    )
    right = spark.createDataFrame(
        [("u1", 10, h(5), h(6)), ("u2", 11, h(5), h(6))],
        "u string, rid long, m_lo timestamp, m_hi timestamp",
    )
    out = interval_join(
        left, right,
        left_lo="a_lo", left_hi="a_hi",
        right_lo="m_lo", right_hi="m_hi",
        by="u", bucket_hours=24.0,
    ).select("lid", "rid").collect()
    assert sorted((r.lid, r.rid) for r in out) == [(1, 10), (2, 11)]


def test_interval_join_shared_bound_names(spark):
    """Both inputs naming their bounds lo/hi must work (r8 advisor:
    the overlap filter used bare column refs, so shared bound names
    died with an ambiguous-reference AnalysisException)."""
    import datetime as dt

    from qctimeseries_spark.joins import interval_join

    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(0), t(5)), (2, t(10), t(12))],
        "lid int, lo timestamp, hi timestamp",
    )
    right = spark.createDataFrame(
        [(10, t(4), t(6)), (20, t(13), t(14))],
        "rid int, lo timestamp, hi timestamp",
    )
    out = interval_join(
        left, right, left_lo="lo", left_hi="hi",
        right_lo="lo", right_hi="hi", bucket_hours=2.0,
    )
    assert [(r.lid, r.rid) for r in out.collect()] == [(1, 10)]
    # reserved internal names are refused loudly
    bad = left.withColumnRenamed("lid", "_ij_bucket")
    try:
        interval_join(
            bad, right, left_lo="lo", left_hi="hi",
            right_lo="lo", right_hi="hi",
        )
    except ValueError as e:
        assert "_ij_bucket" in str(e)
    else:
        raise AssertionError("reserved-name clash not detected")


# ---------------------------------------------------------------------------
# nearest_join (j7)
# ---------------------------------------------------------------------------


def _nearest_cases(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(0)),    # nothing before -> forward match
            (2, 1, _ts(4)),    # 3h after a, 2h before b -> b
            (3, 1, _ts(2)),    # 1h after a, 4h before b -> a
            (4, 1, _ts(3.5)),  # 2.5h either way: exact tie -> earlier (a)
            (5, 1, _ts(6)),    # exact instant of b -> b at distance 0
            (6, 2, _ts(5)),    # user 2 has no records -> nulls
            (7, 1, None),      # NULL ts -> nulls, row preserved
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 10.0), (1, _ts(6), 20.0)],
        "user_id long, ts timestamp, cal double",
    )
    expect = {
        1: (_ts(1), 10.0),
        2: (_ts(6), 20.0),
        3: (_ts(1), 10.0),
        4: (_ts(1), 10.0),
        5: (_ts(6), 20.0),
        6: (None, None),
        7: (None, None),
    }
    return left, right, expect


def test_nearest_join_picks_closer_side_and_breaks_ties_earlier(spark):
    from qctimeseries_spark.joins import nearest_join

    left, right, expect = _nearest_cases(spark)
    out = {
        r.event_id: (r.r_ts, r.r_cal)
        for r in nearest_join(left, right, on="ts", by="user_id").collect()
    }
    assert out == expect


def test_nearest_join_keyless_block_path_matches_keyed(spark):
    """The keyless path (two block as-of passes) must agree with the
    keyed single-window path on a single-key input, including across
    block boundaries."""
    from qctimeseries_spark.joins import nearest_join

    left, right, expect = _nearest_cases(spark)
    one_user = left.filter(F.col("user_id") == 1).drop("user_id")
    keyless = {
        r.event_id: (r.r_ts, r.r_cal)
        for r in nearest_join(
            one_user, right.drop("user_id"), on="ts"
        ).collect()
    }
    assert keyless == {k: v for k, v in expect.items() if k not in (6,)}


def test_nearest_join_single_window_pass(spark):
    """Both directional carries must resolve in ONE Window operator
    (same partition/order spec) — one shuffle, not two as-of joins."""
    from qctimeseries_spark.joins import nearest_join
    from qctimeseries_spark.plans import plan_summary

    left, right, _ = _nearest_cases(spark)
    out = nearest_join(left, right, on="ts", by="user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_windows = sum(
        1 for line in plan.splitlines() if line.strip().startswith("Window [")
        or "- Window [" in line
    )
    assert n_windows == 1, plan
    ps = plan_summary(out)
    assert ps["global_windows"] == 0 and ps["shuffles"] <= 1, ps


def test_nearest_join_rejects_column_collision(spark):
    from qctimeseries_spark.joins import nearest_join

    left, right, _ = _nearest_cases(spark)
    with pytest.raises(ValueError, match="collide"):
        nearest_join(
            left.withColumn("cal", F.lit(0.0)), right, on="ts", by="user_id"
        )


# ---------------------------------------------------------------------------
# struct-carry row consistency (r10 advisor): payload NULLs must not be
# back-filled from a DIFFERENT right record than the matched timestamp
# ---------------------------------------------------------------------------


@pytest.fixture()
def nullable_right(spark):
    # the nearest record (t=5h) has a NULL cal; a per-column carry
    # would fill r_cal from the OLDER t=1h record while r_ts/r_src
    # come from t=5h — mixing two right rows in one output row
    return spark.createDataFrame(
        [(1, _ts(1), 10.0, "a"), (1, _ts(5), None, "b"),
         (1, _ts(9), 30.0, "c")],
        "user_id long, ts timestamp, cal double, src string",
    )


def test_asof_null_payload_stays_row_consistent(spark, nullable_right):
    left = spark.createDataFrame(
        [(1, 1, _ts(6))], "event_id long, user_id long, ts timestamp"
    )
    row = asof_join(
        left, nullable_right, on="ts", by="user_id"
    ).collect()[0]
    assert (row.r_ts, row.r_cal, row.r_src) == (_ts(5), None, "b")
    fwd = asof_join(
        left.withColumn("ts", F.lit(_ts(4))), nullable_right,
        on="ts", by="user_id", direction="forward",
    ).collect()[0]
    assert (fwd.r_ts, fwd.r_cal, fwd.r_src) == (_ts(5), None, "b")


def test_asof_keyless_block_path_row_consistent(spark, nullable_right):
    left = spark.createDataFrame(
        [(1, _ts(6))], "event_id long, ts timestamp"
    )
    row = asof_join(
        left, nullable_right.drop("user_id"), on="ts", block_hours=2.0
    ).collect()[0]
    assert (row.r_ts, row.r_cal, row.r_src) == (_ts(5), None, "b")


def test_nearest_join_null_payload_row_consistent(spark, nullable_right):
    from qctimeseries_spark.joins import nearest_join

    left = spark.createDataFrame(
        [(1, 1, _ts(6)), (2, 1, _ts(8.5))],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r.event_id: (r.r_ts, r.r_cal, r.r_src)
        for r in nearest_join(
            left, nullable_right, on="ts", by="user_id"
        ).collect()
    }
    assert out[1] == (_ts(5), None, "b")    # 1h back beats 3h fwd
    assert out[2] == (_ts(9), 30.0, "c")    # 0.5h fwd beats 3.5h back
    keyless = {
        r.event_id: (r.r_ts, r.r_cal, r.r_src)
        for r in nearest_join(
            left.drop("user_id"), nullable_right.drop("user_id"), on="ts"
        ).collect()
    }
    assert keyless == out


def test_asof_null_timestamp_right_rows_never_match(spark):
    # a timestamp-less right record must neither match nor leak its
    # payload into any carry (its struct is built NULL)
    left = spark.createDataFrame(
        [(1, 1, _ts(6))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, _ts(2), 10.0)],
        "user_id long, ts timestamp, cal double",
    )
    row = asof_join(left, right, on="ts", by="user_id").collect()[0]
    assert (row.r_ts, row.r_cal) == (_ts(2), 10.0)


def test_joins_reject_reserved_and_prefixed_left_names(spark, sides):
    from qctimeseries_spark.joins import nearest_join

    left, right = sides
    with pytest.raises(ValueError, match="internal join machinery"):
        asof_join(left.withColumn("_side", F.lit(9)), right,
                  on="ts", by="user_id")
    with pytest.raises(ValueError, match="prefixed output"):
        asof_join(left.withColumn("r_cal", F.lit(0.0)), right,
                  on="ts", by="user_id")
    with pytest.raises(ValueError, match="internal join machinery"):
        nearest_join(left.withColumn("_njb", F.lit(1)), right,
                     on="ts", by="user_id")
    with pytest.raises(ValueError, match="prefixed output"):
        nearest_join(left.withColumn("r_ts", F.lit(_ts(0))), right,
                     on="ts", by="user_id")


def test_asof_keyed_forward_null_timestamp_left_rows(spark):
    """r11 reviewer (reproduced live): a NULL-ts left row sorts FIRST
    under `on ASC`, so in the KEYED forward direction its
    (0, unboundedFollowing) frame saw the partition's earliest right
    record — it must come back with NULL payload instead."""
    left = spark.createDataFrame(
        [(1, 1, _ts(3)), (2, 1, None)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 10.0)], "user_id long, ts timestamp, cal double"
    )
    for direction in ("forward", "backward"):
        out = {
            r.event_id: (r.r_ts, r.r_cal)
            for r in asof_join(
                left, right, on="ts", by="user_id", direction=direction
            ).collect()
        }
        assert out[2] == (None, None), (direction, out)
        if direction == "forward":
            assert out[1] == (_ts(5), 10.0)
