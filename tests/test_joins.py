"""As-of join: nearest-prior matching, ties, tolerance, collisions."""

import datetime as dt

import pytest

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
