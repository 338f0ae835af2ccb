"""As-of join (operators/asof.py): backward match semantics, equal-ts
inclusion, tolerance, and the one-shuffle plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.asof import asof_join

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes):
    return _T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _m(10)),   # -> right at m5
            (2, 1, _m(30)),   # -> right at m30 (equal ts included)
            (3, 2, _m(1)),    # no preceding right -> nulls
            (4, 3, _m(50)),   # -> right at m0 (old; tolerance test)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _m(5), 10.0),
            (1, _m(8), 20.0),   # latest preceding for left m10
            (1, _m(30), 30.0),  # exactly simultaneous with left m30
            (2, _m(2), 40.0),   # after left m1 -> not visible
            (3, _m(0), 50.0),
        ],
        "user_id long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_equal_ts_and_miss(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert out[1].r_v == 20.0 and out[1].r_ts == _m(8)
    assert out[2].r_v == 30.0 and out[2].r_ts == _m(30)
    assert out[3].r_v is None and out[3].r_ts is None
    assert out[4].r_v == 50.0
    # left columns pass through untouched
    assert out[1].ts == _m(10) and out[1].user_id == 1


def test_asof_tolerance_nulls_stale_match(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r
        for r in asof_join(
            left,
            right,
            on="user_id",
            tolerance=F.expr("INTERVAL 15 MINUTES"),
        ).collect()
    }
    # user 3's only right row is 50 min old -> nulled, row kept
    assert out[4].r_v is None
    # fresh matches survive
    assert out[1].r_v == 20.0 and out[2].r_v == 30.0
    assert len(out) == 4


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # merge-join cost: exactly one hash exchange (of the tagged union),
    # no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
