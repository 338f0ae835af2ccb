"""Binned range join (operators/ranges.py): containment semantics,
bin-boundary coverage, and no duplicate matches across bins."""

from dbpedia_spotlight_spark.operators.ranges import point_in_interval_join


def _run(spark, points, intervals, w):
    p = spark.createDataFrame(points, "user_id long, pid long, ts_us long")
    iv = spark.createDataFrame(
        intervals, "user_id long, iv long, lo long, hi long"
    )
    return point_in_interval_join(
        p, iv, on="user_id", ts_col="ts_us", lo_col="lo", hi_col="hi",
        bin_width=w,
    ).collect()


def test_containment_and_boundaries(spark):
    intervals = [(1, 1, 100, 300), (1, 2, 300, 400), (2, 3, 0, 50)]
    points = [
        (1, 1, 100),  # inclusive lo
        (1, 2, 299),  # inside
        (1, 3, 300),  # hi exclusive -> interval 2 only
        (1, 4, 400),  # outside both
        (2, 5, 10),   # other key
        (1, 6, 10),   # before any interval of user 1
    ]
    out = {(r.pid, r.iv) for r in _run(spark, points, intervals, w=64)}
    assert out == {(1, 1), (2, 1), (3, 2), (5, 3)}


def test_multi_bin_interval_no_duplicates(spark):
    # interval spans many bins (width 10, span 95): every contained point
    # matches exactly once regardless of which bin it falls in
    intervals = [(1, 1, 5, 100)]
    points = [(1, i, t) for i, t in enumerate(range(0, 120, 7))]
    rows = _run(spark, points, intervals, w=10)
    expect = {i for i, t in enumerate(range(0, 120, 7)) if 5 <= t < 100}
    assert sorted(r.pid for r in rows) == sorted(expect)
    assert len(rows) == len({r.pid for r in rows})  # no dups


def test_interval_columns_prefixed(spark):
    p = spark.createDataFrame([(1, 1, 10)], "user_id long, pid long, ts_us long")
    iv = spark.createDataFrame(
        [(1, 5, 20)], "user_id long, ts_us long, hi long"
    )
    out = point_in_interval_join(
        p, iv, on="user_id", ts_col="ts_us", lo_col="ts_us", hi_col="hi",
        bin_width=8,
    )
    # clashing interval column renamed, lo resolves to the renamed side
    assert "iv_ts_us" in out.columns and out.count() == 1


def test_range_join_stays_equijoin(spark):
    # the bin trick must compile to a hash/sort-merge equi-join on
    # (key, bin) — never a nested-loop/cartesian theta join
    p = spark.createDataFrame(
        [(1, 1, 10)], "user_id long, pid long, ts_us long"
    )
    iv = spark.createDataFrame(
        [(1, 5, 20)], "user_id long, lo long, hi long"
    )
    plan = (
        point_in_interval_join(
            p, iv, on="user_id", ts_col="ts_us", lo_col="lo", hi_col="hi",
            bin_width=8,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_bin" in plan
