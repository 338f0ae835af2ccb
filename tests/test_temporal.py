"""Interval-versioned KB: change-log folding, as-of snapshots, deltas
(operators/temporal.py)."""

import datetime

from dbpedia_spotlight_spark.operators.temporal import (
    fold_changelog,
    kb_as_of,
    kb_changes_between,
)


def _ts(day):
    return datetime.datetime(2024, 1, day)


def _log(spark):
    rows = [
        # e1 status: A (day 1), re-asserted A (day 3, no-op), B (day 5)
        ("e1", "status", "A", _ts(1)),
        ("e1", "status", "A", _ts(3)),
        ("e1", "status", "B", _ts(5)),
        # e2 status: X forever
        ("e2", "status", "X", _ts(2)),
        # e1 label: independent key, one version
        ("e1", "label", "L", _ts(4)),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts timestamp"
    )


def test_fold_changelog_collapses_noop_reassertions(spark):
    v = fold_changelog(_log(spark)).collect()
    by_fact = {(r.subj, r.pred, r.obj): (r.valid_from, r.valid_to) for r in v}
    assert len(v) == 4  # the day-3 re-assertion of A merged away
    assert by_fact[("e1", "status", "A")] == (_ts(1), _ts(5))
    assert by_fact[("e1", "status", "B")] == (_ts(5), None)
    assert by_fact[("e2", "status", "X")] == (_ts(2), None)
    assert by_fact[("e1", "label", "L")] == (_ts(4), None)


def test_kb_as_of_snapshots(spark):
    v = fold_changelog(_log(spark))
    at3 = {(r.subj, r.pred, r.obj) for r in kb_as_of(v, _ts(3)).collect()}
    assert at3 == {("e1", "status", "A"), ("e2", "status", "X")}
    at6 = {(r.subj, r.pred, r.obj) for r in kb_as_of(v, _ts(6)).collect()}
    assert at6 == {
        ("e1", "status", "B"),
        ("e2", "status", "X"),
        ("e1", "label", "L"),
    }
    # boundary: a version closing AT t is no longer valid at t
    at5 = {(r.subj, r.pred, r.obj) for r in kb_as_of(v, _ts(5)).collect()}
    assert ("e1", "status", "A") not in at5
    assert ("e1", "status", "B") in at5


def test_kb_changes_between(spark):
    v = fold_changelog(_log(spark))
    delta = {
        (r.subj, r.pred, r.obj, r.op)
        for r in kb_changes_between(v, _ts(3), _ts(6)).collect()
    }
    assert delta == {
        ("e1", "status", "A", "del"),
        ("e1", "status", "B", "add"),
        ("e1", "label", "L", "add"),
    }
