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


def test_allen_all_thirteen_relations(spark):
    from dbpedia_spotlight_spark.operators.temporal import interval_align

    import datetime as dt

    d = dt.date
    # right interval fixed [10, 20); left varies to hit every relation
    cases = [
        ("equals", d(2020, 1, 10), d(2020, 1, 20)),
        ("before", d(2020, 1, 1), d(2020, 1, 5)),
        ("after", d(2020, 1, 25), d(2020, 1, 28)),
        ("meets", d(2020, 1, 5), d(2020, 1, 10)),
        ("met_by", d(2020, 1, 20), d(2020, 1, 25)),
        ("starts", d(2020, 1, 10), d(2020, 1, 15)),
        ("started_by", d(2020, 1, 10), d(2020, 1, 25)),
        ("finishes", d(2020, 1, 15), d(2020, 1, 20)),
        ("finished_by", d(2020, 1, 5), d(2020, 1, 20)),
        ("during", d(2020, 1, 12), d(2020, 1, 18)),
        ("contains", d(2020, 1, 5), d(2020, 1, 25)),
        ("overlaps", d(2020, 1, 5), d(2020, 1, 15)),
        ("overlapped_by", d(2020, 1, 15), d(2020, 1, 25)),
    ]
    left = spark.createDataFrame(
        [(name, s, e) for name, s, e in cases],
        "key string, valid_from date, valid_to date",
    )
    right = spark.createDataFrame(
        [(name, d(2020, 1, 10), d(2020, 1, 20)) for name, _, _ in cases],
        "key string, valid_from date, valid_to date",
    )
    out = interval_align(left, right, on="key")
    got = {r.key: r.relation for r in out.collect()}
    assert got == {name: name for name, _, _ in cases}


def test_interval_overlap_pairs_matches_naive(spark):
    import datetime as dt

    from dbpedia_spotlight_spark.operators.temporal import (
        interval_overlap_pairs,
    )

    d = dt.date(2020, 1, 1)
    rows = [
        (f"i{k}", d + dt.timedelta(days=7 * k), d + dt.timedelta(days=7 * k + 40))
        for k in range(12)
    ]
    iv = spark.createDataFrame(rows, "id string, valid_from date, valid_to date")
    got = {
        (r.a, r.b)
        for r in interval_overlap_pairs(iv, bucket_width_days=10).collect()
    }
    naive = {
        (a[0], b[0])
        for a in rows
        for b in rows
        if a[0] < b[0] and a[1] < b[2] and b[1] < a[2]
    }
    assert got == naive and len(naive) > 0


def test_interval_overlap_pairs_disjoint_empty(spark):
    import datetime as dt

    from dbpedia_spotlight_spark.operators.temporal import (
        interval_overlap_pairs,
    )

    d = dt.date(2020, 1, 1)
    rows = [
        ("x", d, d + dt.timedelta(days=5)),
        ("y", d + dt.timedelta(days=400), d + dt.timedelta(days=405)),
    ]
    iv = spark.createDataFrame(rows, "id string, valid_from date, valid_to date")
    assert interval_overlap_pairs(iv).count() == 0


def test_interval_coalesce_merges_overlap_and_adjacency():
    from dbpedia_spotlight_spark.operators.temporal import interval_coalesce
    import pytest

    with pytest.raises(ValueError):
        interval_coalesce(None, keys=[])


def test_interval_coalesce_islands(spark):
    from dbpedia_spotlight_spark.operators.temporal import interval_coalesce

    rows = [
        # overlap [1,4)+[3,6) and adjacency [6,8) -> one island [1,8)
        ("e1", "p", "v", 1, 4),
        ("e1", "p", "v", 3, 6),
        ("e1", "p", "v", 6, 8),
        # gap of 1 -> separate island
        ("e1", "p", "v", 9, 10),
        # contained interval swallowed
        ("e2", "p", "v", 1, 10),
        ("e2", "p", "v", 2, 3),
        # different obj never merges
        ("e2", "p", "w", 3, 4),
    ]
    f = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, valid_from int, valid_to int",
    )
    got = {
        (r.subj, r.obj, r.valid_from, r.valid_to)
        for r in interval_coalesce(f).collect()
    }
    assert got == {
        ("e1", "v", 1, 8),
        ("e1", "v", 9, 10),
        ("e2", "v", 1, 10),
        ("e2", "w", 3, 4),
    }


def test_interval_subtract_splits_and_drops(spark):
    from dbpedia_spotlight_spark.operators.temporal import interval_subtract

    facts = spark.createDataFrame(
        [
            ("e1", "p", "v", 0, 10),   # split twice
            ("e1", "p", "v", 20, 25),  # untouched
            ("e2", "p", "v", 0, 4),    # fully covered -> dropped
            ("e3", "p", "v", 5, 9),    # clipped at both ends
        ],
        "subj string, pred string, obj string, valid_from int, valid_to int",
    )
    retr = spark.createDataFrame(
        [
            ("e1", "p", "v", 2, 4),
            ("e1", "p", "v", 6, 7),
            ("e2", "p", "v", 0, 6),
            ("e3", "p", "v", 0, 6),
            ("e3", "p", "v", 8, 12),
            ("e9", "p", "v", 0, 99),  # key with no facts: ignored
        ],
        "subj string, pred string, obj string, valid_from int, valid_to int",
    )
    got = {
        (r.subj, r.valid_from, r.valid_to)
        for r in interval_subtract(facts, retr).collect()
    }
    assert got == {
        ("e1", 0, 2),
        ("e1", 4, 6),
        ("e1", 7, 10),
        ("e1", 20, 25),
        ("e3", 6, 8),
    }


def test_validity_histogram_sweep(spark):
    from dbpedia_spotlight_spark.operators.temporal import validity_histogram

    f = spark.createDataFrame(
        [("p", 1, 5), ("p", 3, 7), ("p", 5, 9), ("q", 0, 2)],
        "pred string, valid_from int, valid_to int",
    )
    got = {(r.pred, r.t): r.active for r in validity_histogram(f).collect()}
    # at t=5 one interval closes and another opens: net active stays 2
    assert got == {
        ("p", 1): 1,
        ("p", 3): 2,
        ("p", 5): 2,
        ("p", 7): 1,
        ("p", 9): 0,
        ("q", 0): 1,
        ("q", 2): 0,
    }


def test_temporal_constraints_violations(spark):
    from dbpedia_spotlight_spark.operators.temporal import temporal_constraints

    f = spark.createDataFrame(
        [
            ("e1", "born", 1950),
            ("e1", "died", 2000),   # fine
            ("e2", "born", 1990),
            ("e2", "died", 1980),   # violation
            ("e3", "founded", 5),
            ("e3", "acquired", 3),  # violation (second rule)
            ("e3", "born", 9),      # no died -> nothing
        ],
        "subj string, pred string, valid_from int",
    )
    got = {
        (r.subj, r.rule, r.t_before, r.t_after)
        for r in temporal_constraints(
            f, [("born", "died"), ("founded", "acquired")]
        ).collect()
    }
    assert got == {
        ("e2", "born<died", 1990, 1980),
        ("e3", "founded<acquired", 5, 3),
    }


def test_kb_timeline_counts(spark):
    import datetime

    from dbpedia_spotlight_spark.operators.temporal import kb_timeline

    v = spark.createDataFrame(
        [("e1", "p", "a", datetime.datetime(2024, 1, 1),
          datetime.datetime(2024, 3, 1)),
         ("e1", "p", "b", datetime.datetime(2024, 3, 1), None),
         ("e2", "p", "c", datetime.datetime(2024, 2, 1), None)],
        "subj string, pred string, obj string, "
        "valid_from timestamp, valid_to timestamp",
    )
    got = {
        (r.pred, str(r.at)): r.n_facts
        for r in kb_timeline(
            v,
            [datetime.datetime(2024, 2, 15), datetime.datetime(2024, 4, 1)],
        ).collect()
    }
    # both instants see exactly 2 live facts (a-or-b for e1, c for e2)
    assert got == {
        ("p", "2024-02-15 00:00:00"): 2,
        ("p", "2024-04-01 00:00:00"): 2,
    }
