"""Streaming SCD2 changelog fold (streaming/temporal_stream.py): the
stream result must equal the batch fold_changelog over the same log."""

import datetime as dt

from dbpedia_spotlight_spark.operators.temporal import (
    fold_changelog,
    kb_as_of,
)
from dbpedia_spotlight_spark.streaming.temporal_stream import (
    current_intervals,
    run_changelog_stream,
)


def _t(s):
    return dt.datetime.fromisoformat(s)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts timestamp"
    )


def test_stream_fold_equals_batch_fold(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    kb = str(tmp_path / "kb")
    ckpt = str(tmp_path / "ckpt")

    b1 = [
        ("e1", "status", "OPEN", _t("2020-01-01")),
        ("e2", "status", "OPEN", _t("2020-01-02")),
        ("e1", "status", "OPEN", _t("2020-01-03")),  # no-op reassert
    ]
    b2 = [
        ("e1", "status", "DONE", _t("2020-02-01")),
        ("e2", "status", "FAIL", _t("2020-02-02")),
        ("e2", "status", "FAIL", _t("2020-02-05")),  # no-op in batch 2
        ("e3", "status", "NEW", _t("2020-02-03")),
    ]
    _changes(spark, b1).write.mode("append").parquet(str(inp))
    run_changelog_stream(spark, str(inp), kb, ckpt).awaitTermination(120)
    _changes(spark, b2).write.mode("append").parquet(str(inp))
    run_changelog_stream(spark, str(inp), kb, ckpt).awaitTermination(120)

    got = {
        tuple(r)
        for r in current_intervals(spark, kb)
        .select("subj", "pred", "obj", "valid_from", "valid_to")
        .collect()
    }
    want = {
        tuple(r)
        for r in fold_changelog(_changes(spark, b1 + b2))
        .select("subj", "pred", "obj", "valid_from", "valid_to")
        .collect()
    }
    assert got == want and len(got) == 5

    snap = {
        (r.subj, r.obj)
        for r in kb_as_of(current_intervals(spark, kb), "2020-02-04").collect()
    }
    assert snap == {("e1", "DONE"), ("e2", "FAIL"), ("e3", "NEW")}


def test_stream_fold_drops_history_rewriting_late_events(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    kb = str(tmp_path / "kb")
    ckpt = str(tmp_path / "ckpt")

    b1 = [
        ("e1", "status", "A", _t("2020-01-01")),
        ("e1", "status", "B", _t("2020-03-01")),
    ]
    # late event BEFORE the open interval (B since 03-01): dropped
    b2 = [("e1", "status", "Z", _t("2020-02-01"))]
    _changes(spark, b1).write.mode("append").parquet(str(inp))
    run_changelog_stream(spark, str(inp), kb, ckpt).awaitTermination(120)
    _changes(spark, b2).write.mode("append").parquet(str(inp))
    run_changelog_stream(spark, str(inp), kb, ckpt).awaitTermination(120)

    got = {
        (r.subj, r.obj, r.valid_from, r.valid_to)
        for r in current_intervals(spark, kb).collect()
    }
    assert got == {
        ("e1", "A", _t("2020-01-01"), _t("2020-03-01")),
        ("e1", "B", _t("2020-03-01"), None),
    }
