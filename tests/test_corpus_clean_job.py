"""End-to-end corpus-clean job (jobs/corpus_clean_job.py): stage
accounting is monotone, output matches the last stage, PII is scrubbed."""

import json
import os
import sys

import pytest

SF_DIR = "/root/testdata/sf0.001"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_corpus_clean_job_stages(spark, tmp_path, capsys):
    import corpus_clean_job

    out = str(tmp_path / "clean")
    corpus_clean_job.main(
        [
            "--input",
            f"{SF_DIR}/documents.parquet",
            "--output",
            out,
            "--langs",
            "en,es",
            "--min-words",
            "10",
            "--buckets",
            "4",
        ]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    counts = list(m["stages"].values())
    assert counts == sorted(counts, reverse=True)  # stages only drop rows
    assert m["rows_written"] == counts[-1] > 0
    cleaned = spark.read.parquet(out)
    assert cleaned.count() == m["rows_written"]
    assert set(cleaned.columns) >= {"doc_id", "text", "bucket"}


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_dsir_select_job(spark, tmp_path, capsys):
    import dsir_select_job

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    raw_p, tgt_p = str(tmp_path / "raw"), str(tmp_path / "tgt")
    docs.where(F.col("doc_id") % 11 != 0).write.parquet(raw_p)
    docs.where(F.col("doc_id") % 11 == 0).write.parquet(tgt_p)
    out = str(tmp_path / "sel")
    dsir_select_job.main(
        ["--raw", raw_p, "--target", tgt_p, "--output", out, "-k", "25"]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    assert m["rows_written"] == 25
    sel = spark.read.parquet(out)
    assert sel.count() == 25
    assert {"doc_id", "text", "logw", "key"} <= set(sel.columns)
    # determinism: rerun selects the identical ids
    out2 = str(tmp_path / "sel2")
    dsir_select_job.main(
        ["--raw", raw_p, "--target", tgt_p, "--output", out2, "-k", "25"]
    )
    ids = lambda p: sorted(  # noqa: E731
        r.doc_id for r in spark.read.parquet(p).select("doc_id").collect()
    )
    assert ids(out) == ids(out2)


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_corpus_clean_job_all_dropped(spark, tmp_path, capsys):
    """A run whose filters drop EVERY document must still emit the audit
    line with rows_written 0 (the empty bucket-partitioned output has no
    inferable schema — the job reads back with the known one)."""
    import corpus_clean_job

    out = str(tmp_path / "empty")
    corpus_clean_job.main(
        [
            "--input",
            f"{SF_DIR}/documents.parquet",
            "--output",
            out,
            # word-soup corpus has no real stopword mass: the Gopher gate
            # at min-words far above every doc drops all 500
            "--min-words",
            "100000",
            "--buckets",
            "4",
        ]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    assert m["rows_written"] == 0
    assert list(m["stages"].values())[-1] == 0


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_corpus_clean_job_nfc_stage(spark, tmp_path, capsys):
    """--nfc normalizes before dedup, preserving the non-text columns and
    the row count (a narrow map, drops nothing)."""
    import corpus_clean_job

    out = str(tmp_path / "nfc")
    corpus_clean_job.main(
        [
            "--input",
            f"{SF_DIR}/documents.parquet",
            "--output",
            out,
            "--nfc",
            "--skip-quality",
            "--buckets",
            "4",
        ]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    assert m["stages"]["exact_dedup"] == m["stages"]["input"]  # word soup: no dups
    back = spark.read.parquet(out)
    assert {"doc_id", "text", "lang", "source", "n_chars"} <= set(back.columns)
    assert back.count() == m["rows_written"] > 0
