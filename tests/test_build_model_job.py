"""build_model_job resume protocol: per-table _SUCCESS commit markers —
a rerun skips committed tables and rewrites only the one whose marker is
missing (killed-mid-write simulation)."""

import json
import os
import sys

import pytest

SF_DIR = "/root/testdata/sf0.001"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_build_model_job_resumes_per_table(spark, tmp_path, capsys):
    import build_model_job
    import __spark_entry__ as entry
    from dbpedia_spotlight_spark.operators.tokenizer import (
        flat_to_interleaved_media,
    )

    docs_path = str(tmp_path / "docs")
    occs_path = str(tmp_path / "occs")
    flat_to_interleaved_media(entry._docs(spark, SF_DIR)).write.parquet(
        docs_path
    )
    entry._occs(spark, SF_DIR).select(
        entry.F.col("doc_id").cast("string").alias("doc_id"),
        "surface_form",
        "uri",
    ).write.parquet(occs_path)

    out = str(tmp_path / "model")
    argv = [
        "--documents", docs_path, "--occurrences", occs_path, "--output", out,
    ]

    def run():
        build_model_job.main(argv)
        line = [
            l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")
        ][-1]
        return json.loads(line)

    first = run()
    assert sorted(first["tables_written"]) == sorted(
        ["surface_forms", "resources", "candidates", "token_types",
         "context_counts"]
    )
    assert first["resumed_from"] == []
    assert first["candidates"] > 0

    # simulate a job killed mid-write of `candidates`: the commit marker
    # is gone, everything else is committed
    os.remove(os.path.join(out, "candidates", "_SUCCESS"))
    second = run()
    assert second["tables_written"] == ["candidates"]
    assert sorted(second["resumed_from"]) == sorted(
        ["surface_forms", "resources", "token_types", "context_counts"]
    )
    assert second["candidates"] == first["candidates"]

    # fully-committed output: a third run recomputes nothing
    third = run()
    assert third["tables_written"] == []
    assert len(third["resumed_from"]) == 5
