"""kg_export_job: full-KG materialization with per-table _SUCCESS resume."""

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
def test_kg_export_job_and_resume(spark, tmp_path, capsys):
    import kg_export_job
    import __spark_entry__ as entry

    ann_path = str(tmp_path / "ann")
    docs_path = str(tmp_path / "docs")
    entry._occs(spark, SF_DIR).select(
        "doc_id", "pos", "surface_form", "uri", "prior"
    ).write.parquet(ann_path)
    entry._docs(spark, SF_DIR).select("doc_id", "text").write.parquet(
        docs_path
    )

    out = str(tmp_path / "kg")
    argv = [
        "--annotations", ann_path, "--documents", docs_path,
        "--output", out, "--min-cooc", "150",
    ]

    def run():
        kg_export_job.main(argv)
        line = [
            l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")
        ][-1]
        return json.loads(line)

    first = run()
    assert sorted(first["tables_written"]) == [
        "edges", "emerging", "entities", "relations", "salience",
    ]
    assert first["resumed_from"] == []
    for t in first["tables_written"]:
        assert first[t] > 0, t

    # entity dim carries the graph metrics
    ent = spark.read.parquet(os.path.join(out, "entities"))
    assert {"uri", "support", "pagerank", "community", "component"} <= set(
        ent.columns
    )

    # full rerun: everything resumes, counts identical
    second = run()
    assert second["tables_written"] == []
    assert sorted(second["resumed_from"]) == sorted(first["tables_written"])
    for t in second["resumed_from"]:
        assert second[t] == first[t], t

    # killed-mid-write: drop one marker -> only that table rewrites
    os.remove(os.path.join(out, "salience", "_SUCCESS"))
    third = run()
    assert third["tables_written"] == ["salience"]
    assert third["salience"] == first["salience"]
