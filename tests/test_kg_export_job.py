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


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_kg_export_accepts_annotate_pipeline_schema(spark, tmp_path, capsys):
    """Chaining: the annotate pipeline's own output (char offset +
    similarity_score, no token pos) produces the SAME KG as the
    pos-based relational schema — the offset->pos derivation is exact
    on the single-space-tokenized corpus."""
    import kg_export_job
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    occ = entry._occs(spark, SF_DIR)
    docs_path = str(tmp_path / "docs")
    entry._docs(spark, SF_DIR).select("doc_id", "text").write.parquet(
        docs_path
    )

    # (a) relational schema with token pos
    pos_path = str(tmp_path / "ann_pos")
    occ.select("doc_id", "pos", "surface_form", "uri", "prior").write.parquet(
        pos_path
    )
    # (b) annotate-pipeline schema: char offset + similarity_score
    off_path = str(tmp_path / "ann_off")
    occ.select(
        "doc_id",
        entry._char_offset().alias("offset"),
        "surface_form",
        "uri",
        F.col("prior").alias("similarity_score"),
    ).write.parquet(off_path)

    outs = {}
    for tag, ann in (("pos", pos_path), ("off", off_path)):
        out = str(tmp_path / f"kg_{tag}")
        kg_export_job.main(
            ["--annotations", ann, "--documents", docs_path,
             "--output", out, "--min-cooc", "150"]
        )
        capsys.readouterr()
        outs[tag] = out

    for table in ("salience", "relations", "emerging"):
        a = spark.read.parquet(os.path.join(outs["pos"], table))
        b = spark.read.parquet(os.path.join(outs["off"], table))
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        ), table


def test_sparql_job(spark, tmp_path, capsys):
    import sparql_job

    triples = spark.createDataFrame(
        [("a", "sub", "b"), ("b", "sub", "c"), ("a", "knows", "c")],
        "subj string, pred string, obj string",
    )
    tri_path = str(tmp_path / "triples")
    triples.write.parquet(tri_path)
    out = str(tmp_path / "res")
    sparql_job.main(
        ["--triples", tri_path, "--output", out,
         "--query", "SELECT ?x WHERE { a <sub>+ ?x . }"]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    assert m["rows_written"] == 2 and m["variables"] == ["x"]
    got = sorted(r.x for r in spark.read.parquet(out).collect())
    assert got == ["b", "c"]
