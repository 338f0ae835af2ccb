"""End-to-end KB-harvest job (jobs/kb_harvest_job.py): Hearst is-a,
acronym lexicalizations, and distant-supervision silver relations in
one pass with metrics accounting."""

import json
import os
import sys

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_kb_harvest_job_end_to_end(spark, tmp_path, capsys):
    import kb_harvest_job

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" tools such as hammer, wrench."
                  " The Alpha Beta Unit (ABU) closed."),
        ).alias("text"),
    )
    dpath = str(tmp_path / "docs")
    injected.write.parquet(dpath)
    mentions = spark.createDataFrame(
        [(1, 0, "A"), (1, 5, "B"), (2, 3, "A"), (2, 4, "C")],
        "doc_id int, pos int, uri string",
    )
    kb = spark.createDataFrame(
        [("A", "knows", "B"), ("A", "rival", "C")],
        "subj string, pred string, obj string",
    )
    mpath, kpath = str(tmp_path / "m"), str(tmp_path / "kb")
    mentions.write.parquet(mpath)
    kb.write.parquet(kpath)
    out = str(tmp_path / "harvest")
    kb_harvest_job.main(
        ["--documents", dpath, "--output", out,
         "--mentions", mpath, "--kb", kpath, "--min-support", "2"]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    assert m["isa_candidates"] == 2       # hammer/wrench -> tools
    assert m["acronym_lexicalizations"] == 1
    assert m["silver_relations"] == 2
    isa = {
        (r.hyponym, r.hypernym)
        for r in spark.read.parquet(f"{out}/isa_candidates").collect()
    }
    assert isa == {("hammer", "tools"), ("wrench", "tools")}
