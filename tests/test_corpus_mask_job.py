"""End-to-end corpus-mask job (jobs/corpus_mask_job.py): REALM-style
salient-span masking with metrics accounting."""

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
def test_corpus_mask_job_end_to_end(spark, tmp_path, capsys):
    import corpus_mask_job

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    off = (F.col("doc_id") % 4) * 8
    ann = docs.select(
        "doc_id",
        off.cast("long").alias("offset"),
        F.substring("text", off.cast("int") + 1, 6).alias("surface_form"),
    )
    dpath, apath = str(tmp_path / "docs"), str(tmp_path / "ann")
    docs.write.parquet(dpath)
    ann.write.parquet(apath)
    out = str(tmp_path / "masked")
    corpus_mask_job.main(
        [
            "--documents", dpath,
            "--annotations", apath,
            "--output", out,
            "--mask-token", "<ENT>",
            "--min-masks", "1",
            "--buckets", "2",
        ]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    assert m["docs_in"] == 50 and m["docs_out"] == 50
    assert m["total_masks"] == 50
    written = spark.read.parquet(out)
    row = written.filter(F.col("doc_id") == written.agg(F.min("doc_id")).collect()[0][0]).collect()[0]
    assert "<ENT>" in row.masked_text and row.n_masked == 1
