"""End-to-end WARC ingest job (jobs/warc_ingest_job.py): WARC fixture in,
bucketed documents parquet out, stage accounting coherent."""

import json
import os
import sys

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.io.warc import warc_record_lines

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))

_BODY = (
    "<html><head><title>T{i}</title></head><body><p>"
    + "word " * 60
    + "page {i}</p><a href='/x'>nav</a></body></html>"
)


def _fixture(spark, tmp_path):
    rows = [
        # two URLs normalizing to the same key -> dedup to one
        ("HTTP://Dup.Example:80/a", _BODY.format(i=0)),
        ("http://dup.example/a", _BODY.format(i=0)),
        ("https://keep.example/b", _BODY.format(i=1)),
        # too short after extraction -> dropped by --min-chars
        ("https://short.example/c", "<html><body>tiny</body></html>"),
    ]
    df = spark.createDataFrame(rows, "uri string, body string")
    blob = "".join(r.value for r in warc_record_lines(df).collect())
    p = tmp_path / "crawl.warc"
    p.write_text(blob, newline="")
    return str(p)


def test_warc_ingest_job(spark, tmp_path, capsys):
    import warc_ingest_job

    warc_path = _fixture(spark, tmp_path)
    out = str(tmp_path / "docs")
    warc_ingest_job.main(
        ["--input", warc_path, "--output", out, "--min-chars", "100",
         "--buckets", "2"]
    )
    line = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ][-1]
    m = json.loads(line)
    assert m["records"] == 4
    assert m["html_responses"] == 4
    assert m["unique_urls"] == 3  # Dup.Example:80/a == dup.example/a
    assert m["written"] == 2  # short page gated out

    got = spark.read.parquet(out)
    rows = {r.url: r for r in got.collect()}
    assert set(rows) == {"http://dup.example/a", "https://keep.example/b"}
    r = rows["https://keep.example/b"]
    assert r.title == "T1"
    assert r.host == "keep.example"
    assert r.domain == "keep.example"
    assert r.text.endswith("page 1 nav")
    assert r.n_chars == len(r.text)
    assert got.select(F.countDistinct("doc_id")).first()[0] == 2
