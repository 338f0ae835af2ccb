"""kg_ingest_job: availableNow streaming fold into a versioned KB with
incremental closure, idempotent across reruns."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_kg_ingest_job_folds_and_reruns_idempotently(spark, tmp_path, capsys):
    import kg_ingest_job

    inp = tmp_path / "in"
    inp.mkdir()
    spark.createDataFrame(
        [
            ("a", "skos:broader", "b"),
            ("b", "skos:broader", "c"),
            ("a", "label", "Alpha"),
        ],
        "subj string, pred string, obj string",
    ).write.mode("append").parquet(str(inp))

    argv = [
        "--input", str(inp),
        "--kb", str(tmp_path / "kb"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ]

    def run():
        kg_ingest_job.main(argv)
        line = [
            ln
            for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")
        ][-1]
        return json.loads(line)

    m1 = run()
    assert m1["n_triples"] == 3
    assert m1["n_closure"] == 3  # a->b, b->c, a->c
    v1 = m1["version"]

    # rerun with nothing new: checkpoint skips, version unchanged
    m2 = run()
    assert m2["version"] == v1 and m2["n_triples"] == 3

    # second file extends the chain; closure gains the transitive pairs
    spark.createDataFrame(
        [("c", "skos:broader", "d")], "subj string, pred string, obj string"
    ).write.mode("append").parquet(str(inp))
    m3 = run()
    assert m3["version"] != v1
    assert m3["n_triples"] == 4
    assert m3["n_closure"] == 6  # + c->d, b->d, a->d
