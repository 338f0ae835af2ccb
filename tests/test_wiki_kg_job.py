"""wiki_kg_job: markup -> extract -> canonicalize -> validate -> profile."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_wiki_kg_job_end_to_end(spark, tmp_path, capsys):
    import wiki_kg_job

    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (
                "Paris",
                "{{Infobox settlement | name = Paris | pop = 2100000}} "
                "[[Category:Cities]] [[fr:Paris ville]]",
            ),
            (
                "Paris ville",
                # french twin page: the fr: link above asserts sameAs
                "{{Infobox settlement | name = Paris}} [[Category:Cities]]",
            ),
            ("Plain", "no markup at all"),
        ],
        "doc_id string, text string",
    ).write.parquet(docs)

    shapes = str(tmp_path / "shapes")
    spark.createDataFrame(
        [("Infobox:settlement", "prop:pop", 1, 1, None)],
        "target_class string, pred string, min_count long, "
        "max_count long, value_class string",
    ).write.parquet(shapes)

    out = str(tmp_path / "kg")
    wiki_kg_job.main(
        ["--documents", docs, "--output", out, "--shapes", shapes]
    )
    line = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
    ][-1]
    m = json.loads(line)

    assert m["n_raw_triples"] > m["n_canonical_triples"] > 0
    tri = {tuple(r) for r in spark.read.parquet(f"{out}/triples").collect()}
    # the [[fr:...]] link asserts page:Paris sameAs the OPAQUE cross-KB
    # id 'fr:Paris ville'; canonical = lexicographic min of the pair
    canon = "fr:Paris ville"
    assert (canon, "prop:name", "Paris") in tri
    assert (canon, "prop:pop", "2100000") in tri
    assert not any(s == "page:Paris" for s, _, _ in tri)
    # the local French page is a DIFFERENT resource (its id never
    # appears in a sameAs triple) and keeps its own subject...
    assert any(s == "page:Paris ville" for s, _, _ in tri)
    # ...and it violates the pop minCount shape (typed settlement, no pop)
    assert m["n_violations"] == 1
    assert m["void"]["n_classes"] >= 1
    assert m["worst_dangling_pred"] is not None
