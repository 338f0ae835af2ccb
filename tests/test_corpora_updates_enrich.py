"""Eval-corpus readers, streaming model updates, model enrichers."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.io.corpora import (
    gold_occurrences,
    heldout_gold,
    parse_wiki_annotations,
    read_wikilink_corpus,
)
from dbpedia_spotlight_spark.model.enrich import (
    add_counts_to_resources,
    add_surface_forms,
    add_types_to_resources,
)
from dbpedia_spotlight_spark.streaming.model_updates import (
    apply_occurrence_delta,
    merge_counts,
    occurrence_update_stream,
)


def test_parse_wiki_annotations_offsets():
    markup = "The [[The Guardian (Nigeria)|Guardian newspaper|0.4]] wrote about [[Lagos]]."
    clean, gold = parse_wiki_annotations(markup)
    assert clean == "The Guardian newspaper wrote about Lagos."
    (uri1, sf1, off1, c1), (uri2, sf2, off2, c2) = gold
    assert (uri1, sf1, c1) == ("The_Guardian_(Nigeria)", "Guardian newspaper", 0.4)
    assert clean[off1:off1 + len(sf1)] == sf1
    assert (uri2, sf2, c2) == ("Lagos", "Lagos", 1.0)
    assert clean[off2:off2 + len(sf2)] == sf2


def test_wikilink_corpus_reader(spark):
    docs = spark.createDataFrame(
        [("d1", "See [[Apple Inc|Apple]] and [[Paris]]."), ("d2", "no links")],
        "doc_id string, text string",
    )
    corpus = read_wikilink_corpus(docs)
    rows = {r["doc_id"]: r for r in corpus.collect()}
    assert rows["d1"]["text"] == "See Apple and Paris."
    assert len(rows["d1"]["gold"]) == 2 and rows["d2"]["gold"] == []
    g = gold_occurrences(corpus)
    assert g.count() == 2
    assert {r["uri"] for r in g.collect()} == {"Apple_Inc", "Paris"}


def test_heldout_gold_ambiguity_filter(spark, world):
    docs = spark.createDataFrame(
        [("d1", "[[Paris]] and [[Berlin]] are cities.")],
        "doc_id string, text string",
    )
    corpus = read_wikilink_corpus(docs)
    g = heldout_gold(
        corpus,
        surface_forms=world.model.surface_forms,
        candidates=world.model.candidates,
    )
    sfs = {r["surface_form"] for r in g.collect()}
    assert "Paris" in sfs       # ambiguous (Paris / Paris_Hilton)
    assert "Berlin" not in sfs  # single candidate -> dropped


def test_merge_counts(spark):
    a = spark.createDataFrame([("x", 5), ("y", 1)], "uri string, support long")
    b = spark.createDataFrame([("x", 2), ("z", 7)], "uri string, support long")
    got = {r["uri"]: r["support"] for r in merge_counts(a, b, ["uri"], "support").collect()}
    assert got == {"x": 7, "y": 1, "z": 7}


def test_streaming_model_updates(spark, tmp_path):
    in_dir = str(tmp_path / "occs")
    model_dir = str(tmp_path / "model")
    occs1 = spark.createDataFrame(
        [("d1", "apple", "Apple_Inc"), ("d1", "apple", "Apple_Inc"),
         ("d2", "paris", "Paris")],
        "doc_id string, surface_form string, uri string",
    )
    occs1.write.parquet(in_dir)
    q = occurrence_update_stream(spark, in_dir, model_dir, str(tmp_path / "ck"))
    q.awaitTermination(120)
    uri = {r["uri"]: r["support"]
           for r in spark.read.parquet(f"{model_dir}/uri_counts").collect()}
    assert uri == {"Apple_Inc": 2, "Paris": 1}

    # second delta merges, not replaces
    occs2 = spark.createDataFrame(
        [("d3", "apple", "Apple_Inc")], "doc_id string, surface_form string, uri string"
    )
    apply_occurrence_delta(spark, occs2, model_dir)
    uri = {r["uri"]: r["support"]
           for r in spark.read.parquet(f"{model_dir}/uri_counts").collect()}
    assert uri == {"Apple_Inc": 3, "Paris": 1}
    pair = {(r["surface_form"], r["uri"]): r["pair_count"]
            for r in spark.read.parquet(f"{model_dir}/pair_counts").collect()}
    assert pair[("apple", "Apple_Inc")] == 3


def test_enrichers(spark, world):
    res = world.model.resources
    types = spark.createDataFrame(
        [("Paris", "DBpedia:City"), ("Paris", "http://www.w3.org/2002/07/owl#Thing")],
        "uri string, type_qname string",
    )
    enriched = add_types_to_resources(
        res.withColumn("types", F.col("types").cast("array<string>")), types
    )
    paris = enriched.filter(F.col("uri") == "Paris").collect()[0]
    assert paris["types"] == ["DBpedia:City"]  # owl#Thing skipped

    counts = spark.createDataFrame([("Paris", 12345)], "uri string, support long")
    assert (
        add_counts_to_resources(res, counts)
        .filter(F.col("uri") == "Paris").collect()[0]["support"] == 12345
    )

    extra = spark.createDataFrame([("Panamá City",), ("Paris",)], "surface_form string")
    sf2 = add_surface_forms(world.model.surface_forms, extra)
    assert sf2.count() == world.model.surface_forms.count() + 1  # Paris existed
    new_row = sf2.filter(F.col("surface_form") == "Panamá City").collect()[0]
    assert new_row["sf_id"] > world.model.surface_forms.agg(F.max("sf_id")).collect()[0][0] - 1


def test_scd2_versioning(spark):
    """SCD2 merge semantics: changed attrs close + reopen, identical
    updates no-op, new keys open, closed history untouched; as-of reads
    reconstruct any past snapshot."""
    from dbpedia_spotlight_spark.model.scd2 import (
        OPEN_END,
        scd2_apply,
        scd2_as_of,
        scd2_init,
    )

    dim = spark.createDataFrame(
        [("A", 10), ("B", 20), ("C", 30)], "uri string, support long"
    )
    h0 = scd2_init(dim, "uri", batch_id=0)

    # batch 1: A changes, B identical (no-op), D is new
    u1 = spark.createDataFrame(
        [("A", 11), ("B", 20), ("D", 40)], "uri string, support long"
    )
    h1 = scd2_apply(h0, u1, "uri", ["support"], batch_id=1)
    rows = {(r["uri"], r["valid_from"]): r for r in h1.collect()}
    assert len(rows) == 5  # A(v0 closed), A(v1), B, C, D
    assert rows[("A", 0)]["valid_to"] == 1 and not rows[("A", 0)]["is_current"]
    assert rows[("A", 1)]["support"] == 11 and rows[("A", 1)]["is_current"]
    assert rows[("B", 0)]["valid_to"] == OPEN_END  # identical -> untouched
    assert rows[("C", 0)]["is_current"]  # not in batch -> untouched
    assert rows[("D", 1)]["valid_from"] == 1 and rows[("D", 1)]["is_current"]

    # batch 2: A changes again; closed v0 must pass through untouched
    u2 = spark.createDataFrame([("A", 12)], "uri string, support long")
    h2 = scd2_apply(h1, u2, "uri", ["support"], batch_id=2)
    a_versions = sorted(
        (r["valid_from"], r["valid_to"], r["support"])
        for r in h2.filter("uri = 'A'").collect()
    )
    assert a_versions == [(0, 1, 10), (1, 2, 11), (2, OPEN_END, 12)]

    # as-of reads reconstruct snapshots
    asof = {b: {r["uri"]: r["support"] for r in scd2_as_of(h2, b).collect()}
            for b in (0, 1, 2)}
    assert asof[0] == {"A": 10, "B": 20, "C": 30}
    assert asof[1] == {"A": 11, "B": 20, "C": 30, "D": 40}
    assert asof[2] == {"A": 12, "B": 20, "C": 30, "D": 40}
