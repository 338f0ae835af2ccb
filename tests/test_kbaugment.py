"""KB augmentation: entity salience + emerging-entity (NIL) clustering."""

from dbpedia_spotlight_spark.operators.kbaugment import (
    emerging_entities,
    entity_salience,
)


def test_entity_salience_features(spark):
    # doc 1: A at pos 0 and 4, B at pos 8 (last) -> A frequent+early
    rows = [(1, 0, "A"), (1, 4, "A"), (1, 8, "B")]
    occs = spark.createDataFrame(rows, "doc_id long, pos long, uri string")
    got = {r.uri: r for r in entity_salience(occs).collect()}
    assert got["A"].n_mentions == 2 and got["A"].first_pos == 0
    # A: frac 2/3, pos_ratio 0/9 -> score 2/3
    assert abs(got["A"].score - round(2 / 3, 6)) < 1e-9
    # B: frac 1/3, pos_ratio 8/9 -> score (1/3)*(1/9)
    assert abs(got["B"].score - round((1 / 3) * (1 - 8 / 9), 6)) < 1e-9
    assert got["A"].score > got["B"].score


def test_entity_salience_per_doc_independent(spark):
    rows = [(1, 0, "A"), (2, 0, "A"), (2, 1, "B")]
    occs = spark.createDataFrame(rows, "doc_id long, pos long, uri string")
    got = {(r.doc_id, r.uri): r.mention_frac for r in entity_salience(occs).collect()}
    assert got[(1, "A")] == 1.0
    assert got[(2, "A")] == 0.5


def test_emerging_entities_clusters_by_normal_form(spark):
    rows = [
        (1, "Zorblax  Inc", 0.1),
        (2, "zorblax inc", 0.2),
        (3, " ZORBLAX INC ", 0.3),
        (4, "Berlin", 0.9),  # confidently linked -> not NIL
        (5, "mystery", 0.4),
    ]
    ann = spark.createDataFrame(rows, "doc_id long, surface_form string, prior double")
    got = {r.entity_id: r for r in emerging_entities(ann).collect()}
    assert set(got) == {"NEW:zorblax inc", "NEW:mystery"}
    z = got["NEW:zorblax inc"]
    assert z.n_mentions == 3 and z.n_docs == 3


def test_emerging_entities_threshold(spark):
    ann = spark.createDataFrame(
        [(1, "x", 0.49), (2, "x", 0.5)], "doc_id long, surface_form string, prior double"
    )
    got = emerging_entities(ann, threshold=0.5).collect()
    assert len(got) == 1 and got[0].n_mentions == 1  # strict <


def test_relation_triples_basic(spark):
    from dbpedia_spotlight_spark.pipeline.triples import relation_triples

    docs = {
        1: "paris is capital of france",
        2: "paris beats london today",
    }
    tokens = spark.createDataFrame(
        [(d, i, w) for d, s in docs.items() for i, w in enumerate(s.split())],
        "doc_id long, pos long, token string",
    )
    mentions = spark.createDataFrame(
        [(1, 0, "Paris"), (1, 4, "France"), (2, 0, "Paris"), (2, 2, "London")],
        "doc_id long, pos long, uri string",
    )
    got = {
        (r.subj_uri, r.pred, r.obj_uri): r.support
        for r in relation_triples(mentions, tokens, max_gap=3).collect()
    }
    assert got == {
        ("Paris", "is capital of", "France"): 1,
        ("Paris", "beats", "London"): 1,
    }


def test_relation_triples_excludes_entity_middles(spark):
    from dbpedia_spotlight_spark.pipeline.triples import relation_triples

    tokens = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "x"), (1, 2, "b")],
        "doc_id long, pos long, token string",
    )
    mentions = spark.createDataFrame(
        [(1, 0, "A"), (1, 1, "X"), (1, 2, "B")],
        "doc_id long, pos long, uri string",
    )
    got = relation_triples(mentions, tokens, max_gap=2).collect()
    # the only middle slot is itself a mention -> no predicate text
    assert got == []


def test_relation_triples_support_aggregates(spark):
    from dbpedia_spotlight_spark.pipeline.triples import relation_triples

    rows = []
    ments = []
    for d in (1, 2, 3):
        rows += [(d, 0, "cat"), (d, 1, "eats"), (d, 2, "fish")]
        ments += [(d, 0, "Cat"), (d, 2, "Fish")]
    tokens = spark.createDataFrame(rows, "doc_id long, pos long, token string")
    mentions = spark.createDataFrame(ments, "doc_id long, pos long, uri string")
    out = relation_triples(mentions, tokens, max_gap=1, min_support=3).collect()
    assert len(out) == 1 and out[0].support == 3
    assert (out[0].subj_uri, out[0].pred, out[0].obj_uri) == ("Cat", "eats", "Fish")
