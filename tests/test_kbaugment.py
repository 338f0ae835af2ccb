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


def test_rdfs_entailment(spark):
    from dbpedia_spotlight_spark.operators.kgquery import rdfs_entailment

    types = spark.createDataFrame(
        [("e1", 10), ("e2", 20), ("e3", 40)], "entity string, cls long"
    )
    # 10 -> 5 -> 2; 20 -> 10 (so e2 inherits 10, 5, 2); 40 isolated
    sub = spark.createDataFrame(
        [(10, 5), (5, 2), (20, 10)], "cls long, supercls long"
    )
    got = {(r.entity, r.cls) for r in rdfs_entailment(types, sub).collect()}
    assert got == {
        ("e1", 10), ("e1", 5), ("e1", 2),
        ("e2", 20), ("e2", 10), ("e2", 5), ("e2", 2),
        ("e3", 40),
    }


def test_rdfs_entailment_dedups_diamond(spark):
    from dbpedia_spotlight_spark.operators.kgquery import rdfs_entailment

    # diamond: 1 -> 2, 1 -> 3, 2 -> 4, 3 -> 4 — ancestor 4 entailed once
    types = spark.createDataFrame([("e", 1)], "entity string, cls long")
    sub = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "cls long, supercls long"
    )
    rows = rdfs_entailment(types, sub).collect()
    assert len(rows) == len({(r.entity, r.cls) for r in rows}) == 4


def test_align_entities_best_match(spark):
    from dbpedia_spotlight_spark.operators.kbaugment import align_entities

    new = spark.createDataFrame(
        [("zorblax",), ("qqq",)], "surface_form_norm string"
    )
    kb = spark.createDataFrame(
        [("zorblaz",), ("zorblax co",), ("zebra",)], "name string"
    )
    got = {r.surface_form_norm: r for r in align_entities(new, kb).collect()}
    # zorblax: zorblaz at distance 1 (zorblax co is outside the ±1 length
    # block); qqq: no candidate sharing first char -> absent
    assert set(got) == {"zorblax"}
    assert got["zorblax"].kb_match == "zorblaz"
    assert got["zorblax"].edit_distance == 1


def test_align_entities_tie_breaks_lexicographic(spark):
    from dbpedia_spotlight_spark.operators.kbaugment import align_entities

    new = spark.createDataFrame([("cat",)], "surface_form_norm string")
    kb = spark.createDataFrame([("cab",), ("car",)], "name string")
    got = align_entities(new, kb).collect()
    assert len(got) == 1 and got[0].kb_match == "cab"  # both distance 1


def test_relation_triples_rejects_zero_max_gap(spark):
    import pytest as _pytest

    from dbpedia_spotlight_spark.pipeline.triples import relation_triples

    m = spark.createDataFrame(
        [("d", 0, "A")], "doc_id string, pos int, uri string"
    )
    t = spark.createDataFrame(
        [("d", 0, "x")], "doc_id string, pos int, token string"
    )
    with _pytest.raises(ValueError, match="max_gap"):
        relation_triples(m, t, max_gap=0)


def test_success_marker_exists_local_and_missing(spark, tmp_path):
    """The resume probe goes through the Hadoop FileSystem API (works for
    HDFS/S3A URIs, round-3 ADVICE); local paths behave like the old
    os.path.exists probe."""
    import os

    from dbpedia_spotlight_spark.pipeline.checkpoint import (
        success_marker_exists,
    )

    d = str(tmp_path / "table")
    os.makedirs(d)
    assert not success_marker_exists(spark, d)
    open(os.path.join(d, "_SUCCESS"), "w").close()
    assert success_marker_exists(spark, d)
    assert not success_marker_exists(spark, str(tmp_path / "absent"))


def test_predicate_alignment_jaccard_and_blocking(spark):
    from dbpedia_spotlight_spark.operators.kbaugment import (
        predicate_alignment,
    )

    kb1 = spark.createDataFrame(
        [
            ("a", "p", "x"),
            ("b", "p", "y"),
            ("c", "p", "z"),
            ("a", "q", "x"),
        ],
        "subj string, pred string, obj string",
    )
    kb2 = spark.createDataFrame(
        [
            ("a", "P2", "x"),
            ("b", "P2", "y"),
            ("d", "P2", "w"),
            ("zz", "R2", "zz"),  # shares no pair with kb1 -> never meets p
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r.pred1, r.pred2): (r.overlap, r.n1, r.n2, r.jaccard)
        for r in predicate_alignment(kb1, kb2, min_jaccard=0.2).collect()
    }
    # p~P2: overlap {a,b} = 2, n1=3, n2=3 -> 2/4 = 0.5
    assert got[("p", "P2")] == (2, 3, 3, 0.5)
    # q~P2: overlap {(a,x)} = 1, 1/(1+3-1) = 1/3 >= 0.2
    assert got[("q", "P2")] == (1, 1, 3, 0.333333)
    assert all(p2 != "R2" for (_, p2) in got)


def test_subsumption_mining_directions_and_gates(spark):
    from dbpedia_spotlight_spark.operators.kbaugment import (
        subsumption_mining,
    )

    rows = [("i%d" % i, "rdf:type", "Animal") for i in range(10)]
    rows += [("i%d" % i, "rdf:type", "Dog") for i in range(3)]
    rows += [("x", "rdf:type", "Rock")]
    tri = spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )
    got = {
        (r.subcls, r.supercls): (r.support, r.confidence)
        for r in subsumption_mining(tri).collect()
    }
    # every Dog is an Animal (3/3); Animal ⊑ Dog is 3/10, gated out;
    # Rock shares no instances
    assert got == {("Dog", "Animal"): (3, 1.0)}


def test_subsumption_min_support_gate(spark):
    from dbpedia_spotlight_spark.operators.kbaugment import (
        subsumption_mining,
    )

    tri = spark.createDataFrame(
        [("i1", "rdf:type", "A"), ("i1", "rdf:type", "B")],
        "subj string, pred string, obj string",
    )
    # conf 1.0 both ways but support 1 < 2
    assert subsumption_mining(tri).count() == 0


def test_best_labels_priority_fallback_and_tiebreak(spark):
    from dbpedia_spotlight_spark.operators.kbaugment import best_labels

    rows = [
        # e1: has de and en -> de wins
        ("e1", "rdfs:label", '"Haus"@de'),
        ("e1", "rdfs:label", '"House"@en'),
        # e2: only en-US -> matches 'en' range
        ("e2", "rdfs:label", '"Color"@en-US'),
        ("e2", "rdfs:label", '"untagged"'),
        # e3: only untagged -> fallback
        ("e3", "rdfs:label", '"plain"'),
        # e4: two de labels -> lexicographic term tie-break
        ("e4", "rdfs:label", '"zzz"@de'),
        ("e4", "rdfs:label", '"aaa"@de'),
        # non-label predicate ignored
        ("e1", "other", '"nope"@de'),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        r.subj: (r.label, r.lang)
        for r in best_labels(t, lang_priority=("de", "en")).collect()
    }
    assert got == {
        "e1": ("Haus", "de"),
        "e2": ("Color", "en-US"),
        "e3": ("plain", ""),
        "e4": ("aaa", "de"),
    }


def test_nil_context_clusters_splits_and_merges(spark):
    from dbpedia_spotlight_spark.operators.kbaugment import (
        nil_context_clusters,
    )

    rows = [
        # two "paris" mentions sharing 2 context tokens -> merge
        ("d1", 0, "Paris", ["france", "seine", "x"], 0.1),
        ("d2", 3, "paris", ["france", "seine", "y"], 0.2),
        # a "paris" with disjoint context -> separate cluster
        ("d3", 1, "Paris", ["hilton", "hotel"], 0.1),
        # high-confidence mention is not NIL at all
        ("d4", 2, "Paris", ["france", "seine"], 0.9),
        # different surface never merges even with same context
        ("d5", 0, "Berlin", ["france", "seine"], 0.1),
    ]
    ann = spark.createDataFrame(
        rows,
        "doc_id string, pos int, surface_form string, "
        "toks array<string>, prior double",
    )
    got = {r.mention_id: r.cluster_id
           for r in nil_context_clusters(ann).collect()}
    assert len(got) == 4  # d4 excluded
    assert got["d1\x1f0"] == got["d2\x1f3"]
    assert got["d3\x1f1"] != got["d1\x1f0"]
    assert got["d5\x1f0"].startswith("NEW:berlin#")


def test_sorted_neighborhood_window_pairs(spark):
    import pytest

    from dbpedia_spotlight_spark.operators.kbaugment import (
        sorted_neighborhood_pairs,
    )

    rows = [("u%d" % i, "k%02d" % i) for i in range(10)]
    df = spark.createDataFrame(rows, "uri string, label string")
    got = sorted(
        (r.a, r.b, r.gap)
        for r in sorted_neighborhood_pairs(df, window=4).collect()
    )
    expect = sorted(
        ("u%d" % i, "u%d" % j, j - i)
        for i in range(10)
        for j in range(i + 1, min(i + 4, 10))
    )
    assert got == expect
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, window=1)


def test_edit_distance_join_lossless_vs_brute_force(spark):
    import itertools

    import pytest

    from dbpedia_spotlight_spark.operators.kbaugment import edit_distance_join

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[:], i
            for j, cb in enumerate(b, 1):
                d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (ca != cb))
        return d[-1]

    rows = [
        ("u1", "john smith"),
        ("u2", "jon smith"),     # deletion
        ("u3", "john smyth"),    # substitution
        ("u4", "mary jones"),
        ("u5", "aohn smith"),    # FIRST-char edit (first-char blocking loses this)
        ("u6", "johnn smith"),   # insertion
        ("u7", "x"),             # shorter than q
    ]
    df = spark.createDataFrame(rows, "uri string, label string")
    got = sorted(
        (r.a, r.b, r.dist)
        for r in edit_distance_join(df, max_edits=1).collect()
    )
    exp = sorted(
        (a, b, lev(x, y))
        for (a, x), (b, y) in itertools.combinations(rows, 2)
        if lev(x, y) <= 1
    )
    assert got == exp and ("u1", "u5", 1) in got
    got2 = {
        (r.a, r.b)
        for r in edit_distance_join(df, max_edits=2).collect()
    }
    exp2 = {
        (a, b)
        for (a, x), (b, y) in itertools.combinations(rows, 2)
        if lev(x, y) <= 2
    }
    assert got2 == exp2
    with pytest.raises(ValueError):
        edit_distance_join(df, max_edits=0)


def test_distant_supervision_kb_first(spark):
    from dbpedia_spotlight_spark.pipeline.triples import distant_supervision

    m = spark.createDataFrame(
        [(1, 0, "A"), (1, 5, "B"), (1, 90, "C"), (2, 3, "A"), (2, 4, "C"),
         (3, 7, "B")],
        "doc_id int, pos int, uri string",
    )
    kb = spark.createDataFrame(
        [("A", "knows", "B"), ("A", "rival", "C")],
        "subj string, pred string, obj string",
    )
    got = sorted(
        map(tuple, distant_supervision(m, kb, max_distance=30).collect())
    )
    # doc 1: A-B within 30 -> silver 'knows'; A-C at distance 90 -> dropped
    # doc 2: A-C adjacent -> silver 'rival'; doc 3: B alone -> nothing
    assert got == [
        (1, 0, 5, "A", "knows", "B"),
        (2, 3, 4, "A", "rival", "C"),
    ]


def test_fellegi_sunter_weights(spark):
    import math

    import pytest

    from dbpedia_spotlight_spark.operators.kbaugment import (
        fellegi_sunter_score,
    )

    p = spark.createDataFrame(
        [("a", "b", True, False), ("a", "c", True, True),
         ("a", "d", False, False)],
        "a string, b string, name_agree boolean, dob_agree boolean",
    )
    m, u = {"name": 0.9, "dob": 0.8}, {"name": 0.1, "dob": 0.05}
    got = {
        (r.a, r.b): r.weight
        for r in fellegi_sunter_score(p, ["name", "dob"], m, u).collect()
    }
    assert got[("a", "b")] == round(math.log(9) + math.log(0.2 / 0.95), 6)
    assert got[("a", "c")] == round(math.log(9) + math.log(16), 6)
    # threshold filters
    kept = fellegi_sunter_score(p, ["name", "dob"], m, u, threshold=3.0)
    assert {(r.a, r.b) for r in kept.collect()} == {("a", "c")}
    with pytest.raises(ValueError):
        fellegi_sunter_score(p, ["name"], {"name": 1.5}, {"name": 0.1})


def test_hearst_patterns_three_frames(spark):
    from dbpedia_spotlight_spark.pipeline.triples import hearst_patterns

    d = spark.createDataFrame(
        [(1, "Animals such as dogs, cats roam. Hammers and other tools. "
             "Metals including iron."),
         (2, "animals such as dogs bark")],
        "doc_id int, text string",
    )
    got = {
        (r.hyponym, r.hypernym, r.pattern): r.support
        for r in hearst_patterns(d).collect()
    }
    assert got[("dogs", "animals", "such_as")] == 2
    assert got[("cats", "animals", "such_as")] == 1
    assert got[("hammers", "tools", "and_other")] == 1
    assert got[("iron", "metals", "including")] == 1
    # min_support prunes singletons
    kept = {
        (r.hyponym, r.hypernym)
        for r in hearst_patterns(d, min_support=2).collect()
    }
    assert kept == {("dogs", "animals")}


def test_acronym_pairs_right_anchored(spark):
    from dbpedia_spotlight_spark.pipeline.triples import acronym_pairs

    d = spark.createDataFrame(
        [(1, "The World Health Organization (WHO) said. "
             "Bad Match Example (XYZ) no."),
         (2, "the World Health Organization (WHO) again")],
        "doc_id int, text string",
    )
    got = {
        (r.long_form, r.acronym): r.support
        for r in acronym_pairs(d).collect()
    }
    # right-anchored: the greedy leading 'The' is trimmed, both docs agree
    assert got == {("World Health Organization", "WHO"): 2}
