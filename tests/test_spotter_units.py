"""Unit tests: FSA walk, spot features/scoring, overlap resolution branch
coverage (ref DBSpotter.scala:141-166), Aho-Corasick (SURVEY.md §5.1)."""

from dbpedia_spotlight_spark.operators.spotter import (
    AhoCorasick,
    SpotterDictionary,
    _fsa_spans,
    _uppercase_spans,
    annotation_probability,
    drop_overlapping_spots,
    leftmost_longest,
    spot_features,
    spot_score,
    surface_form_match,
)
from dbpedia_spotlight_spark.operators.tokenizer import tokenize_text


def _dict(entries):
    return SpotterDictionary.build(entries)


def test_annotation_probability():
    # ref SurfaceForm.scala:51-61 — 1.0 when total == -1
    assert annotation_probability(10, -1) == 1.0
    assert annotation_probability(5, 10) == 0.5
    assert annotation_probability(20, 10) == 1.0  # capped


def test_fsa_build_threshold():
    d = _dict([("high prob", 50, 100), ("low prob", 1, 100)])
    # low prob (0.01 < 0.1) not inserted into the FSA
    assert _fsa_spans(["high", "prob"], d) == [(0, 2, "m")]
    assert _fsa_spans(["low", "prob"], d) == []


def test_fsa_nested_accepts():
    d = _dict([("new york", 10, 10), ("new york city", 10, 10), ("york", 10, 10)])
    # the FSA walks stem space: "city" stems to "citi"
    spans = _fsa_spans(["new", "york", "citi"], d)
    assert set(spans) == {(0, 2, "m"), (0, 3, "m"), (1, 2, "m")}


def test_uppercase_spans():
    toks = ["The", "Big", "Apple", "is", "big", "Alpha"]
    assert _uppercase_spans(toks) == [(0, 3, "Capital_Sequences"), (5, 6, "Capital_Sequences")]


def test_spot_features_and_score():
    # ref DBSpotter.scala:184-197 + weights CreateSpotlightModel.scala:230-233
    w = (1.0, 0.2, -0.2, 0.1)
    stats = {"IBM": (150, 600), "2024": (700, 1000), "Paris": (900, 1500)}
    assert spot_features("IBM", 150, 600) == (0.25, 1.0, 0.0, 1.0)
    assert spot_features("2024", 700, 1000) == (0.7, 0.0, 1.0, 1.0)
    assert abs(spot_score("IBM", stats, w) - 0.55) < 1e-12
    assert abs(spot_score("2024", stats, w) - 0.6) < 1e-12
    assert spot_score("unknown", stats, w) == 0.0
    assert surface_form_match("IBM", stats, w)
    # unweighted path: annot_prob >= 0.25
    assert surface_form_match("IBM", stats, None)
    assert not surface_form_match("unknown", stats, w)


def test_overlap_resolution_branches():
    # longer wins when its prob > half of shorter's (DBSpotter.scala:146-148)
    spots = [(0, "Big Apple", 0.9, "m", ()), (4, "Apple", 0.7, "m", ())]
    kept = drop_overlapping_spots(spots)
    assert [s[1] for s in kept] == ["Big Apple"]

    # shorter kept when longer's prob too low
    spots = [(0, "Big Apple", 0.1, "m", ()), (4, "Apple", 0.9, "m", ())]
    kept = drop_overlapping_spots(spots)
    assert [s[1] for s in kept] == ["Apple"]

    # equal prob: better type (Capital_Sequences) wins
    spots = [(0, "Apple", 0.5, "m", ()), (0, "Apple Pie", 0.5, "Capital_Sequences", ())]
    kept = drop_overlapping_spots(spots)
    assert [s[1] for s in kept] == ["Apple Pie"]

    # non-overlapping spots all kept
    spots = [(0, "Apple", 0.5, "m", ()), (10, "Paris", 0.5, "m", ())]
    assert len(drop_overlapping_spots(spots)) == 2

    # dedup on (offset, sf)
    spots = [(0, "Apple", 0.5, "m", ()), (0, "Apple", 0.5, "m", ("a",))]
    assert len(drop_overlapping_spots(spots)) == 1


def test_ahocorasick_matches():
    ac = AhoCorasick(["apple", "apple pie", "pie", "pi"])
    text = "an apple pie recipe"
    hits = sorted(ac.find_all(text))
    strings = {text[s:e] for s, e in hits}
    assert strings == {"apple", "apple pie", "pie", "pi"}
    kept = leftmost_longest(hits)
    assert [text[s:e] for s, e in kept] == ["apple pie"]


def test_tokenize_offsets():
    toks = tokenize_text("Apple is big. Paris too.", frozenset(["is"]))
    # (sent_id, token, stem, offset, is_stopword, eos)
    assert toks[0][:4] == (0, "Apple", "appl", 0)  # snowball stem
    assert toks[1][4] is True  # 'is' stopword
    assert [t for t in toks if t[1] == "Paris"][0][0] == 1  # second sentence
    eos = [t[1] for t in toks if t[5]]
    assert eos == ["big", "too"]


def test_overlap_chain_reference_quirk():
    """ref DBSpotter.scala:146-165 removes literal index i-1 (possibly
    already removed), so on a >=3-overlap chain the tracked survivor can be
    kept alongside the new winner — exact-fidelity fixture (VERDICT item 5)."""
    from dbpedia_spotlight_spark.operators.spotter import drop_overlapping_spots

    s0 = (0, "abcdefgh", 1.0, "m", ())
    s1 = (1, "bcd", 0.3, "m", ())          # loses to s0, removed (index 1)
    s2 = (2, "cdefghijkl", 0.9, "m", ())   # beats s0: reference removes
    #                                        index i-1 == 1 (no-op) -> s0 kept
    kept = drop_overlapping_spots([s0, s1, s2])
    assert kept == [s0, s2]


def test_overlap_pairwise_still_exact():
    from dbpedia_spotlight_spark.operators.spotter import drop_overlapping_spots

    # longer + prob > half: new spot wins, previous index removed
    a = (0, "abc", 0.6, "m", ())
    b = (1, "bcdef", 0.4, "m", ())
    assert drop_overlapping_spots([a, b]) == [b]
    # shorter and not (prob > 2x): new spot removed
    c = (0, "abcdef", 0.6, "m", ())
    d = (1, "bcd", 0.9, "m", ())
    assert drop_overlapping_spots([c, d]) == [c]


def test_rule_ner_generator_types():
    from dbpedia_spotlight_spark.operators.model_spotter import RuleNERGenerator

    g = RuleNERGenerator()
    toks = "Dr Alice Smith works at Acme Corp near Paris".split()
    spans = {(s, e): t for s, e, t in g(toks)}
    assert spans[(1, 3)] == "person"        # after 'Dr'
    assert spans[(5, 7)] == "organization"  # trailing 'Corp'
    assert spans[(8, 9)] == "location"      # after 'near'


def test_model_spotter_end_to_end(spark):
    """P12: NE spans feed the shared sub-span dictionary match and the
    NE-first overlap type order (ref OpenNLPSpotter.scala:40-64)."""
    from dbpedia_spotlight_spark.operators.model_spotter import (
        spot_documents_model,
    )

    docs = spark.createDataFrame(
        [("d1", [{"kind": "text",
                  "text": "Report by Dr Alice Smith uses iPhone at Acme Corp",
                  "media_ref": None, "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    sfs = spark.createDataFrame(
        [(0, "Alice Smith", "alice smith", 80, 100),
         (1, "Acme Corp", "acme corp", 90, 100),
         (2, "iPhone", "iphone", 95, 100)],
        "sf_id int, surface_form string, surface_form_norm string, "
        "annotated_count long, total_count long",
    )
    spots = {(r["surface_form"], r["spot_type"])
             for r in spot_documents_model(docs, sfs).collect()}
    # capital-sequence spans are listed before model spans (reference
    # OpenNLPSpotter order), so on identical spans the CS type wins...
    assert ("Alice Smith", "Capital_Sequences") in spots
    assert ("Acme Corp", "Capital_Sequences") in spots
    # ...but lowercase-start entities are reachable ONLY via the model
    # generator — the capital-sequence spotter can never see iPhone
    assert ("iPhone", "misc") in spots


def test_spacy_generator_contract(monkeypatch):
    """P2/P12: the SpacyNERGenerator integration contract, exercised against
    a faked spaCy module (the container has no spaCy and installs are
    prohibited — see COVERAGE.md P2 note): pre-tokenized Doc construction,
    pipeline invocation, label mapping, and the pickle-by-model-name
    round-trip that broadcasting relies on."""
    import pickle
    import sys
    import types

    from dbpedia_spotlight_spark.operators.model_spotter import (
        SpacyNERGenerator,
    )

    class FakeEnt:
        def __init__(self, start, end, label):
            self.start, self.end, self.label_ = start, end, label

    class FakeDoc:
        def __init__(self, vocab, words):
            self.vocab, self.words, self.ents = vocab, list(words), []

    class FakeNER:
        def __call__(self, doc):
            for i, w in enumerate(doc.words):
                if w == "Berlin":
                    doc.ents.append(FakeEnt(i, i + 1, "GPE"))
                elif w == "Alice":
                    doc.ents.append(FakeEnt(i, i + 2, "PERSON"))
                elif w == "Zorp":
                    doc.ents.append(FakeEnt(i, i + 1, "WEIRD_LABEL"))
            return doc

    class FakeNLP:
        vocab = object()
        pipeline = [("ner", FakeNER())]

    fake_spacy = types.ModuleType("spacy")
    fake_spacy.load = lambda name: FakeNLP()
    fake_tokens = types.ModuleType("spacy.tokens")
    fake_tokens.Doc = FakeDoc
    fake_spacy.tokens = fake_tokens
    monkeypatch.setitem(sys.modules, "spacy", fake_spacy)
    monkeypatch.setitem(sys.modules, "spacy.tokens", fake_tokens)

    gen = SpacyNERGenerator("en_core_web_sm")
    # pickle round-trip: weights never travel, only the model name
    gen2 = pickle.loads(pickle.dumps(gen))
    assert gen2._nlp is None and gen2.model == "en_core_web_sm"
    spans = gen2(["Alice", "Smith", "visited", "Berlin", "Zorp"])
    assert (0, 2, "person") in spans
    assert (3, 4, "location") in spans
    assert (4, 5, "misc") in spans  # unknown labels map to misc


def test_perceptron_ner_generalizes(spark):
    """P2/P12 with a REAL trained model: the averaged-perceptron BIO
    tagger (Collins 2002, the same maxent-family approach as the
    reference's OpenNLP models) is trained in-process, then must label
    entity NAMES never seen in training via shape/context features —
    actual learned inference, not rules — and run end-to-end through
    spot_documents_model (trained weights broadcast to executors)."""
    from dbpedia_spotlight_spark.operators.model_spotter import (
        PerceptronNERGenerator,
        spot_documents_model,
    )

    def ex_person(name):
        toks = ["Mr"] + name.split() + ["visited", "the", "office", "today"]
        tags = (
            ["O", "B-person"]
            + ["I-person"] * (len(name.split()) - 1)
            + ["O"] * 4
        )
        return toks, tags

    def ex_org(org):
        toks = org.split() + ["acquired", "a", "startup"]
        tags = (
            ["B-organization"]
            + ["I-organization"] * (len(org.split()) - 1)
            + ["O"] * 3
        )
        return toks, tags

    def ex_loc(loc):
        # lowercase on purpose: these entities are invisible to the
        # capital-sequence spotter, so only the model can produce them
        return (
            ["they", "met", "in", loc.lower(), "yesterday"],
            ["O", "O", "O", "B-location", "O"],
        )

    train = (
        [ex_person(p) for p in
         ["Alice Johnson", "Bob Smith", "Carol White", "David Brown"]]
        + [ex_org(o) for o in
           ["Acme Corp", "Globex Inc", "Initech LLC", "Umbrella Corp"]]
        + [ex_loc(c) for c in ["paris", "london", "berlin", "madrid"]]
    )
    model = PerceptronNERGenerator.fit(train, epochs=8)

    # generalization to UNSEEN entity names (none appear in training)
    assert (1, 3, "person") in model(ex_person("Frank Miller")[0])
    assert (0, 2, "organization") in model(ex_org("Vandelay Inc")[0])
    assert (3, 4, "location") in model(ex_loc("oslo")[0])

    # pickle round trip (the generator is broadcast with the dictionary)
    import pickle

    m2 = pickle.loads(pickle.dumps(model))
    assert m2(ex_person("Frank Miller")[0]) == model(ex_person("Frank Miller")[0])

    # end to end through the Spark pipeline with the trained model
    docs = spark.createDataFrame(
        [("d1", [{"kind": "text",
                  "text": "Mr Frank Miller met in oslo yesterday",
                  "media_ref": None, "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    sfs = spark.createDataFrame(
        [(0, "Frank Miller", "frank miller", 80, 100),
         (1, "oslo", "oslo", 90, 100)],
        "sf_id int, surface_form string, surface_form_norm string, "
        "annotated_count long, total_count long",
    )
    spots = {
        (r["surface_form"], r["spot_type"])
        for r in spot_documents_model(docs, sfs, generators=(model,)).collect()
    }
    forms = {sf for sf, _t in spots}
    # the person span arrives via capital sequences too (reference order:
    # identical spans resolve to Capital_Sequences) — but lowercase 'oslo'
    # is reachable ONLY through the trained model's typed span
    assert "Frank Miller" in forms
    assert ("oslo", "location") in spots


def test_dictionary_save_load_roundtrip(tmp_path):
    entries = [
        ("Apache Spark", 90, 100),
        ("Spark", 40, 400),
        ("Berlin", 70, 80),
        ("rare thing", 1, 1000),  # below threshold: stats only, no FSA path
    ]
    built = SpotterDictionary.build(entries)
    p = str(tmp_path / "spotter_dict.pkl")
    built.save(p)
    loaded = SpotterDictionary.load(p)
    # identical payloads field-for-field
    assert loaded.sf_stats.index == built.sf_stats.index
    assert list(loaded.sf_stats.annotated) == list(built.sf_stats.annotated)
    assert list(loaded.sf_stats.total) == list(built.sf_stats.total)
    assert loaded.token_ids == built.token_ids
    assert list(loaded.root_next) == list(built.root_next)
    assert loaded.edges == built.edges
    assert bytes(loaded.accept) == bytes(built.accept)
    assert (
        loaded.min_annotation_probability == built.min_annotation_probability
    )
    # identical spotting behavior, spot for spot
    from dbpedia_spotlight_spark.operators.tokenizer import stem

    for text in ("Apache Spark and Berlin", "Spark in rare thing form"):
        stems = [stem(w) for w in text.split()]
        assert _fsa_spans(stems, built) == _fsa_spans(stems, loaded)


def test_dictionary_load_rejects_wrong_format(tmp_path):
    import pickle

    p = str(tmp_path / "bad.pkl")
    with open(p, "wb") as f:
        pickle.dump({"format": 999}, f)
    try:
        SpotterDictionary.load(p)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
