"""Truth-discovery fact fusion (operators/fusion.py)."""

import pytest

from dbpedia_spotlight_spark.operators.fusion import (
    fact_fusion,
    resolve_conflicts,
)


@pytest.fixture()
def quads(spark):
    # g1/g2 agree everywhere; g3 dissents on (a,p) and claims one
    # uncontested fact. Duplicate g1 claim must count once.
    rows = [
        ("a", "p", "x", "g1"),
        ("a", "p", "x", "g1"),  # duplicate claim, same source
        ("a", "p", "x", "g2"),
        ("a", "p", "y", "g3"),
        ("b", "q", "u", "g1"),
        ("b", "q", "u", "g2"),
        ("b", "q", "u", "g3"),
        ("c", "r", "w", "g3"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string"
    )


def test_fact_fusion_hand_computed(quads):
    got = {
        (r["subj"], r["pred"], r["obj"]): (r["confidence"], r["n_sources"])
        for r in fact_fusion(quads, rounds=1).collect()
    }
    # round 0: x=y=0.5 (2-way group), u=w=1.0
    # trust: g1=g2=mean(0.5,1)=0.75, g3=mean(0.5,1,1)=0.833333
    # support: x=1.5, y=0.833333, u=2.333333, w=0.833333
    assert got[("a", "p", "x")][0] == pytest.approx(1.5 / 2.333333, abs=1e-6)
    assert got[("a", "p", "y")][0] == pytest.approx(
        0.833333 / 2.333333, abs=1e-6
    )
    assert got[("b", "q", "u")] == (1.0, 3)
    assert got[("c", "r", "w")] == (1.0, 1)
    assert got[("a", "p", "x")][1] == 2  # duplicate g1 claim deduped
    assert got[("a", "p", "y")][1] == 1


def test_fusion_majority_strengthens_with_rounds(quads):
    one = {
        (r["subj"], r["obj"]): r["confidence"]
        for r in fact_fusion(quads, rounds=1).collect()
    }
    three = {
        (r["subj"], r["obj"]): r["confidence"]
        for r in fact_fusion(quads, rounds=3).collect()
    }
    # mutual reinforcement: the majority claim's share grows per round
    assert three[("a", "x")] > one[("a", "x")] > 0.5
    assert three[("a", "y")] < one[("a", "y")] < 0.5
    # shares within a conflict group always sum to 1
    assert three[("a", "x")] + three[("a", "y")] == pytest.approx(1, abs=2e-6)


def test_resolve_conflicts_picks_winner(quads):
    fused = fact_fusion(quads, rounds=2)
    got = {
        (r["subj"], r["pred"]): r["obj"]
        for r in resolve_conflicts(fused).collect()
    }
    assert got == {("a", "p"): "x", ("b", "q"): "u", ("c", "r"): "w"}


def test_resolve_conflicts_tiebreak(spark):
    # two sources, one claim each -> equal confidence + n_sources;
    # lexicographically smaller object must win deterministically.
    q = spark.createDataFrame(
        [("s", "p", "beta", "g1"), ("s", "p", "alpha", "g2")],
        "subj string, pred string, obj string, graph string",
    )
    got = resolve_conflicts(fact_fusion(q, rounds=2)).collect()
    assert [(r["subj"], r["obj"]) for r in got] == [("s", "alpha")]


def test_fusion_rounds_validation(quads):
    with pytest.raises(ValueError, match="rounds"):
        fact_fusion(quads, rounds=0)


def test_annotation_vote_majority_and_ties(spark):
    from dbpedia_spotlight_spark.operators.fusion import annotation_vote

    rows = [
        (1, 0, 5, "PER", "a"),
        (1, 0, 5, "PER", "b"),
        (1, 0, 5, "PER", "b"),  # duplicate vote from same source ignored
        (1, 0, 5, "ORG", "c"),
        (1, 10, 15, "LOC", "a"),
        (2, 0, 3, "PER", "a"),
        (2, 0, 3, "ORG", "b"),  # tie -> ORG wins (label asc)
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, begin int, end int, label string, source string"
    )
    got = {
        (r.doc_id, r.begin): (r.label, r.votes, r.n_sources, r.agreement)
        for r in annotation_vote(df).collect()
    }
    assert got[(1, 0)] == ("PER", 2, 3, 0.666667)
    assert got[(1, 10)] == ("LOC", 1, 1, 1.0)
    assert got[(2, 0)] == ("ORG", 1, 2, 0.5)
    # min_sources filters singleton spans
    got2 = {
        (r.doc_id, r.begin)
        for r in annotation_vote(df, min_sources=2).collect()
    }
    assert got2 == {(1, 0)}
