"""KB maintenance: owl:sameAs canonicalization, snapshot diff, and
incremental transitive-closure maintenance (operators/kbmaintain.py)."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.closure import transitive_closure
from dbpedia_spotlight_spark.operators.kbmaintain import (
    kb_diff,
    sameas_canonicalize,
    sameas_components,
    transitive_closure_delta,
)


def _tri(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_sameas_components_chain_and_symmetry(spark):
    # a=b, b=c (chain) plus d=e asserted in both directions; f untouched
    tri = _tri(
        spark,
        [
            ("b", "owl:sameAs", "a"),
            ("b", "owl:sameAs", "c"),
            ("d", "owl:sameAs", "e"),
            ("e", "owl:sameAs", "d"),
            ("f", "knows", "a"),
        ],
    )
    got = {(r.node, r.canonical) for r in sameas_components(tri).collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")}


def test_sameas_canonicalize_rewrites_and_collapses(spark):
    tri = _tri(
        spark,
        [
            ("b", "owl:sameAs", "a"),
            # both assertions collapse to one canonical triple
            ("a", "type", "Person"),
            ("b", "type", "Person"),
            # object-side rewrite
            ("x", "knows", "b"),
            # untouched triple passes through
            ("x", "knows", "z"),
        ],
    )
    got = {tuple(r) for r in sameas_canonicalize(tri).collect()}
    assert got == {
        ("a", "type", "Person"),
        ("x", "knows", "a"),
        ("x", "knows", "z"),
    }
    # drop_sameas=False keeps the (canonicalized) sameAs assertions
    kept = {
        tuple(r)
        for r in sameas_canonicalize(tri, drop_sameas=False).collect()
    }
    assert ("a", "owl:sameAs", "a") in kept


def test_kb_diff_added_removed_only(spark):
    old = _tri(spark, [("a", "p", "b"), ("a", "p", "c")])
    new = _tri(spark, [("a", "p", "b"), ("a", "p", "d")])
    got = {tuple(r) for r in kb_diff(old, new).collect()}
    assert got == {
        ("a", "p", "d", "added"),
        ("a", "p", "c", "removed"),
    }


def _pairs(df):
    return {(r.src, r.dst) for r in df.collect()}


def test_closure_delta_equals_full_rebuild_long_new_chain(spark):
    # old graph: two disjoint old paths 0->1->2 and 5->6
    old_edges = spark.createDataFrame(
        [("n0", "n1"), ("n1", "n2"), ("n5", "n6")], "src string, dst string"
    )
    c_old = transitive_closure(old_edges)
    # new edges: a pure new chain n2->n3->n4->n5 (forces multi-block B^k
    # compositions: the n0->n6 path threads old, new, new, new, old)
    new_edges = spark.createDataFrame(
        [("n2", "n3"), ("n3", "n4"), ("n4", "n5")], "src string, dst string"
    )
    updated = transitive_closure_delta(c_old, new_edges)
    rebuilt = transitive_closure(old_edges.union(new_edges))
    assert _pairs(updated) == _pairs(rebuilt)
    assert ("n0", "n6") in _pairs(updated)


def test_closure_delta_equals_full_rebuild_dense_weave(spark):
    # deterministic pseudo-random graph: old edges i -> (i*7+3) % 20,
    # new edges i -> (i*11+5) % 20 for a sample of nodes; delta result
    # must equal a from-scratch closure (cycles included)
    old = [(f"v{i}", f"v{(i * 7 + 3) % 20}") for i in range(0, 20, 2)]
    new = [(f"v{i}", f"v{(i * 11 + 5) % 20}") for i in range(1, 20, 3)]
    old_edges = spark.createDataFrame(old, "src string, dst string")
    new_edges = spark.createDataFrame(new, "src string, dst string")
    updated = transitive_closure_delta(transitive_closure(old_edges), new_edges)
    rebuilt = transitive_closure(old_edges.union(new_edges))
    assert _pairs(updated) == _pairs(rebuilt)


def test_closure_delta_empty_new_edges_is_identity(spark):
    old_edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    c_old = transitive_closure(old_edges)
    empty = old_edges.filter(F.lit(False))
    assert _pairs(transitive_closure_delta(c_old, empty)) == _pairs(c_old)


def test_entity_digest_order_invariant_and_sensitive(spark):
    """Digest ignores triple order, changes on any fact change, and the
    unit-separator join prevents concatenation collisions."""
    from dbpedia_spotlight_spark.operators.kbmaintain import entity_digest

    a = _tri(spark, [("e", "p", "x"), ("e", "q", "y")])
    b = _tri(spark, [("e", "q", "y"), ("e", "p", "x")])  # reordered
    c = _tri(spark, [("e", "p", "x"), ("e", "q", "z")])  # changed
    da = entity_digest(a).collect()[0]
    db = entity_digest(b).collect()[0]
    dc = entity_digest(c).collect()[0]
    assert da.digest == db.digest and da.n_facts == 2
    assert da.digest != dc.digest
    # 'p' + 'qy' must not collide with 'pq' + 'y'
    e1 = entity_digest(_tri(spark, [("e", "p", "qy")])).collect()[0]
    e2 = entity_digest(_tri(spark, [("e", "pq", "y")])).collect()[0]
    assert e1.digest != e2.digest


def test_ifp_sameas_star_not_clique(spark):
    from dbpedia_spotlight_spark.operators.kbmaintain import ifp_sameas
    import pytest

    rows = [
        # functional: s1 has two homepages -> h1 sameAs h2 (hub h1)
        ("s1", "home", "h2"),
        ("s1", "home", "h1"),
        # inverse-functional: three subjects share isbn X -> star on min
        ("a3", "isbn", "X"),
        ("a1", "isbn", "X"),
        ("a2", "isbn", "X"),
        # singleton groups emit nothing
        ("s2", "home", "h9"),
        ("a9", "isbn", "Y"),
        # non-declared predicate ignored
        ("s1", "knows", "s2"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r.a, r.b, r.pred, r.rule)
        for r in ifp_sameas(
            t, functional=["home"], inverse_functional=["isbn"]
        ).collect()
    }
    assert got == {
        ("h1", "h2", "home", "functional"),
        ("a1", "a2", "isbn", "inverse_functional"),
        ("a1", "a3", "isbn", "inverse_functional"),
    }
    with pytest.raises(ValueError):
        ifp_sameas(t)


def test_truthy_statements_best_rank_semantics(spark):
    """Wikidata truthy semantics: a (s,p) group with a preferred
    statement keeps ONLY preferred (normals drop); without preferred,
    all normals survive; deprecated never appear; unknown rank strings
    are treated as deprecated."""
    from dbpedia_spotlight_spark.operators.kbmaintain import truthy_statements

    st = spark.createDataFrame(
        [
            ("e1", "p", "a", "preferred"),
            ("e1", "p", "b", "normal"),
            ("e1", "p", "c", "deprecated"),
            ("e2", "p", "d", "normal"),
            ("e2", "p", "e", "normal"),
            ("e3", "p", "f", "deprecated"),
            ("e4", "p", "g", "bogus"),
        ],
        "subj string, pred string, obj string, rank string",
    )
    got = sorted(
        (r["subj"], r["obj"]) for r in truthy_statements(st).collect()
    )
    assert got == [("e1", "a"), ("e2", "d"), ("e2", "e")]
