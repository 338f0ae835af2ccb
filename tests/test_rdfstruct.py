"""RDF collections (rdf:first/rest flattening) and statement reification
round-trip (operators/rdfstruct.py)."""

from dbpedia_spotlight_spark.operators.rdfstruct import (
    rdf_list_members,
    reify_statements,
    unreify_statements,
)


def _tri(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_rdf_list_flattening_positions(spark):
    # one 3-element list (l0->l1->l2), one singleton (s0), unrelated triple
    tri = _tri(
        spark,
        [
            ("l0", "rdf:first", "A"),
            ("l0", "rdf:rest", "l1"),
            ("l1", "rdf:first", "B"),
            ("l1", "rdf:rest", "l2"),
            ("l2", "rdf:first", "C"),
            ("l2", "rdf:rest", "rdf:nil"),
            ("s0", "rdf:first", "X"),
            ("s0", "rdf:rest", "rdf:nil"),
            ("e", "label", "E"),
        ],
    )
    got = {
        (r.head, r.pos, r.member) for r in rdf_list_members(tri).collect()
    }
    assert got == {
        ("l0", 0, "A"),
        ("l0", 1, "B"),
        ("l0", 2, "C"),
        ("s0", 0, "X"),
    }


def test_rdf_list_long_chain_log_rounds(spark):
    # 20 cells exercise the repeated-squaring path (>1 squaring round)
    rows = []
    for i in range(20):
        rows.append((f"c{i}", "rdf:first", f"m{i}"))
        rows.append(
            (f"c{i}", "rdf:rest", f"c{i+1}" if i < 19 else "rdf:nil")
        )
    out = rdf_list_members(_tri(spark, rows)).collect()
    assert len(out) == 20
    assert all(r.head == "c0" for r in out)
    assert sorted((r.pos, r.member) for r in out) == [
        (i, f"m{i}") for i in range(20)
    ]


def test_rdf_list_cycle_dropped(spark):
    # malformed: x0 -> x1 -> x0 has no head; the good list still flattens
    tri = _tri(
        spark,
        [
            ("x0", "rdf:first", "A"),
            ("x0", "rdf:rest", "x1"),
            ("x1", "rdf:first", "B"),
            ("x1", "rdf:rest", "x0"),
            ("g0", "rdf:first", "G"),
            ("g0", "rdf:rest", "rdf:nil"),
        ],
    )
    got = {(r.head, r.pos, r.member) for r in rdf_list_members(tri).collect()}
    assert got == {("g0", 0, "G")}


def test_reify_unreify_roundtrip(spark):
    tri = _tri(
        spark,
        [("a", "p", "b"), ("a", "q", "c"), ("a", "p", "b")],  # dup collapses
    )
    reified = reify_statements(tri)
    # 2 distinct facts * 4 legs
    assert reified.count() == 8
    back = {
        (r.subj, r.pred, r.obj) for r in unreify_statements(reified).collect()
    }
    assert back == {("a", "p", "b"), ("a", "q", "c")}


def test_reify_deterministic_ids(spark):
    tri = _tri(spark, [("a", "p", "b")])
    id1 = {r.subj for r in reify_statements(tri).collect()}
    id2 = {r.subj for r in reify_statements(tri).collect()}
    assert id1 == id2 and len(id1) == 1
    assert next(iter(id1)).startswith("stmt:")


def test_unreify_drops_partial_statements(spark):
    reified = _tri(
        spark,
        [
            ("s1", "rdf:subject", "a"),
            ("s1", "rdf:predicate", "p"),
            # s1 has no rdf:object -> dropped
            ("s2", "rdf:subject", "x"),
            ("s2", "rdf:predicate", "q"),
            ("s2", "rdf:object", "y"),
        ],
    )
    back = {
        (r.subj, r.pred, r.obj) for r in unreify_statements(reified).collect()
    }
    assert back == {("x", "q", "y")}
