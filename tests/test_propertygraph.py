"""Property-graph <-> RDF mapping (operators/propertygraph.py)."""

from dbpedia_spotlight_spark.operators.propertygraph import (
    pg_to_rdf,
    rdf_to_pg,
)


def _pg(spark):
    nodes = spark.createDataFrame(
        [
            ("a", "Person", "Alice", 30),
            ("b", "Person", "Bob", None),
            ("x", "City", "Metropolis", None),
        ],
        "id string, label string, name string, age int",
    )
    edges = spark.createDataFrame(
        [("a", "x", "LIVES_IN", 0.9), ("b", "x", "LIVES_IN", None)],
        "src string, dst string, rel string, weight double",
    )
    return nodes, edges


def test_pg_to_rdf_triples_and_annotations(spark):
    nodes, edges = _pg(spark)
    triples, ann = pg_to_rdf(nodes, edges)
    t = {tuple(r) for r in triples.collect()}
    assert ("a", "rdf:type", "Person") in t
    assert ("a", "name", "Alice") in t
    assert ("a", "age", "30") in t
    assert ("a", "LIVES_IN", "x") in t
    # null property skipped
    assert not any(r[0] == "b" and r[1] == "age" for r in t)
    a = {tuple(r) for r in ann.collect()}
    assert a == {("a", "LIVES_IN", "x", "weight", "0.9")}


def test_pg_rdf_roundtrip_nodes_and_edges(spark):
    nodes, edges = _pg(spark)
    triples, _ = pg_to_rdf(nodes, edges)
    back_nodes, back_edges = rdf_to_pg(
        triples, node_props=["name", "age"], rel_preds=["LIVES_IN"]
    )
    got = {tuple(r) for r in back_nodes.collect()}
    want = {
        ("a", "Person", "Alice", "30"),
        ("b", "Person", "Bob", None),
        ("x", "City", "Metropolis", None),
    }
    assert got == want
    assert {tuple(r) for r in back_edges.collect()} == {
        ("a", "LIVES_IN", "x"),
        ("b", "LIVES_IN", "x"),
    }


def test_pg_to_rdf_no_edge_props_empty_annotations(spark):
    nodes, _ = _pg(spark)
    edges = nodes.sparkSession.createDataFrame(
        [("a", "x", "NEAR")], "src string, dst string, rel string"
    )
    _, ann = pg_to_rdf(nodes, edges)
    assert ann.count() == 0
    assert ann.columns == ["subj", "pred", "obj", "ann_pred", "ann_obj"]
