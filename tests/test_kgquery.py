"""KG query operators: BGP matching, BFS distances, exact heavy hitters."""

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.kgquery import bgp_match, bfs_distances
from dbpedia_spotlight_spark.datapipe.sketches import heavy_hitters


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("alice", "type", "Person"),
        ("bob", "type", "Person"),
        ("acme", "type", "Company"),
        ("alice", "worksFor", "acme"),
        ("bob", "worksFor", "acme"),
        ("alice", "knows", "bob"),
        ("acme", "locatedIn", "berlin"),
        ("berlin", "type", "City"),
        ("alice", "livesIn", "berlin"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_bgp_single_pattern(triples):
    out = bgp_match(triples, [("?x", "type", "Person")])
    assert sorted(r.x for r in out.collect()) == ["alice", "bob"]


def test_bgp_join_chain(triples):
    # ?p works for ?c, ?c located in ?city — two shared-var joins
    out = bgp_match(
        triples,
        [
            ("?p", "type", "Person"),
            ("?p", "worksFor", "?c"),
            ("?c", "locatedIn", "?city"),
        ],
    )
    got = {(r.p, r.c, r.city) for r in out.collect()}
    assert got == {("alice", "acme", "berlin"), ("bob", "acme", "berlin")}


def test_bgp_constant_most_constrained_first(triples):
    # the 2-constant pattern anchors the join; result = people in berlin
    out = bgp_match(
        triples,
        [("?p", "livesIn", "berlin"), ("?p", "type", "Person")],
    )
    assert [r.p for r in out.collect()] == ["alice"]


def test_bgp_repeated_var_in_one_pattern(spark):
    t = spark.createDataFrame(
        [("a", "sameAs", "a"), ("a", "sameAs", "b")],
        "subj string, pred string, obj string",
    )
    out = bgp_match(t, [("?x", "sameAs", "?x")])
    assert [r.x for r in out.collect()] == ["a"]


def test_bgp_disconnected_cross_join(triples):
    out = bgp_match(
        triples,
        [("?x", "type", "City"), ("?y", "type", "Company")],
    )
    assert {(r.x, r.y) for r in out.collect()} == {("berlin", "acme")}


def test_bgp_rejects_degenerate():
    with pytest.raises(ValueError):
        bgp_match(None, [])
    with pytest.raises(ValueError):
        bgp_match(None, [("a", "b", "c")])  # no variable


def test_bfs_distances(spark):
    # path graph 0-1-2-3-4 plus an unreachable node 9
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (9, 9)], "src long, dst long"
    )
    # symmetrize
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src")))
    srcs = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.dist for r in bfs_distances(sym, srcs, 3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}  # 4 beyond max_hops, 9 unreachable


def test_bfs_multi_source_min(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (5, 2)], "src long, dst long")
    srcs = spark.createDataFrame([(0,), (5,)], "node long")
    out = {r.node: r.dist for r in bfs_distances(edges, srcs, 5).collect()}
    # 2 is reachable at hop 1 from 5, not hop 2 via 0's chain
    assert out == {0: 0, 5: 0, 1: 1, 2: 1}


def test_bfs_early_exit(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    srcs = spark.createDataFrame([(0,)], "node long")
    out = bfs_distances(edges, srcs, 100)  # frontier drains at hop 2
    assert {r.node: r.dist for r in out.collect()} == {0: 0, 1: 1}


def test_heavy_hitters_exact(spark):
    # 60 rows: 'a' x30, 'b' x20, 'c' x6, singletons x4; k=4 -> thresh 15
    vals = ["a"] * 30 + ["b"] * 20 + ["c"] * 6 + ["d", "e", "f", "g"]
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(7)
    got = {r.item: r.cnt for r in heavy_hitters(df, "tok", 4).collect()}
    assert got == {"a": 30, "b": 20}


def test_heavy_hitters_partitioning_independent(spark):
    vals = ["x"] * 9 + ["y"] * 8 + list("pqrstuvw")  # n=25, k=3 -> >8.33
    for parts in (1, 5, 13):
        df = spark.createDataFrame(
            [(v,) for v in vals], "tok string"
        ).repartition(parts)
        got = {r.item: r.cnt for r in heavy_hitters(df, "tok", 3).collect()}
        assert got == {"x": 9}, parts


def test_heavy_hitters_rejects_k1(spark):
    df = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "tok", 1)
