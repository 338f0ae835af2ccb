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


def _pr_reference(edges, n_iter=3, alpha=0.85):
    """Pure-python power method with uniform dangling reset."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dm = sum(r[v] for v in nodes if v not in out)
        nxt = {}
        for v in nodes:
            inflow = sum(
                r[u] / len(out[u]) for u in nodes if v in out.get(u, ())
            )
            nxt[v] = (1 - alpha) / n + alpha * (inflow + dm / n)
        r = nxt
    return r


def test_global_pagerank_matches_reference(spark):
    from dbpedia_spotlight_spark.operators.graph import global_pagerank

    edges = [(0, 1), (1, 2), (2, 0), (3, 0)]  # 3 is a source, no in-links
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in global_pagerank(df, 3).collect()}
    ref = _pr_reference(edges, 3)
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_global_pagerank_dangling(spark):
    from dbpedia_spotlight_spark.operators.graph import global_pagerank

    edges = [(0, 1)]  # node 1 is dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in global_pagerank(df, 4).collect()}
    ref = _pr_reference(edges, 4)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-12, v


def _lpa_reference(edges, n_iter=3):
    """Pure-python synchronous LPA, most-frequent neighbor label,
    ties -> smallest label."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {v: v for v in adj}
    for _ in range(n_iter):
        nxt = {}
        for v, nbrs in adj.items():
            counts = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            nxt[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


def test_label_propagation_matches_reference(spark):
    from dbpedia_spotlight_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge
    edges = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9), (3, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for n_iter in (1, 2, 3):
        got = {
            r.node: r.label
            for r in label_propagation(df, n_iter).collect()
        }
        assert got == _lpa_reference(edges, n_iter), n_iter


def test_label_propagation_isolated_clique(spark):
    from dbpedia_spotlight_spark.operators.graph import label_propagation

    # a clique with no bridges settles on its min node label
    edges = [(4, 5), (5, 6), (4, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, 3).collect()}
    assert got == {4: 4, 5: 4, 6: 4}


def test_label_propagation_deterministic(spark):
    from dbpedia_spotlight_spark.operators.graph import label_propagation

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)], "src long, dst long"
    ).repartition(5)
    a = sorted((r.node, r.label) for r in label_propagation(df, 3).collect())
    b = sorted((r.node, r.label) for r in label_propagation(df, 3).collect())
    assert a == b


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_heavy_hitters_plan_broadcast_semi(spark):
    vals = [("a",)] * 50 + [("b",)] * 5
    df = spark.createDataFrame(vals, "tok string").repartition(4)
    plan = _plan(heavy_hitters(df, "tok", 4))
    # phase-2 recount must semi-join the BROADCAST candidate set — a
    # shuffle here would defeat the whole design
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_relation_triples_plan_no_cartesian(spark):
    from dbpedia_spotlight_spark.pipeline.triples import relation_triples

    tokens = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "x"), (1, 2, "b")],
        "doc_id long, pos long, token string",
    )
    mentions = spark.createDataFrame(
        [(1, 0, "A"), (1, 2, "B")], "doc_id long, pos long, uri string"
    )
    plan = _plan(relation_triples(mentions, tokens, max_gap=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bgp_plan_no_cartesian_when_connected(spark, triples):
    plan = _plan(
        bgp_match(
            triples,
            [
                ("?p", "type", "Person"),
                ("?p", "worksFor", "?c"),
                ("?c", "locatedIn", "?city"),
            ],
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shortest_paths_weighted(spark):
    from dbpedia_spotlight_spark.operators.kgquery import shortest_paths

    # 0->1 (1.0), 1->2 (1.0), 0->2 (5.0): two-hop path beats direct edge
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)],
        "src long, dst long, weight double",
    )
    srcs = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in shortest_paths(edges, srcs, 3).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_shortest_paths_hop_bound(spark):
    from dbpedia_spotlight_spark.operators.kgquery import shortest_paths

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)],
        "src long, dst long, weight double",
    )
    srcs = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in shortest_paths(edges, srcs, 1).collect()}
    # one round: only direct edges relaxed
    assert got == {0: 0.0, 1: 1.0, 2: 5.0}


def test_shortest_paths_multi_source(spark):
    from dbpedia_spotlight_spark.operators.kgquery import shortest_paths

    edges = spark.createDataFrame(
        [(0, 1, 4.0), (5, 1, 1.0)], "src long, dst long, weight double"
    )
    srcs = spark.createDataFrame([(0,), (5,)], "node long")
    got = {r.node: r.dist for r in shortest_paths(edges, srcs, 2).collect()}
    assert got == {0: 0.0, 5: 0.0, 1: 1.0}


def test_bgp_optional_left_join(triples):
    # everyone of type Person, OPTIONAL where they live
    out = bgp_match(
        triples,
        [("?p", "type", "Person")],
        optional=[("?p", "livesIn", "?city")],
    )
    got = {(r.p, r.city) for r in out.collect()}
    # alice has a city; bob survives with null
    assert got == {("alice", "berlin"), ("bob", None)}


def test_bgp_filter_expression(triples):
    out = bgp_match(
        triples,
        [("?p", "type", "Person"), ("?p", "worksFor", "?c")],
        filters=["p != 'bob'"],
    )
    assert [(r.p, r.c) for r in out.collect()] == [("alice", "acme")]


def test_bgp_optional_requires_shared_var(triples):
    with pytest.raises(ValueError):
        bgp_match(
            triples,
            [("?p", "type", "Person")],
            optional=[("?x", "type", "City")],
        )


def test_sparql_select_basic(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?p WHERE { ?p <type> 'Person' . }",
    )
    assert sorted(r.p for r in out.collect()) == ["alice", "bob"]


def test_sparql_select_join_projection(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?p ?city WHERE {
             ?p <type> 'Person' .
             ?p <worksFor> ?c .
             ?c <locatedIn> ?city .
           }""",
    )
    got = {(r.p, r.city) for r in out.collect()}
    assert got == {("alice", "berlin"), ("bob", "berlin")}


def test_sparql_select_optional_and_filter(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT * WHERE {
             ?p <type> 'Person' .
             FILTER(?p != 'nobody')
             OPTIONAL { ?p <livesIn> ?city . }
           }""",
    )
    got = {(r.p, r.city) for r in out.collect()}
    assert got == {("alice", "berlin"), ("bob", None)}


def test_sparql_select_filter_translation(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?p ?c WHERE {
             ?p <worksFor> ?c .
             FILTER(?p = 'alice' || ?p = 'bob')
             FILTER(?c != 'nowhere' && ?p != 'bob')
           }""",
    )
    assert [(r.p, r.c) for r in out.collect()] == [("alice", "acme")]


def test_sparql_select_rejects_unbound_projection(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(triples, "SELECT ?zzz WHERE { ?p <type> 'Person' . }")


def test_sparql_select_rejects_garbage(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(triples, "ASK { ?p <type> 'Person' }")


def test_bgp_property_path_one_or_more(spark):
    # partOf chain: w -> x -> y -> z; plus unrelated edge
    t = spark.createDataFrame(
        [
            ("w", "partOf", "x"),
            ("x", "partOf", "y"),
            ("y", "partOf", "z"),
            ("w", "knows", "z"),
        ],
        "subj string, pred string, obj string",
    )
    out = bgp_match(t, [("w", "partOf+", "?a")])
    assert sorted(r.a for r in out.collect()) == ["x", "y", "z"]


def test_bgp_property_path_joins_with_plain_pattern(spark):
    t = spark.createDataFrame(
        [
            ("w", "partOf", "x"),
            ("x", "partOf", "y"),
            ("x", "type", "Widget"),
            ("y", "type", "Gadget"),
        ],
        "subj string, pred string, obj string",
    )
    out = bgp_match(
        t, [("w", "partOf+", "?a"), ("?a", "type", "?t")]
    )
    got = {(r.a, r.t) for r in out.collect()}
    assert got == {("x", "Widget"), ("y", "Gadget")}


def test_sparql_select_property_path(spark):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    t = spark.createDataFrame(
        [("a", "sub", "b"), ("b", "sub", "c")],
        "subj string, pred string, obj string",
    )
    out = sparql_select(t, "SELECT ?x WHERE { a <sub>+ ?x . }")
    assert sorted(r.x for r in out.collect()) == ["b", "c"]


def test_neighborhood_jaccard(spark):
    from dbpedia_spotlight_spark.operators.graph import neighborhood_jaccard

    # a and b share neighbors {x, y}; a also has z -> J = 2/4 (deg_a=3
    # includes b? no: a's neighbors are x,y,z; b's are x,y) -> 2/3
    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", "z"), ("b", "x"), ("b", "y")],
        "src string, dst string",
    )
    got = {(r.a, r.b): r for r in neighborhood_jaccard(edges).collect()}
    j = got[("a", "b")]
    assert j.n_common == 2 and j.deg_a == 3 and j.deg_b == 2
    assert abs(j.jaccard - round(2 / 3, 6)) < 1e-9


def test_neighborhood_jaccard_no_all_pairs(spark):
    from dbpedia_spotlight_spark.operators.graph import neighborhood_jaccard

    # c and d share nothing -> pair absent entirely
    edges = spark.createDataFrame(
        [("c", "x"), ("d", "y")], "src string, dst string"
    )
    assert neighborhood_jaccard(edges).collect() == []


def test_bgp_minus_removes_matches(triples):
    # people MINUS those who live somewhere -> bob only
    out = bgp_match(
        triples,
        [("?p", "type", "Person")],
        minus=[("?p", "livesIn", "?city")],
    )
    assert [r.p for r in out.collect()] == ["bob"]


def test_bgp_minus_requires_shared_var(triples):
    with pytest.raises(ValueError):
        bgp_match(
            triples,
            [("?p", "type", "Person")],
            minus=[("?x", "type", "City")],
        )


def test_sparql_select_minus(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?p WHERE {
             ?p <type> 'Person' .
             MINUS { ?p <knows> ?q . }
           }""",
    )
    # alice knows bob; bob knows nobody
    assert [r.p for r in out.collect()] == ["bob"]


def test_sparql_select_aggregate_group_by(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?c (COUNT(?p) AS ?n) WHERE {
             ?p <worksFor> ?c .
           } GROUP BY ?c""",
    )
    got = {(r.c, r.n) for r in out.collect()}
    assert got == {("acme", 2)}


def test_sparql_select_global_aggregate(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT (COUNT(?p) AS ?n) WHERE { ?p <type> 'Person' . }",
    )
    assert out.collect()[0].n == 2


def test_sparql_select_order_limit(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?p WHERE { ?p <type> ?t . } ORDER BY ?p DESC LIMIT 2",
    )
    assert [r.p for r in out.collect()] == ["bob", "berlin"]


def test_sparql_select_rejects_ungrouped_var(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(
            triples,
            "SELECT ?p (COUNT(?c) AS ?n) WHERE { ?p <worksFor> ?c . }",
        )


def test_sparql_select_rejects_trailing_junk(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(
            triples, "SELECT ?p WHERE { ?p <type> 'Person' . } HAVING x"
        )


def test_sparql_select_union(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?x WHERE {
             { ?x <type> 'Person' . } UNION { ?x <type> 'City' . }
           }""",
    )
    assert sorted(r.x for r in out.collect()) == ["alice", "berlin", "bob"]


def test_sparql_select_union_pads_unshared_vars(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT * WHERE {
             { ?x <knows> ?y . } UNION { ?x <type> 'City' . }
           }""",
    )
    got = {(r.x, r.y) for r in out.collect()}
    assert got == {("alice", "bob"), ("berlin", None)}


def test_sparql_select_union_with_filter(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?x WHERE {
             { ?x <type> 'Person' . } UNION { ?x <type> 'Company' . }
             FILTER(?x != 'bob')
           }""",
    )
    assert sorted(r.x for r in out.collect()) == ["acme", "alice"]


def test_sparql_select_rejects_mixed_union_and_patterns(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(
            triples,
            """SELECT ?x WHERE {
                 ?x <type> 'Person' .
                 { ?x <knows> ?y . } UNION { ?x <type> 'City' . }
               }""",
        )


def test_sparql_select_values(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?p ?t WHERE {
             ?p <type> ?t .
             VALUES ?t { 'Person' 'City' }
           }""",
    )
    got = {(r.p, r.t) for r in out.collect()}
    assert got == {
        ("alice", "Person"), ("bob", "Person"), ("berlin", "City"),
    }


def test_sparql_select_values_unbound_var(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(
            triples,
            "SELECT ?p WHERE { ?p <type> 'Person' . VALUES ?zz { 'a' } }",
        )


# ---------------------------------------------------------------------------
# round 4: SPARQL 1.1 property paths / multi-OPTIONAL / multi-var VALUES /
# token-aware FILTER translation
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def chain(spark):
    # a -sub-> b -sub-> c; labels; one alt edge
    rows = [
        ("a", "sub", "b"),
        ("b", "sub", "c"),
        ("a", "label", "A"),
        ("b", "label", "B"),
        ("a", "alt", "z"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_path_star_includes_identity(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(chain, "SELECT ?x WHERE { b <sub>* ?x . }")
    # zero-length: b itself; closure: c
    assert sorted(r.x for r in out.collect()) == ["b", "c"]


def test_path_opt_zero_or_one(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(chain, "SELECT ?x WHERE { a <sub>? ?x . }")
    # identity (a) plus ONE step (b) — never c
    assert sorted(r.x for r in out.collect()) == ["a", "b"]


def test_path_sequence(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(chain, "SELECT ?x WHERE { a <sub>/<sub> ?x . }")
    assert sorted(r.x for r in out.collect()) == ["c"]


def test_path_alternation(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(chain, "SELECT ?x WHERE { a <sub>|<alt> ?x . }")
    assert sorted(r.x for r in out.collect()) == ["b", "z"]


def test_path_parenthesised_combination(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        chain, "SELECT ?x WHERE { a <sub>/(<label>|<sub>) ?x . }"
    )
    # a -sub-> b, then label (B) or sub (c)
    assert sorted(r.x for r in out.collect()) == ["B", "c"]


def test_path_quantified_exact(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(chain, "SELECT ?x WHERE { a <sub>{2} ?x . }")
    assert sorted(r.x for r in out.collect()) == ["c"]


def test_path_quantified_range(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(chain, "SELECT ?x WHERE { a <sub>{1,2} ?x . }")
    assert sorted(r.x for r in out.collect()) == ["b", "c"]


def test_path_quantified_zero_includes_identity(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(chain, "SELECT ?x WHERE { a <sub>{0,1} ?x . }")
    assert sorted(r.x for r in out.collect()) == ["a", "b"]


def test_path_quantified_unbounded_tail(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(chain, "SELECT ?x WHERE { a <sub>{1,} ?x . }")
    assert sorted(r.x for r in out.collect()) == ["b", "c"]


def test_path_quantified_on_group(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        chain, "SELECT ?x WHERE { a (<sub>){1,2} ?x . }"
    )
    assert sorted(r.x for r in out.collect()) == ["b", "c"]


def test_path_quantifier_max_below_min_rejected(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(chain, "SELECT ?x WHERE { a <sub>{3,2} ?x . }")


def test_path_variable_inside_path_rejected(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(chain, "SELECT ?x WHERE { a <sub>/?p ?x . }")


def test_two_optional_groups(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?p ?city ?b WHERE {
             ?p <type> 'Person' .
             OPTIONAL { ?p <livesIn> ?city . }
             OPTIONAL { ?p <knows> ?b . }
           }""",
    )
    got = {(r.p, r.city, r.b) for r in out.collect()}
    assert got == {("alice", "berlin", "bob"), ("bob", None, None)}


def test_bgp_match_optional_list_of_groups(triples):
    out = bgp_match(
        triples,
        [("?p", "type", "Person")],
        optional=[
            [("?p", "livesIn", "?city")],
            [("?p", "knows", "?b")],
        ],
    )
    got = {(r.p, r.city, r.b) for r in out.collect()}
    assert got == {("alice", "berlin", "bob"), ("bob", None, None)}


def test_filter_on_optional_var_runs_after_left_join(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    # round-3 ADVICE: this used to die with an unresolved-column
    # AnalysisException; now the filter applies after the left join
    out = sparql_select(
        triples,
        """SELECT ?p ?city WHERE {
             ?p <type> 'Person' .
             FILTER(?city = 'berlin')
             OPTIONAL { ?p <livesIn> ?city . }
           }""",
    )
    assert [(r.p, r.city) for r in out.collect()] == [("alice", "berlin")]


def test_filter_literal_not_rewritten(spark):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    t = spark.createDataFrame(
        [("x", "v", "a=b"), ("y", "v", "a&&b"), ("z", "v", "plain")],
        "subj string, pred string, obj string",
    )
    # round-3 ADVICE: '=' and '&&' inside the quoted literal must survive
    out = sparql_select(
        t, "SELECT ?s WHERE { ?s <v> ?o . FILTER(?o = 'a=b' || ?o = 'a&&b') }"
    )
    assert sorted(r.s for r in out.collect()) == ["x", "y"]


def test_filter_decimal_literal(spark):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    t = spark.createDataFrame(
        [("x", "score", "1.4"), ("y", "score", "1.6")],
        "subj string, pred string, obj string",
    )
    # round-3 ADVICE: 1.5 used to tokenize as '1 . 5' and fail to parse
    out = sparql_select(
        t, "SELECT ?s WHERE { ?s <score> ?v . FILTER(?v > 1.5) }"
    )
    assert [r.s for r in out.collect()] == ["y"]


def test_values_multi_variable(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?p ?c WHERE {
             ?p <worksFor> ?c .
             VALUES (?p ?c) { ('alice' 'acme') ('bob' 'nowhere') }
           }""",
    )
    assert [(r.p, r.c) for r in out.collect()] == [("alice", "acme")]


def test_values_undef_rejected(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(
            triples,
            "SELECT ?p WHERE { ?p <type> ?t . "
            "VALUES (?p ?t) { ('alice' UNDEF) } }",
        )


def test_path_inverse(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(chain, "SELECT ?x WHERE { b ^<sub> ?x . }")
    # who points TO b via sub: a
    assert sorted(r.x for r in out.collect()) == ["a"]


def test_path_inverse_with_sequence(chain):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    # c's sub-parent, then that node's label: ^sub then label
    out = sparql_select(chain, "SELECT ?x WHERE { c ^<sub>/<label> ?x . }")
    assert sorted(r.x for r in out.collect()) == ["B"]


def test_filter_sparql_builtins(spark):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    t = spark.createDataFrame(
        [("x", "name", "Apache Spark"), ("y", "name", "Flink"),
         ("z", "name", "sparkle")],
        "subj string, pred string, obj string",
    )
    out = sparql_select(
        t,
        "SELECT ?s WHERE { ?s <name> ?n . "
        "FILTER(CONTAINS(?n, 'park') && STRSTARTS(?n, 'Apache')) }",
    )
    assert [r.s for r in out.collect()] == ["x"]
    out2 = sparql_select(
        t,
        "SELECT ?s WHERE { ?s <name> ?n . FILTER(REGEX(?n, '^[a-z]+$')) }",
    )
    assert [r.s for r in out2.collect()] == ["z"]
    out3 = sparql_select(
        t,
        "SELECT ?s WHERE { ?s <name> ?n . FILTER(STRLEN(?n) > 6) }",
    )
    assert sorted(r.s for r in out3.collect()) == ["x", "z"]


def test_filter_bound_on_optional(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        """SELECT ?p WHERE {
             ?p <type> 'Person' .
             OPTIONAL { ?p <livesIn> ?city . }
             FILTER(!BOUND(?city))
           }""",
    )
    # bob has no livesIn edge
    assert [r.p for r in out.collect()] == ["bob"]


def test_limit_offset(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    all_rows = sparql_select(
        triples, "SELECT ?s WHERE { ?s <type> ?t . } ORDER BY ?s"
    ).collect()
    page = sparql_select(
        triples,
        "SELECT ?s WHERE { ?s <type> ?t . } ORDER BY ?s LIMIT 2 OFFSET 1",
    ).collect()
    assert [r.s for r in page] == [r.s for r in all_rows[1:3]]


def test_sparql_ask(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_ask

    yes = sparql_ask(triples, "ASK { alice <knows> ?x . }")
    no = sparql_ask(triples, "ASK { bob <knows> ?x . }")
    assert yes.collect()[0].ask is True
    assert no.collect()[0].ask is False


def test_sparql_construct(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_construct

    out = sparql_construct(
        triples,
        """CONSTRUCT { ?p <employedBy> ?c . ?c <employs> ?p . }
           WHERE { ?p <worksFor> ?c . }""",
    )
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {
        ("alice", "employedBy", "acme"),
        ("acme", "employs", "alice"),
        ("bob", "employedBy", "acme"),
        ("acme", "employs", "bob"),
    }


def test_sparql_construct_drops_unbound_optional_rows(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_construct

    out = sparql_construct(
        triples,
        """CONSTRUCT { ?p <cityOf> ?city . }
           WHERE { ?p <type> 'Person' . OPTIONAL { ?p <livesIn> ?city . } }""",
    )
    # bob's ?city is unbound -> incomplete triple dropped (spec §16.2)
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {("alice", "cityOf", "berlin")}


def test_sparql_construct_rejects_unbound_template_var(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_construct

    with pytest.raises(ValueError):
        sparql_construct(
            triples,
            "CONSTRUCT { ?p <x> ?zzz . } WHERE { ?p <type> 'Person' . }",
        )

def test_negated_property_set(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples, "SELECT ?s ?o WHERE { ?s !(<type>|<worksFor>) ?o . }"
    )
    got = {(r.s, r.o) for r in out.collect()}
    assert got == {
        ("alice", "bob"),       # knows
        ("acme", "berlin"),     # locatedIn
        ("alice", "berlin"),    # livesIn
    }


def test_negated_property_set_single(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(triples, "SELECT ?s ?o WHERE { ?s !<type> ?o . }")
    assert all(
        (r.s, r.o) != ("alice", "Person") for r in out.collect()
    ) and out.count() == 5


def test_negated_set_rejects_inverse_member(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError):
        sparql_select(triples, "SELECT ?s ?o WHERE { ?s !(^<type>) ?o . }")


def test_bind_expression(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?p ?u WHERE { ?p <type> 'Person' . BIND(UCASE(?p) AS ?u) }",
    )
    got = {(r.p, r.u) for r in out.collect()}
    assert got == {("alice", "ALICE"), ("bob", "BOB")}


def test_bind_unbound_reference_raises(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError, match="unbound"):
        sparql_select(
            triples,
            "SELECT ?p ?u WHERE { ?p <type> 'Person' . "
            "BIND(UCASE(?zzz) AS ?u) }",
        )


def test_bind_existing_target_raises(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError, match="already bound"):
        sparql_select(
            triples,
            "SELECT ?p WHERE { ?p <type> 'Person' . BIND('x' AS ?p) }",
        )


def test_filter_exists(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?p WHERE { ?p <type> 'Person' . "
        "FILTER EXISTS { ?p <livesIn> ?c . } }",
    )
    assert [r.p for r in out.collect()] == ["alice"]


def test_filter_not_exists(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?p WHERE { ?p <type> 'Person' . "
        "FILTER NOT EXISTS { ?p <livesIn> ?c . } }",
    )
    assert [r.p for r in out.collect()] == ["bob"]


def test_filter_exists_uncorrelated(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    # the group shares no variable: holds for every solution or none
    kept = sparql_select(
        triples,
        "SELECT ?p WHERE { ?p <type> 'Person' . "
        "FILTER EXISTS { ?x <locatedIn> berlin . } }",
    )
    dropped = sparql_select(
        triples,
        "SELECT ?p WHERE { ?p <type> 'Person' . "
        "FILTER EXISTS { ?x <locatedIn> mars . } }",
    )
    assert kept.count() == 2 and dropped.count() == 0


def test_having_rewrites_to_alias(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?c (COUNT(*) AS ?n) WHERE { ?p <worksFor> ?c . } "
        "GROUP BY ?c HAVING(COUNT(*) > 1)",
    )
    rows = out.collect()
    assert [(r.c, r.n) for r in rows] == [("acme", 2)]


def test_having_unprojected_aggregate_raises(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError, match="projected"):
        sparql_select(
            triples,
            "SELECT ?c (COUNT(*) AS ?n) WHERE { ?p <worksFor> ?c . } "
            "GROUP BY ?c HAVING(SUM(?n) > 1)",
        )


def test_having_without_group_raises(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    with pytest.raises(ValueError, match="HAVING"):
        sparql_select(
            triples,
            "SELECT ?p WHERE { ?p <type> 'Person' . } HAVING(COUNT(*) > 1)",
        )


def test_count_star_and_count_distinct(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    star = sparql_select(
        triples, "SELECT (COUNT(*) AS ?n) WHERE { ?s <type> ?t . }"
    ).collect()
    dist = sparql_select(
        triples,
        "SELECT (COUNT(DISTINCT ?t) AS ?n) WHERE { ?s <type> ?t . }",
    ).collect()
    assert star[0].n == 4 and dist[0].n == 3


def test_sparql_describe_constant(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_describe

    out = sparql_describe(triples, "DESCRIBE <alice>")
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {
        ("alice", "type", "Person"),
        ("alice", "worksFor", "acme"),
        ("alice", "knows", "bob"),
        ("alice", "livesIn", "berlin"),
    }


def test_sparql_describe_where(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_describe

    out = sparql_describe(
        triples, "DESCRIBE ?c WHERE { ?c <type> 'Company' . }"
    )
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {
        ("acme", "type", "Company"),
        ("acme", "locatedIn", "berlin"),
    }


def test_sparql_describe_var_without_where_raises(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_describe

    with pytest.raises(ValueError, match="WHERE"):
        sparql_describe(triples, "DESCRIBE ?c")


def test_subquery_joined_on_shared_var(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?p ?c ?m WHERE { ?p <worksFor> ?c . "
        "{ SELECT ?c (COUNT(*) AS ?m) WHERE { ?x <worksFor> ?c . } "
        "GROUP BY ?c } }",
    )
    got = {(r.p, r.c, r.m) for r in out.collect()}
    assert got == {("alice", "acme", 2), ("bob", "acme", 2)}


def test_subquery_only_group(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?c ?m WHERE { { SELECT ?c (COUNT(*) AS ?m) "
        "WHERE { ?x <worksFor> ?c . } GROUP BY ?c } }",
    )
    assert [(r.c, r.m) for r in out.collect()] == [("acme", 2)]


def test_filter_on_subquery_var_deferred(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    # ?m is bound only by the subquery: the FILTER must run after the
    # subquery join, not inside the BGP (previously an AnalysisException)
    out = sparql_select(
        triples,
        "SELECT ?p ?c WHERE { ?p <worksFor> ?c . "
        "{ SELECT ?c (COUNT(*) AS ?m) WHERE { ?x <worksFor> ?c . } "
        "GROUP BY ?c } FILTER(?m > 1) }",
    )
    got = {(r.p, r.c) for r in out.collect()}
    assert got == {("alice", "acme"), ("bob", "acme")}


def test_subquery_disjoint_cross_join(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?city ?m WHERE { ?city <type> 'City' . "
        "{ SELECT (COUNT(*) AS ?m) WHERE { ?x <type> 'Person' . } } }",
    )
    assert [(r.city, r.m) for r in out.collect()] == [("berlin", 2)]


def test_nested_subquery(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?c ?m WHERE { { SELECT ?c (COUNT(*) AS ?m) WHERE { "
        "?p <worksFor> ?c . { SELECT ?p WHERE { ?p <type> 'Person' . } } "
        "} GROUP BY ?c } }",
    )
    assert [(r.c, r.m) for r in out.collect()] == [("acme", 2)]


def test_group_concat_sorted_with_separator(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?c (GROUP_CONCAT(?p ; SEPARATOR = ',') AS ?ps) "
        "WHERE { ?p <worksFor> ?c . } GROUP BY ?c",
    )
    assert [(r.c, r.ps) for r in out.collect()] == [("acme", "alice,bob")]


def test_group_concat_default_separator(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?c (GROUP_CONCAT(?p) AS ?ps) "
        "WHERE { ?p <worksFor> ?c . } GROUP BY ?c",
    )
    assert [r.ps for r in out.collect()] == ["alice bob"]


def test_sample_aggregate_deterministic(triples):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    out = sparql_select(
        triples,
        "SELECT ?c (SAMPLE(?p) AS ?one) "
        "WHERE { ?p <worksFor> ?c . } GROUP BY ?c",
    )
    assert [(r.c, r.one) for r in out.collect()] == [("acme", "alice")]


def test_rdfs_schema_entailment_rules_and_fixpoint(spark):
    """rdfs7 over a transitively-closed subproperty chain, rdfs2 domain,
    rdfs3 range — and the round-2 interaction: the domain of a DERIVED
    superproperty triple fires only after rdfs7 produced it."""
    from dbpedia_spotlight_spark.operators.kgquery import rdfs_schema_entailment

    tri = spark.createDataFrame(
        [("a", "worksFor", "b"), ("b", "basedIn", "c")],
        "subj string, pred string, obj string",
    )
    sub = spark.createDataFrame(
        [("worksFor", "affiliatedWith"), ("affiliatedWith", "relatedTo")],
        "prop string, superprop string",
    )
    dom = spark.createDataFrame(
        [("worksFor", "Person"), ("affiliatedWith", "Agent")],
        "prop string, cls string",
    )
    rng = spark.createDataFrame(
        [("worksFor", "Org")], "prop string, cls string"
    )
    got = {
        tuple(r)
        for r in rdfs_schema_entailment(
            tri, subproperties=sub, domains=dom, ranges=rng
        ).collect()
    }
    assert got == {
        ("a", "worksFor", "b"),
        ("b", "basedIn", "c"),
        ("a", "affiliatedWith", "b"),
        ("a", "relatedTo", "b"),
        ("a", "rdf:type", "Person"),
        ("a", "rdf:type", "Agent"),
        ("b", "rdf:type", "Org"),
    }
    # rules are individually optional
    only_rng = rdfs_schema_entailment(tri, ranges=rng).collect()
    assert ("b", "rdf:type", "Org") in {tuple(r) for r in only_rng}
    assert len(only_rng) == 3


def test_shacl_validate_cardinality_and_class(spark):
    """minCount catches focus nodes with too few values (including
    zero via the left-join coalesce), maxCount too many, class every
    untyped value; conformant focus nodes emit nothing."""
    from dbpedia_spotlight_spark.operators.shacl import shacl_validate

    tri = spark.createDataFrame(
        [
            ("alice", "rdf:type", "Person"),
            ("bob", "rdf:type", "Person"),
            ("carol", "rdf:type", "Person"),
            ("alice", "knows", "bob"),
            ("alice", "knows", "carol"),
            ("alice", "knows", "dan"),
        ],
        "subj string, pred string, obj string",
    )
    shapes = spark.createDataFrame(
        [("Person", "knows", 1, 2, "Person")],
        "target_class string, pred string, min_count long, "
        "max_count long, value_class string",
    )
    got = {tuple(r) for r in shacl_validate(tri, shapes).collect()}
    assert got == {
        ("bob", "Person", "knows", "minCount", "1", "0"),
        ("carol", "Person", "knows", "minCount", "1", "0"),
        ("alice", "Person", "knows", "maxCount", "2", "3"),
        ("alice", "Person", "knows", "class", "Person", "dan"),
    }
    # null constraints disable checks
    lax = spark.createDataFrame(
        [("Person", "knows", None, None, None)],
        "target_class string, pred string, min_count long, "
        "max_count long, value_class string",
    )
    assert shacl_validate(tri, lax).count() == 0


def test_shacl_value_term_constraints(spark):
    """pattern runs on the literal CONTENT (quotes/tags stripped),
    datatype honors RDF 1.1 simple-literal==xsd:string and
    lang-tag==rdf:langString, nodeKind splits quoted literals from
    IRIs, and in_values is an exact allow-list on the raw term."""
    from dbpedia_spotlight_spark.operators.shacl import shacl_validate

    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    tri = spark.createDataFrame(
        [
            ("d1", "rdf:type", "Doc"),
            ("d1", "code", '"AB12"'),                       # ok
            ("d1", "age", f'"41"^^<{XSD_INT}>'),            # ok
            ("d1", "status", "open"),                        # ok (in list)
            ("d1", "home", "http://x.org/d1"),               # ok IRI
            ("d2", "rdf:type", "Doc"),
            ("d2", "code", '"nope!"'),                      # pattern viol
            ("d2", "age", '"old"'),                         # datatype viol
            ("d2", "status", "broken"),                      # in viol
            ("d2", "home", '"not an iri"'),                 # nodeKind viol
        ],
        "subj string, pred string, obj string",
    )
    shapes = spark.createDataFrame(
        [
            ("Doc", "code", None, None, None, "^[A-Z]+[0-9]+$", None, None, None),
            ("Doc", "age", None, None, None, None, XSD_INT, None, None),
            ("Doc", "status", None, None, None, None, None, None, "open|closed"),
            ("Doc", "home", None, None, None, None, None, "IRI", None),
        ],
        "target_class string, pred string, min_count long, max_count long, "
        "value_class string, pattern string, datatype string, "
        "node_kind string, in_values string",
    )
    got = {tuple(r) for r in shacl_validate(tri, shapes).collect()}
    assert got == {
        ("d2", "Doc", "code", "pattern", "^[A-Z]+[0-9]+$", '"nope!"'),
        ("d2", "Doc", "age", "datatype", XSD_INT, '"old"'),
        ("d2", "Doc", "status", "in", "open|closed", "broken"),
        ("d2", "Doc", "home", "nodeKind", "IRI", '"not an iri"'),
    }


def test_shacl_old_shape_schema_still_works(spark):
    """Shape tables without the round-4 value-term columns validate
    exactly as before (absent column == constraint disabled)."""
    from dbpedia_spotlight_spark.operators.shacl import shacl_validate

    tri = spark.createDataFrame(
        [("a", "rdf:type", "T")], "subj string, pred string, obj string"
    )
    shapes = spark.createDataFrame(
        [("T", "p", 1, None, None)],
        "target_class string, pred string, min_count long, "
        "max_count long, value_class string",
    )
    got = {tuple(r) for r in shacl_validate(tri, shapes).collect()}
    assert got == {("a", "T", "p", "minCount", "1", "0")}


def test_property_table_pivot_min_and_counts(spark):
    from dbpedia_spotlight_spark.operators.kglayout import property_table

    tri = spark.createDataFrame(
        [
            ("e1", "rdf:type", "Person"),
            ("e1", "foaf:name", "Ada"),
            ("e1", "foaf:name", "Augusta"),  # multi-valued -> min
            ("e1", "born", "1815"),
            ("e2", "foaf:name", "Zed"),
        ],
        "subj string, pred string, obj string",
    )
    rows = {
        r.subj: r
        for r in property_table(tri, ["foaf:name", "born"]).collect()
    }
    assert rows["e1"].foaf_name == "Ada"
    assert rows["e1"].born == "1815"
    assert rows["e1"].n_triples == 4
    assert rows["e2"].foaf_name == "Zed"
    assert rows["e2"].born is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        property_table(tri, [])


def test_schema_summary_quotient_multitype_untyped(spark):
    from dbpedia_spotlight_spark.operators.kglayout import schema_summary

    tri = spark.createDataFrame(
        [
            ("a", "rdf:type", "Person"),
            ("a", "rdf:type", "Author"),  # multi-typed subject
            ("b", "rdf:type", "Book"),
            ("a", "wrote", "b"),
            ("a", "likes", "x"),  # untyped object
            ("z", "wrote", "b"),  # untyped subject
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r.subj_type, r.pred, r.obj_type): r.n
        for r in schema_summary(tri).collect()
    }
    assert got == {
        ("Person", "wrote", "Book"): 1,
        ("Author", "wrote", "Book"): 1,
        ("Person", "likes", "untyped"): 1,
        ("Author", "likes", "untyped"): 1,
        ("untyped", "wrote", "Book"): 1,
    }


def test_fact_ranking_rarity_topk_ties(spark):
    """Rare predicates outrank ubiquitous ones; k truncates per subject;
    ties break lexicographically by (pred, obj)."""
    import math

    from dbpedia_spotlight_spark.operators.kglayout import fact_ranking

    tri = spark.createDataFrame(
        [
            # 'type' is ubiquitous (4 of 8 edges), 'rare' appears once
            ("a", "rdf:type", "T"),
            ("b", "rdf:type", "T"),
            ("c", "rdf:type", "T"),
            ("d", "rdf:type", "T"),
            ("a", "rare", "x"),
            ("a", "mid", "y1"),
            ("a", "mid", "y2"),
            ("b", "mid", "y3"),
        ],
        "subj string, pred string, obj string",
    )
    rows = [
        (r.subj, r.pred, r.obj, r.rank)
        for r in fact_ranking(tri, k=2)
        .filter("subj = 'a'")
        .orderBy("rank")
        .collect()
    ]
    # rare (1/8) beats mid (3/8); k=2 keeps the first of the two mids
    assert rows == [("a", "rare", "x", 1), ("a", "mid", "y1", 2)]
    scores = {
        r.pred: r.score for r in fact_ranking(tri, k=4).filter("subj='a'").collect()
    }
    assert abs(scores["rare"] - round(-math.log(1 / 8), 6)) < 1e-9
    assert abs(scores["mid"] - round(-math.log(3 / 8), 6)) < 1e-9


def test_sparql_update_all_forms(spark):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_update

    tri = spark.createDataFrame(
        [
            ("a", "type", "Person"),
            ("b", "type", "Person"),
            ("a", "in", "x"),
            ("b", "in", "y"),
        ],
        "subj string, pred string, obj string",
    )

    def s(df):
        return {tuple(r) for r in df.collect()}

    base = s(tri)

    # INSERT DATA: ground triples union in; duplicates collapse
    ins = sparql_update(
        tri, "INSERT DATA { <c> <type> <Person> . <a> <in> <x> }"
    )
    assert s(ins) == base | {("c", "type", "Person")}

    # DELETE DATA: exact ground triples drop; absent triples are no-ops
    dele = sparql_update(tri, "DELETE DATA { <a> <in> <x> . <z> <in> <q> }")
    assert s(dele) == base - {("a", "in", "x")}

    # DELETE WHERE: pattern doubles as template
    dw = sparql_update(tri, "DELETE WHERE { ?p <in> ?o . }")
    assert s(dw) == {("a", "type", "Person"), ("b", "type", "Person")}

    # DELETE/INSERT WHERE: both templates over the ORIGINAL bindings
    mv = sparql_update(
        tri,
        "DELETE { ?p <in> ?o } INSERT { ?p <movedFrom> ?o } "
        "WHERE { ?p <in> ?o . ?p <type> <Person> . }",
    )
    assert s(mv) == {
        ("a", "type", "Person"),
        ("b", "type", "Person"),
        ("a", "movedFrom", "x"),
        ("b", "movedFrom", "y"),
    }

    # INSERT-only WHERE
    io_ = sparql_update(
        tri, "INSERT { ?p <knownAs> ?o } WHERE { ?p <in> ?o . }"
    )
    assert s(io_) == base | {("a", "knownAs", "x"), ("b", "knownAs", "y")}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sparql_update(tri, "INSERT DATA { ?v <p> <o> }")
    with _pytest.raises(ValueError):
        sparql_update(tri, "LOAD <http://x>")


def test_owl_property_entailment_fixpoint(spark):
    """inverseOf applies to transitively-DERIVED edges (rule feedback),
    symmetric closes both directions, and the result is a fixpoint."""
    from dbpedia_spotlight_spark.operators.kgquery import (
        owl_property_entailment,
    )

    tri = spark.createDataFrame(
        [
            ("c1", "within", "n1"),
            ("n1", "within", "r1"),
            ("n1", "borders", "n2"),
        ],
        "subj string, pred string, obj string",
    )
    inv = spark.createDataFrame(
        [("within", "contains")], "prop string, inverse string"
    )
    sym = spark.createDataFrame([("borders",)], "prop string")
    trans = spark.createDataFrame([("within",)], "prop string")
    got = {
        tuple(r)
        for r in owl_property_entailment(
            tri, inverse_of=inv, symmetric=sym, transitive=trans
        ).collect()
    }
    assert got == {
        ("c1", "within", "n1"),
        ("n1", "within", "r1"),
        ("c1", "within", "r1"),  # transitive
        ("n1", "contains", "c1"),  # inverse of base
        ("r1", "contains", "n1"),
        ("r1", "contains", "c1"),  # inverse of DERIVED edge
        ("n1", "borders", "n2"),
        ("n2", "borders", "n1"),  # symmetric
    }


def test_direct_mapping_and_dangling_objects(spark):
    from dbpedia_spotlight_spark.operators.kglayout import (
        dangling_objects,
        direct_mapping,
    )

    df = spark.createDataFrame(
        [(1, "Ada", None), (2, None, "uk")],
        "id int, name string, country string",
    )
    got = {tuple(r) for r in direct_mapping(df, "id", "person").collect()}
    assert got == {
        ("person/id=1", "person#name", "Ada"),
        ("person/id=1", "rdf:type", "person"),
        ("person/id=2", "person#country", "uk"),
        ("person/id=2", "rdf:type", "person"),
    }

    tri = spark.createDataFrame(
        [
            ("a", "rdf:type", "T"),
            ("a", "knows", "b"),
            ("a", "knows", "ghost"),
            ("b", "in", "x"),
        ],
        "subj string, pred string, obj string",
    )
    rows = {r.pred: r for r in dangling_objects(tri).collect()}
    # 'b' is a subject (of 'in'); 'ghost' and 'x' are not
    assert rows["knows"].n_edges == 2 and rows["knows"].n_dangling == 1
    assert rows["knows"].dangling_ratio == 0.5
    assert rows["in"].n_dangling == 1


def test_void_stats_and_path_profile(spark):
    from dbpedia_spotlight_spark.operators.kglayout import (
        path_profile,
        void_stats,
    )

    tri = spark.createDataFrame(
        [
            ("a", "rdf:type", "T"),
            ("b", "rdf:type", "U"),
            ("a", "p", "b"),
            ("b", "q", "c"),
            ("b", "q", "d"),
            ("x", "p", "b"),
        ],
        "subj string, pred string, obj string",
    )
    v = void_stats(tri).collect()[0]
    assert (v.n_triples, v.n_subjects, v.n_properties, v.n_classes) == (
        6, 3, 3, 2,
    )
    assert v.n_objects == 5  # {T, U, b, c, d}
    got = {
        (r.pred1, r.pred2): r.n for r in path_profile(tri).collect()
    }
    # p->q paths: (a,b,q*2) + (x,b,q*2) = 4; no other middles compose
    assert got == {("p", "q"): 4}


def test_predicate_profile_functionality_and_dtypes(spark):
    from dbpedia_spotlight_spark.operators.kglayout import predicate_profile

    tri = spark.createDataFrame(
        [
            ("a", "rdf:type", "T"),          # excluded
            ("a", "age", "41"),
            ("b", "age", "7"),               # functional, all integer
            ("a", "knows", "b"),
            ("a", "knows", "c"),             # non-functional
            ("b", "knows", "c"),
            ("a", "born", "1984-05-01"),
        ],
        "subj string, pred string, obj string",
    )
    rows = {r.pred: r for r in predicate_profile(tri).collect()}
    assert set(rows) == {"age", "knows", "born"}
    assert rows["age"].functionality == 1.0
    assert rows["age"].dominant_dtype == "integer"
    assert rows["age"].inverse_functionality == 1.0
    k = rows["knows"]
    assert k.n_triples == 3 and k.n_subjects == 2 and k.n_objects == 2
    assert k.functionality == round(2 / 3, 6)
    assert k.dominant_dtype == "string"
    assert rows["born"].dominant_dtype == "date"


def test_bgp_cost_based_ordering_same_semantics(spark):
    """pred_stats changes only the join order: results identical to the
    heuristic path, and the estimator ranks a rare predicate below a
    huge one regardless of constant arity."""
    from dbpedia_spotlight_spark.operators.kgquery import (
        _estimated_rows,
        bgp_match,
        predicate_counts,
    )

    tri = spark.createDataFrame(
        [("a", "rare", "b"), ("b", "common", "c"), ("b", "common", "d"),
         ("a", "common", "c"), ("d", "common", "a")],
        "subj string, pred string, obj string",
    )
    stats = predicate_counts(tri)
    assert stats == {"rare": 1, "common": 4}
    # at realistic KB proportions a constant-subject common pattern still
    # estimates BIGGER than the all-variable rare pattern — the arity
    # heuristic gets this wrong (it would rank the bound pattern first)
    kb = {"rare": 50, "common": 40_000}
    assert _estimated_rows(("?x", "rare", "?y"), kb, 10**6) < _estimated_rows(
        ("a", "common", "?y"), kb, 10**6
    )
    pats = [("?x", "common", "?y"), ("?y", "rare", "?z")]
    base = {
        tuple(sorted(r.asDict().items())) for r in bgp_match(tri, pats).collect()
    }
    cost = {
        tuple(sorted(r.asDict().items()))
        for r in bgp_match(tri, pats, pred_stats=stats).collect()
    }
    assert base == cost and base


# ---- GRAPH clause over quads (SPARQL 1.1 §13) ----


@pytest.fixture()
def quads(spark):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [
            Row(subj="a", pred="http://p/knows", obj="b", graph="http://g/1"),
            Row(subj="b", pred="http://p/knows", obj="c", graph="http://g/1"),
            Row(subj="a", pred="http://p/knows", obj="c", graph="http://g/2"),
            Row(subj="c", pred="http://p/type", obj="Person", graph="http://g/2"),
            Row(subj="a", pred="http://p/type", obj="Person", graph="http://g/1"),
        ]
    )


def test_graph_var_binds_graph_name(quads):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select_quads

    got = sorted(
        (r["g"], r["x"], r["y"])
        for r in sparql_select_quads(
            quads,
            "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x <http://p/knows> ?y . } }",
        ).collect()
    )
    assert got == [
        ("http://g/1", "a", "b"),
        ("http://g/1", "b", "c"),
        ("http://g/2", "a", "c"),
    ]


def test_graph_group_joins_within_one_graph(quads):
    # a->b->c chain exists only inside g/1; the cross-graph a->c/2 + c
    # edges must NOT produce a match (§13.3: one graph per GRAPH group).
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select_quads

    got = sparql_select_quads(
        quads,
        "SELECT ?g ?x WHERE { GRAPH ?g { ?x <http://p/knows> ?y . "
        "?y <http://p/knows> ?z . } }",
    ).collect()
    assert [(r["g"], r["x"]) for r in got] == [("http://g/1", "a")]


def test_graph_constant_restricts(quads):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select_quads

    got = sparql_select_quads(
        quads,
        "SELECT ?x ?y WHERE { GRAPH <http://g/2> "
        "{ ?x <http://p/knows> ?y . } }",
    ).collect()
    assert [(r["x"], r["y"]) for r in got] == [("a", "c")]


def test_default_graph_is_union_plus_filter(quads):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select_quads

    got = sorted(
        r["x"]
        for r in sparql_select_quads(
            quads,
            "SELECT ?x WHERE { ?x <http://p/type> ?t . "
            "FILTER(?t = 'Person') }",
        ).collect()
    )
    assert got == ["a", "c"]  # from both graphs


def test_graph_group_joins_default_block_on_shared_var(quads):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select_quads

    got = sparql_select_quads(
        quads,
        "SELECT ?x ?g WHERE { ?x <http://p/type> ?t . "
        "GRAPH ?g { ?x <http://p/knows> ?y . ?y <http://p/knows> ?z . } }",
    ).collect()
    assert [(r["x"], r["g"]) for r in got] == [("a", "http://g/1")]


def test_quads_parser_errors(quads):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select_quads

    with pytest.raises(ValueError, match="empty WHERE"):
        sparql_select_quads(quads, "SELECT ?x WHERE { }")
    with pytest.raises(ValueError, match="not bound"):
        sparql_select_quads(
            quads,
            "SELECT ?nope WHERE { GRAPH ?g { ?x <http://p/knows> ?y . } }",
        )


def test_graph_bgp_match_custom_graph_col(spark):
    from dbpedia_spotlight_spark.operators.kgquery import graph_bgp_match

    q = spark.createDataFrame(
        [("a", "p", "b", "gX")], "subj string, pred string, obj string, g string"
    )
    got = graph_bgp_match(q, "?gg", [("?s", "p", "?o")], graph_col="g").collect()
    assert [(r["gg"], r["s"], r["o"]) for r in got] == [("gX", "a", "b")]


def test_infer_shapes_hand_fixture(spark):
    from dbpedia_spotlight_spark.operators.shacl import infer_shapes

    rows = [
        ("a", "rdf:type", "Person"),
        ("b", "rdf:type", "Person"),
        ("a", "name", '"Alice"'),
        ("b", "name", '"Bob"'),
        ("a", "age", '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("a", "knows", "b"),
        ("a", "knows", "c"),
        ("a", "mixed", '"x"'),
        ("a", "mixed", "iri1"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r.target_class, r.pred): r
        for r in infer_shapes(t, max_in_values=3).collect()
    }
    name = got[("Person", "name")]
    assert (name.min_count, name.max_count, name.node_kind) == (1, 1, "Literal")
    assert name.datatype == "http://www.w3.org/2001/XMLSchema#string"
    assert name.in_values == '"Alice"|"Bob"'
    age = got[("Person", "age")]
    assert age.min_count == 0  # b lacks age
    assert age.datatype == "http://www.w3.org/2001/XMLSchema#integer"
    knows = got[("Person", "knows")]
    assert (knows.max_count, knows.node_kind) == (2, "IRI")
    mixed = got[("Person", "mixed")]
    assert mixed.node_kind is None and mixed.datatype is None


def test_infer_shapes_enum_cap_nulls_in_values(spark):
    from dbpedia_spotlight_spark.operators.shacl import infer_shapes

    rows = [("s", "rdf:type", "T")] + [
        ("s", "p", f"v{i}") for i in range(10)
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    row = infer_shapes(t, max_in_values=3).filter("pred = 'p'").first()
    assert row.in_values is None and row.max_count == 10


def test_inferred_shapes_validate_clean_on_source(spark):
    # Mined shapes, fed back through shacl_validate on the SAME data,
    # must report zero violations (the mine-then-enforce contract).
    from dbpedia_spotlight_spark.operators.shacl import (
        infer_shapes,
        shacl_validate,
    )

    rows = [
        ("a", "rdf:type", "Person"),
        ("b", "rdf:type", "Person"),
        ("a", "name", '"Alice"'),
        ("b", "name", '"Bob"'),
        ("a", "knows", "b"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    shapes = (
        infer_shapes(t)
        .withColumnRenamed("target_class", "target_class")
        .selectExpr(
            "target_class",
            "pred",
            "min_count",
            "max_count",
            "cast(null as string) as value_class",
            "cast(null as string) as pattern",
            "datatype",
            "node_kind",
            "in_values",
        )
    )
    assert shacl_validate(t, shapes).count() == 0


def test_numeric_literal_outliers(spark):
    from dbpedia_spotlight_spark.operators.kglayout import (
        numeric_literal_outliers,
    )

    rows = (
        [("s%d" % i, "p", '"%d"' % i) for i in range(1, 21)]
        + [("bad", "p", '"100000"')]
        + [("x", "p", "notnum")]  # non-numeric drops out
        + [("y", "q", '"1"'), ("z", "q", '"99999"')]  # under min_values
    )
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = numeric_literal_outliers(t, k=3.0, min_values=10).collect()
    assert {(r.pred, r.subj) for r in got} == {("p", "bad")}
    assert got[0].value == 100000.0


def test_numeric_literal_outliers_typed_literals(spark):
    from dbpedia_spotlight_spark.operators.kglayout import (
        numeric_literal_outliers,
    )

    xsd = '"%d"^^<http://www.w3.org/2001/XMLSchema#integer>'
    rows = [("s%d" % i, "p", xsd % i) for i in range(1, 21)] + [
        ("bad", "p", xsd % -5000)
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = numeric_literal_outliers(t).collect()
    assert [r.subj for r in got] == ["bad"]


def test_disjointness_violations_direct_and_inherited(spark):
    from dbpedia_spotlight_spark.operators.kgquery import (
        disjointness_violations,
    )

    t = spark.createDataFrame(
        [
            ("x", "rdf:type", "Person"),
            ("x", "rdf:type", "Company"),
            ("y", "rdf:type", "Person"),
            ("z", "rdf:type", "Person"),
            ("z", "rdf:type", "LLC"),
        ],
        "subj string, pred string, obj string",
    )
    disjoint = spark.createDataFrame(
        [("Person", "Organization")], "a string, b string"
    )
    closure = spark.createDataFrame(
        [("Company", "Organization"), ("LLC", "Organization")],
        "sub string, sup string",
    )
    got = {
        (r.inst, r.class_a, r.class_b)
        for r in disjointness_violations(
            t, disjoint, subclass_closure=closure
        ).collect()
    }
    assert got == {
        ("x", "Organization", "Person"),
        ("z", "Organization", "Person"),
    }


def test_disjointness_no_closure_no_violation(spark):
    from dbpedia_spotlight_spark.operators.kgquery import (
        disjointness_violations,
    )

    t = spark.createDataFrame(
        [("x", "rdf:type", "Person"), ("x", "rdf:type", "Company")],
        "subj string, pred string, obj string",
    )
    disjoint = spark.createDataFrame(
        [("Person", "Organization")], "a string, b string"
    )
    assert disjointness_violations(t, disjoint).count() == 0


def test_datalog_transitivity_and_composition(spark):
    from dbpedia_spotlight_spark.operators.kgquery import datalog_fixpoint

    t = spark.createDataFrame(
        [
            ("a", "within", "b"),
            ("b", "within", "c"),
            ("c", "within", "d"),
            ("x", "locatedIn", "a"),
        ],
        "subj string, pred string, obj string",
    )
    rules = [
        # transitivity of within
        ([("?x", "within", "?y"), ("?y", "within", "?z")],
         ("?x", "within", "?z")),
        # locatedIn propagates through within
        ([("?e", "locatedIn", "?a"), ("?a", "within", "?b")],
         ("?e", "locatedIn", "?b")),
    ]
    got = {tuple(r) for r in datalog_fixpoint(t, rules).collect()}
    assert ("a", "within", "d") in got            # depth-3 closure
    assert ("x", "locatedIn", "d") in got          # composed through closure
    assert len([r for r in got if r[1] == "within"]) == 6  # C(4,2)
    assert len([r for r in got if r[1] == "locatedIn"]) == 4


def test_datalog_constant_head_and_unbound_head_error(spark):
    import pytest

    from dbpedia_spotlight_spark.operators.kgquery import datalog_fixpoint

    t = spark.createDataFrame(
        [("a", "inNation", "n1")], "subj string, pred string, obj string"
    )
    rules = [([("?c", "inNation", "?n")], ("?c", "rdf:type", "Customer"))]
    got = {tuple(r) for r in datalog_fixpoint(t, rules).collect()}
    assert ("a", "rdf:type", "Customer") in got
    with pytest.raises(ValueError, match="not bound"):
        datalog_fixpoint(
            t, [([("?c", "inNation", "?n")], ("?c", "p", "?zzz"))]
        )


def test_r2rml_map_templates_literals_and_nulls(spark):
    from dbpedia_spotlight_spark.operators.kglayout import r2rml_map

    df = spark.createDataFrame(
        [(1, 10, "A"), (2, 20, None), (3, None, "C")],
        "k int, ref int, status string",
    )
    got = {
        tuple(r)
        for r in r2rml_map(
            df,
            "http://ex/t/{k}",
            [("http://ex/ref", "http://ex/u/{ref}"),
             ("http://ex/status", "status")],
            rdf_type="http://ex/T",
        ).collect()
    }
    assert ("http://ex/t/1", "http://ex/ref", "http://ex/u/10") in got
    assert ("http://ex/t/1", "http://ex/status", "A") in got
    # null ref/status yield no triple, type triples always emitted
    assert not any(r[0] == "http://ex/t/3" and "ref" in r[1] for r in got)
    assert not any(r[0] == "http://ex/t/2" and "status" in r[1] for r in got)
    assert ("http://ex/t/2", "rdf:type", "http://ex/T") in got


def test_r2rml_brace_escape(spark):
    from dbpedia_spotlight_spark.operators.kglayout import r2rml_map

    df = spark.createDataFrame([(5,)], "k int")
    got = r2rml_map(
        df, "x:{{lit}}/{k}", [("p", "x:{k}")]
    ).collect()
    assert got[0].subj == "x:{lit}/5"


def test_mine_composition_rules_recovers_rule_and_transitivity(spark):
    from dbpedia_spotlight_spark.operators.kgquery import (
        mine_composition_rules,
    )

    rows = (
        [("a%d" % i, "p", "b%d" % i) for i in range(4)]
        + [("b%d" % i, "q", "c%d" % i) for i in range(4)]
        # head holds for 3 of the 4 body pairs -> confidence 0.75
        + [("a%d" % i, "h", "c%d" % i) for i in range(3)]
        # a transitive chain: w edges t0->t1->t2->t3 plus shortcuts
        + [("t%d" % i, "w", "t%d" % (i + 1)) for i in range(3)]
        + [("t0", "w", "t2"), ("t1", "w", "t3")]
    )
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r.head_pred, r.body_pred1, r.body_pred2): (r.support, r.confidence)
        for r in mine_composition_rules(t, min_support=2).collect()
    }
    assert got[("h", "p", "q")] == (3, 0.75)
    # transitivity of w: distinct body pairs (t0,t2),(t0,t3),(t1,t3),
    # of which (t0,t2) and (t1,t3) are asserted -> 2/3
    assert got[("w", "w", "w")] == (2, 0.666667)


def test_mine_composition_rules_excludes_types(spark):
    from dbpedia_spotlight_spark.operators.kgquery import (
        mine_composition_rules,
    )

    rows = [
        ("a", "rdf:type", "T"), ("T", "rdf:type", "Meta"),
        ("a", "p", "b"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    assert mine_composition_rules(t, min_support=1).count() == 0


def test_wup_similarity_tree(spark):
    from dbpedia_spotlight_spark.operators.kgquery import wup_similarity

    sub = spark.createDataFrame(
        [("cat", "mammal"), ("dog", "mammal"), ("mammal", "animal"),
         ("snake", "reptile"), ("reptile", "animal")],
        "sub string, sup string",
    )
    pairs = spark.createDataFrame(
        [("cat", "dog"), ("cat", "snake"), ("cat", "mammal")],
        "a string, b string",
    )
    got = {(r.a, r.b): (r.lca, r.wup) for r in wup_similarity(sub, pairs).collect()}
    # depths: animal 1, mammal/reptile 2, leaves 3
    assert got[("cat", "dog")] == ("mammal", round(2 * 2 / 6, 6))
    assert got[("cat", "snake")] == ("animal", round(2 * 1 / 6, 6))
    assert got[("cat", "mammal")] == ("mammal", round(2 * 2 / 5, 6))


def test_sparql_strbefore_strafter_spec_semantics(spark):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    t = spark.createDataFrame(
        [("s", "p", "abc")], "subj string, pred string, obj string"
    )
    q = (
        "SELECT ?o ?b1 ?b2 ?a1 ?a2 WHERE { ?s <p> ?o . "
        "BIND(STRBEFORE(?o, 'b') AS ?b1) "
        "BIND(STRBEFORE(?o, '') AS ?b2) "
        "BIND(STRAFTER(?o, 'b') AS ?a1) "
        "BIND(STRAFTER(?o, '') AS ?a2) }"
    )
    r = sparql_select(t, q).first()
    # SPARQL 17.4.3.3/4: strbefore('abc','')='' but strafter('abc','')='abc'
    assert (r.b1, r.b2, r.a1, r.a2) == ("a", "", "c", "abc")


def test_sparql_concat_if_coalesce_round(spark):
    from dbpedia_spotlight_spark.operators.kgquery import sparql_select

    t = spark.createDataFrame(
        [("s", "p", "x"), ("t", "p", "yy")],
        "subj string, pred string, obj string",
    )
    q = (
        "SELECT ?s ?v WHERE { ?s <p> ?o . "
        "BIND(IF(STRLEN(?o) > 1, CONCAT(?o, '!'), UCASE(?o)) AS ?v) }"
    )
    got = {r.s: r.v for r in sparql_select(t, q).collect()}
    assert got == {"s": "X", "t": "yy!"}


def test_characteristic_sets_signatures(spark):
    from dbpedia_spotlight_spark.operators.kglayout import characteristic_sets

    rows = [
        ("s1", "name", "a"),
        ("s1", "age", "1"),
        ("s2", "age", "2"),
        ("s2", "name", "b"),
        ("s2", "name", "c"),  # extra triple, same CS as s1
        ("s3", "name", "d"),
        ("s4", "rdf:type", "T"),
        ("s4", "name", "e"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        r.cs: (r.n_preds, r.n_subjects, r.n_triples)
        for r in characteristic_sets(t, type_pred="rdf:type").collect()
    }
    assert got == {
        "age,name": (2, 2, 5),
        "name": (1, 1, 1),
        "name,rdf:type": (2, 1, 2),
    }
    # excluding rdf:type folds s4 into the {name} signature
    got2 = {
        r.cs: r.n_subjects
        for r in characteristic_sets(
            t, type_pred="rdf:type", include_types=False
        ).collect()
    }
    assert got2 == {"age,name": 2, "name": 2}


def test_ic_similarity_resnik_lin(spark):
    import math

    from dbpedia_spotlight_spark.operators.kgquery import ic_similarity

    sub = spark.createDataFrame(
        [("a", "m"), ("b", "m"), ("m", "root"), ("c", "root")],
        "sub string, sup string",
    )
    inst = spark.createDataFrame(
        [("i1", "a"), ("i2", "b"), ("i3", "c"), ("i4", "c")],
        "inst string, cls string",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "a string, b string"
    )
    got = {
        (r.a, r.b): (r.mica, r.resnik, r.lin)
        for r in ic_similarity(sub, inst, pairs).collect()
    }
    # IC: a,b = -ln(1/4); m = -ln(2/4); c = -ln(2/4); root = 0
    ic1 = -math.log(1 / 4)
    icm = -math.log(2 / 4)
    mica_ab, resnik_ab, lin_ab = got[("a", "b")]
    assert mica_ab == "m"
    assert resnik_ab == round(icm, 6)
    assert lin_ab == round(2 * icm / (2 * ic1), 6)
    mica_ac, resnik_ac, lin_ac = got[("a", "c")]
    assert mica_ac == "root"
    assert resnik_ac == 0.0 and lin_ac == 0.0


def test_shortest_path_trace_min_parent(spark):
    from dbpedia_spotlight_spark.operators.graph import shortest_path_trace

    # s -> a, s -> b, {a,b} -> t : t's parent is min("a","b") = "a"
    edges = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("a", "t"), ("b", "t"), ("t", "u")],
        "src string, dst string",
    )
    sources = spark.createDataFrame([("s",)], ["source"])
    got = {
        r.node: (r.dist, r.path)
        for r in shortest_path_trace(edges, sources).collect()
    }
    assert got == {
        "s": (0, "s"),
        "a": (1, "s/a"),
        "b": (1, "s/b"),
        "t": (2, "s/a/t"),
        "u": (3, "s/a/t/u"),
    }


def test_equi_depth_histogram_buckets(spark):
    from dbpedia_spotlight_spark.operators.kglayout import equi_depth_histogram

    t = spark.createDataFrame(
        [("e%d" % i, "age", str(i % 10)) for i in range(40)]
        + [("e1", "age", "junk"), ("e1", "name", "bob")],
        "subj string, pred string, obj string",
    )
    got = sorted(map(tuple, equi_depth_histogram(t, num_buckets=4).collect()))
    # 40 numeric values 0..9 x4 -> 4 buckets of 10; junk and non-numeric
    # preds dropped
    assert got == [
        ("age", 1, 0.0, 2.0, 10),
        ("age", 2, 2.0, 4.0, 10),
        ("age", 3, 5.0, 7.0, 10),
        ("age", 4, 7.0, 9.0, 10),
    ]


def test_completeness_score_expected_props(spark):
    from dbpedia_spotlight_spark.operators.kglayout import completeness_score

    rows = (
        [("e%d" % i, "rdf:type", "T") for i in range(4)]
        + [("e%d" % i, "name", "n") for i in range(4)]      # 100% -> expected
        + [("e%d" % i, "age", "1") for i in range(2)]        # 50% -> expected
        + [("e0", "rare", "r")]                              # 25% -> not
        + [("u", "rdf:type", "Empty")]                       # class w/o props
    )
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r.inst, r.cls): (r.n_expected, r.n_present, r.completeness)
        for r in completeness_score(t, type_pred="rdf:type").collect()
    }
    assert got[("e0", "T")] == (2, 2, 1.0)
    assert got[("e2", "T")] == (2, 1, 0.5)
    assert got[("u", "Empty")] == (0, 0, 1.0)


def test_taxonomy_profile_depths(spark):
    from dbpedia_spotlight_spark.operators.kglayout import taxonomy_profile

    sub = spark.createDataFrame(
        [("a", "m"), ("b", "m"), ("m", "root"), ("c", "root"), ("b", "c")],
        "sub string, sup string",
    )
    row = taxonomy_profile(sub).collect()[0]
    # depths: root 0, m 1, c 1, a 2, b 2 (longest chain)
    assert (row.n_classes, row.n_roots, row.n_leaves) == (5, 1, 2)
    assert row.max_depth == 2 and row.avg_depth == 1.2
    assert row.multi_parent_ratio == 0.25  # b of {a,b,m,c}


def test_bgp_view_delta_incremental(spark):
    import pytest

    from dbpedia_spotlight_spark.operators.kgquery import bgp_view_delta

    base = spark.createDataFrame(
        [("a", "in", "n1"), ("n1", "within", "r1"),
         ("b", "in", "n2"), ("n2", "within", "r2")],
        "subj string, pred string, obj string",
    )
    adds = spark.createDataFrame(
        [("c", "in", "n1"), ("n2", "within", "r9")],
        "subj string, pred string, obj string",
    )
    dels = spark.createDataFrame(
        [("n2", "within", "r2")], "subj string, pred string, obj string"
    )
    pats = [("?x", "in", "?n"), ("?n", "within", "?r")]
    got = sorted(map(tuple, bgp_view_delta(base, adds, dels, pats).collect()))
    assert got == [
        ("n1", "r1", "c", "add"),
        ("n2", "r2", "b", "del"),
        ("n2", "r9", "b", "add"),
    ]
    # irrelevant changeset -> empty delta
    noise_a = spark.createDataFrame(
        [("z", "other", "w")], "subj string, pred string, obj string"
    )
    empty = bgp_view_delta(base, noise_a, noise_a.limit(0), pats)
    assert empty.count() == 0
    with pytest.raises(ValueError):
        bgp_view_delta(base, adds, dels, [])


def test_concise_bounded_description(spark):
    from dbpedia_spotlight_spark.operators.kgquery import (
        concise_bounded_description,
    )

    tri = spark.createDataFrame(
        [("e1", "addr", "_:a"), ("_:a", "city", "Paris"),
         ("_:a", "geo", "_:g"), ("_:g", "lat", "48"),
         ("e1", "name", "E"), ("e2", "name", "X"),
         ("Paris", "country", "FR")],
        "subj string, pred string, obj string",
    )
    res = spark.createDataFrame([("e1",)], ["r"])
    got = sorted(map(tuple, concise_bounded_description(tri, res).collect()))
    assert got == [
        ("_:a", "city", "Paris"), ("_:a", "geo", "_:g"),
        ("_:g", "lat", "48"), ("e1", "addr", "_:a"), ("e1", "name", "E"),
    ]
    # bnode cycle converges (dedupe) rather than looping forever
    cyc = spark.createDataFrame(
        [("e1", "p", "_:x"), ("_:x", "q", "_:y"), ("_:y", "q", "_:x")],
        "subj string, pred string, obj string",
    )
    assert concise_bounded_description(cyc, res).count() == 3


def test_join_cardinality_check_uniform_exact(spark):
    from dbpedia_spotlight_spark.operators.kglayout import (
        join_cardinality_check,
    )

    rows = [("e%d" % i, "qa", str(float(i % 10))) for i in range(50)] + [
        ("f%d" % i, "qb", str(float(i % 7))) for i in range(35)
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    r = join_cardinality_check(t, "qa", "qb").collect()[0]
    # uniform values: the histogram estimate is exact, q-error 1.0
    assert r.est == r.true_n == 175 and r.q_error == 1.0


def test_star_cardinality_check_exact_when_uniform(spark):
    from dbpedia_spotlight_spark.operators.kglayout import (
        star_cardinality_check,
    )

    rows = []
    for i in range(30):
        rows.append(("e%d" % i, "name", "n%d" % i))
        for j in range(i % 3 + 1):
            rows.append(("e%d" % i, "tag", "t%d" % j))
        if i % 2 == 0:
            rows.append(("e%d" % i, "age", str(i)))
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    r = star_cardinality_check(t, ["name", "tag"]).collect()[0]
    # subject count from CS coverage is always exact
    assert r.n_subjects_exact == 30
    # true star size = sum of per-subject count products
    assert r.true_n == sum(1 * (i % 3 + 1) for i in range(30))
    assert r.q_error >= 1.0
    # subjects missing a query predicate never count
    r2 = star_cardinality_check(t, ["name", "age"]).collect()[0]
    assert r2.n_subjects_exact == 15 and r2.true_n == 15 and r2.q_error == 1.0


def test_winsorize_literals_clamps_unit_errors(spark):
    import pytest

    from dbpedia_spotlight_spark.operators.kglayout import winsorize_literals

    rows = [("e%d" % i, "height", str(float(150 + i))) for i in range(100)] + [
        ("bad", "height", "99999.0"), ("nn", "height", "junk"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = winsorize_literals(t)
    r = {x.subj: x for x in out.collect()}
    # the unit error clamps to the p95 band edge and is flagged
    assert r["bad"].clamped and r["bad"].clamped_value < 1000
    # non-numeric rows are excluded, mid-band values untouched
    assert "nn" not in r
    mid = r["e50"]
    assert not mid.clamped and mid.clamped_value == mid.value
    with pytest.raises(ValueError):
        winsorize_literals(t, lo_q=0.9, hi_q=0.1)


def test_functional_dependencies_pairs(spark):
    import pytest

    from dbpedia_spotlight_spark.operators.kglayout import (
        functional_dependencies,
    )

    d = spark.createDataFrame(
        [(1, "n1", "r1"), (2, "n1", "r1"), (3, "n2", "r1"), (4, "n2", "r2")],
        "id int, nation string, region string",
    )
    got = {
        (r.determinant, r.dependent): (r.n_keys, r.n_violating_keys, r.holds)
        for r in functional_dependencies(d, ["id", "nation", "region"]).collect()
    }
    assert got[("id", "nation")] == (4, 0, True)
    assert got[("nation", "region")] == (2, 1, False)  # n2 -> {r1, r2}
    assert got[("region", "nation")] == (2, 1, False)
    assert len(got) == 6
    with pytest.raises(ValueError):
        functional_dependencies(d, ["id"])


def test_sparql_describe_cbd_form(spark):
    import pytest

    from dbpedia_spotlight_spark.operators.kgquery import sparql_describe

    tri = spark.createDataFrame(
        [("e1", "addr", "_:a"), ("_:a", "city", "Paris"),
         ("e1", "name", "E"), ("e2", "name", "X")],
        "subj string, pred string, obj string",
    )
    out = sorted(map(tuple, sparql_describe(tri, "DESCRIBE <e1>").collect()))
    assert out == [("e1", "addr", "_:a"), ("e1", "name", "E")]
    cbd = sorted(
        map(tuple, sparql_describe(tri, "DESCRIBE <e1>", form="cbd").collect())
    )
    assert ("_:a", "city", "Paris") in cbd and len(cbd) == 3
    with pytest.raises(ValueError):
        sparql_describe(tri, "DESCRIBE <e1>", form="bogus")
