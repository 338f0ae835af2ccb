"""Redirect closure (chain + cycle) and candidate generation units."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.candidates import (
    generate_candidates,
    head_sf_ids,
    prune_candidates,
    resolve_surface_forms,
)
from dbpedia_spotlight_spark.operators.closure import redirect_closure, resolve_uris


def test_redirect_closure_chain_and_cycle(spark):
    redirects = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("X1", "X2"), ("X2", "X1"), ("D", "C")],
        "src_uri string, dst_uri string",
    )
    cl = {r["src_uri"]: (r["final_uri"], r["in_cycle"])
          for r in redirect_closure(redirects).collect()}
    assert cl["A"][0] == "C" and not cl["A"][1]
    assert cl["B"][0] == "C"
    assert cl["D"][0] == "C"
    # cycle members flagged, settle deterministically inside the cycle
    assert cl["X1"][1] and cl["X2"][1]
    assert cl["X1"][0] in {"X1", "X2"}


def test_resolve_uris_drops_disambiguations(spark):
    redirects = spark.createDataFrame([("A", "B")], "src_uri string, dst_uri string")
    closure = redirect_closure(redirects)
    df = spark.createDataFrame(
        [("d1", "A"), ("d2", "B"), ("d3", "Dis")], "doc_id string, uri string"
    )
    dis = spark.createDataFrame([("Dis",)], "uri string")
    out = resolve_uris(df, closure, "uri", dis).collect()
    got = {r["doc_id"]: r["uri"] for r in out}
    assert got == {"d1": "B", "d2": "B"}


def test_normalized_sf_fallback(spark, world):
    spots = spark.createDataFrame(
        [
            ("d1", 0, 0, "Apple", 0.9, "m", []),       # exact hit
            ("d1", 0, 10, "The Big Apple", 0.9, "m", []),  # only via norm
            ("d1", 0, 30, "zzz missing", 0.9, "m", []),    # no match at all
        ],
        "doc_id string, span_pos int, offset int, surface_form string, "
        "spot_prob double, spot_type string, token_stems array<string>",
    )
    out = resolve_surface_forms(spots, world.model.surface_forms).collect()
    by_sf = {r["surface_form"]: r for r in out}
    assert by_sf["Apple"]["sf_id"] is not None
    # "The Big Apple" -> norm "/big apple" -> best = "Big Apple" (80 > 20)
    big = by_sf["The Big Apple"]
    sf_dim = {r["sf_id"]: r for r in world.model.surface_forms.collect()}
    assert sf_dim[big["sf_id"]]["surface_form"] == "Big Apple"
    assert big["annotated_count"] == 80
    assert "zzz missing" not in by_sf


def test_candidate_pruning_max20(spark, world):
    spots = spark.createDataFrame(
        [("d1", 0, 0, "Apple", 0.9, "m", [])],
        "doc_id string, span_pos int, offset int, surface_form string, "
        "spot_prob double, spot_type string, token_stems array<string>",
    )
    cands = generate_candidates(
        spots, world.model.surface_forms, world.model.candidates
    )
    rows = cands.collect()
    assert len(rows) == 20  # 24 candidates pruned to MAX_CANDIDATES
    # the two real candidates (largest priors) survive
    res = {r["res_id"]: r for r in world.model.resources.collect()}
    uris = {res[r["res_id"]]["uri"] for r in rows}
    assert {"Apple_Inc", "Apple"} <= uris


def test_two_stage_head_join_same_result(spark, world):
    spots = spark.createDataFrame(
        [("d1", 0, 0, "Apple", 0.9, "m", []), ("d1", 0, 20, "Berlin", 0.9, "m", [])],
        "doc_id string, span_pos int, offset int, surface_form string, "
        "spot_prob double, spot_type string, token_stems array<string>",
    )
    heads = head_sf_ids(world.model.candidates, top_n=2)
    plain = generate_candidates(spots, world.model.surface_forms, world.model.candidates)
    staged = generate_candidates(
        spots, world.model.surface_forms, world.model.candidates, heads=heads
    )
    key = lambda r: (r["doc_id"], r["offset"], r["res_id"])
    assert sorted(map(key, plain.collect())) == sorted(map(key, staged.collect()))


def test_transitive_closure_multiparent_dag_and_cycle(spark):
    """General closure (repeated squaring) on a multi-parent DAG — which
    pointer doubling cannot represent — plus a 3-cycle: matches a Python
    BFS reachability reference, including the cycle members reaching
    themselves."""
    from dbpedia_spotlight_spark.operators.closure import transitive_closure

    edges = [
        # diamond: 1 -> {2, 3} -> 4 -> 5 (node 1 has TWO paths to 4)
        (1, 2), (1, 3), (2, 4), (3, 4), (4, 5),
        # side chain into the diamond: 6 -> 2
        (6, 2),
        # 3-cycle: 7 -> 8 -> 9 -> 7
        (7, 8), (8, 9), (9, 7),
    ]
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    expected = set()
    for start in adj:
        seen, frontier = set(), {start}
        while frontier:
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in seen:
                        seen.add(v)
                        nxt.add(v)
            frontier = nxt
        expected |= {(start, v) for v in seen}

    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        (r["src"], r["dst"])
        for r in transitive_closure(df, max_iterations=8).collect()
    }
    assert got == expected
    assert (7, 7) in got and (1, 4) in got and (6, 5) in got


def test_transitive_reduction_removes_shortcuts_keeps_tree(spark):
    """A diamond-with-shortcut DAG: 1->2, 2->4, 1->4 (redundant shortcut),
    1->3, 3->4 — reduction drops exactly (1,4); the remaining edges are
    all irreducible. A pure tree passes through unchanged, and a cycle
    raises ValueError instead of returning an arbitrary reduction."""
    from dbpedia_spotlight_spark.operators.closure import transitive_reduction

    dag = spark.createDataFrame(
        [(1, 2), (2, 4), (1, 4), (1, 3), (3, 4)], "src int, dst int"
    )
    got = sorted(
        (r["src"], r["dst"]) for r in transitive_reduction(dag).collect()
    )
    assert got == [(1, 2), (1, 3), (2, 4), (3, 4)]

    tree = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], "src int, dst int"
    )
    got_tree = sorted(
        (r["src"], r["dst"]) for r in transitive_reduction(tree).collect()
    )
    assert got_tree == [(1, 2), (1, 3), (2, 4)]

    cyc = spark.createDataFrame([(1, 2), (2, 1)], "src int, dst int")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cycle"):
        transitive_reduction(cyc)


def test_transitive_reduction_preserves_reachability_and_is_idempotent(spark):
    """Algebraic properties on 5 deterministic pseudo-random DAGs
    (edges only i -> j with i < j, so acyclicity holds by
    construction): (1) the reduction is a subset of the input;
    (2) closure(reduction(E)) == closure(E) — reachability preserved;
    (3) reduction(reduction(E)) == reduction(E) — idempotent (every
    surviving edge is irreducible)."""
    from dbpedia_spotlight_spark.operators.closure import (
        transitive_closure,
        transitive_reduction,
    )

    def pairs(df):
        return {(r["src"], r["dst"]) for r in df.collect()}

    for seed in range(5):
        edges = sorted(
            {
                (a, b)
                for k in range(30)
                for a, b in [
                    sorted(
                        (
                            (seed * 97 + k * 37) % 12,
                            (seed * 53 + k * 61 + 1) % 12,
                        )
                    )
                ]
                if a != b
            }
        )
        df = spark.createDataFrame(edges, "src int, dst int")
        red = transitive_reduction(df).cache()
        red_pairs = pairs(red)
        assert red_pairs <= set(edges)
        assert pairs(transitive_closure(red)) == pairs(transitive_closure(df))
        assert pairs(transitive_reduction(red)) == red_pairs
