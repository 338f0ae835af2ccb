"""Redirect transitive closure + disambiguation-page exclusion — M8/M9 in
SURVEY.md §2.6 (canonicalization; core to the north rule).

Reference: WikipediaToDBpediaClosure
(index/src/main/scala/org/dbpedia/spotlight/db/WikipediaToDBpediaClosure.scala):
  - getEndOfChainURI follows redirect chains to a fixpoint, cycle-safe via a
    visited-set (:106-116)
  - URIs in disambiguations.nt are invalid link targets (:100-103)

Spark design: iterative self-join to fixpoint. Redirect chains are short
(<10 hops on Wikipedia), so the loop runs O(log chain) pointer-doubling
iterations; each iteration is one broadcast-able equi-join. Cycle guard: a
node whose chain re-enters itself keeps its last pre-cycle target (the
reference returns the URI seen before revisiting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def redirect_closure(redirects: DataFrame, max_iterations: int = 16) -> DataFrame:
    """redirects(src_uri, dst_uri) -> closure(src_uri, final_uri).

    Pointer doubling: repeatedly rewrite dst with dst's own target until no
    row changes. A cycle member's final target settles on some member of the
    cycle (deterministic; flagged via the `in_cycle` column).
    """
    cur = redirects.select(
        F.col("src_uri"), F.col("dst_uri").alias("final_uri")
    ).withColumn("in_cycle", F.lit(False))

    for _ in range(max_iterations):
        nxt = cur.alias("a").join(
            cur.select(
                F.col("src_uri").alias("_src"),
                F.col("final_uri").alias("_next"),
            ).alias("b"),
            F.col("a.final_uri") == F.col("b._src"),
            "left",
        )
        # cycle guard: if following the chain would return to src, stop there
        stepped = nxt.select(
            F.col("a.src_uri").alias("src_uri"),
            F.when(
                F.col("b._next").isNull() | (F.col("b._next") == F.col("a.src_uri")),
                F.col("a.final_uri"),
            )
            .otherwise(F.col("b._next"))
            .alias("final_uri"),
            (
                F.col("a.in_cycle")
                | (F.coalesce(F.col("b._next"), F.lit("")) == F.col("a.src_uri"))
            ).alias("in_cycle"),
        )
        stepped = stepped.localCheckpoint(eager=True)
        changed = (
            stepped.alias("n")
            .join(cur.alias("o"), "src_uri")
            .filter(F.col("n.final_uri") != F.col("o.final_uri"))
            .limit(1)
            .count()
        )
        cur = stepped
        if changed == 0:
            break
    return cur.select("src_uri", "final_uri", "in_cycle")


def resolve_uris(
    df: DataFrame,
    closure: DataFrame,
    uri_col: str = "uri",
    disambiguations: DataFrame | None = None,
    drop_disambiguations: bool = True,
) -> DataFrame:
    """Canonicalize a URI column through the redirect closure; optionally drop
    rows whose final target is a disambiguation page (ref :100-103 throws
    NotADBpediaResourceException -> the sources skip those rows)."""
    cl = F.broadcast(
        closure.select(
            F.col("src_uri").alias("_cl_src"), F.col("final_uri").alias("_cl_dst")
        )
    )
    out = (
        df.join(cl, df[uri_col] == F.col("_cl_src"), "left")
        .withColumn(uri_col, F.coalesce(F.col("_cl_dst"), F.col(uri_col)))
        .drop("_cl_src", "_cl_dst")
    )
    if disambiguations is not None and drop_disambiguations:
        dis = disambiguations.select(F.col(disambiguations.columns[0]).alias(uri_col))
        out = out.join(F.broadcast(dis), uri_col, "left_anti")
    return out


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """General transitive closure of an arbitrary edge relation — all
    (src, dst) pairs connected by a directed path. Unlike
    `redirect_closure` (pointer doubling over a FUNCTIONAL graph: one
    out-edge per node, as Wikipedia redirects are), this handles
    multi-parent DAGs — ontology subClassOf lattices, category
    hierarchies — where a node's ancestor set is a set, not a chain.

    Algorithm: repeated squaring. R_{k+1} = R_k ∪ (R_k ∘ R_k), distinct,
    so after k rounds R_k holds every path of length ≤ 2^k: a depth-D
    hierarchy converges in ceil(log2 D) rounds — at 100 TB that is the
    difference between ~5 self-join shuffles and D naive expansion
    rounds. Each round is one equi-join on the path midpoint plus one
    distinct (both shuffles on the same key space); localCheckpoint
    truncates the lineage so round k's plan does not replay rounds
    0..k-1. Cycle-safe: the pair set is bounded, so iteration still
    reaches a fixpoint (a cycle member gains (x, x)).

    Scale note: the OUTPUT can be quadratic in pathological graphs; for
    the shallow-and-wide DAGs this materializes (class hierarchies,
    admin-region containment) |closure| ≈ |edges| · avg-depth, the
    standard ontology-closure materialization trade.

    Raises RuntimeError if not converged within max_iterations (2^20-hop
    paths — a graph this deep needs a different representation).
    """
    cur = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    cur = cur.localCheckpoint()
    n = cur.count()
    for _ in range(max_iterations):
        stepped = (
            cur.alias("a")
            .join(cur.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .union(cur)
            .distinct()
            .localCheckpoint()
        )
        n_next = stepped.count()
        cur = stepped
        if n_next == n:
            return cur.select(F.col("src").alias(src), F.col("dst").alias(dst))
        n = n_next
    raise RuntimeError(
        f"transitive_closure did not converge in {max_iterations} rounds"
    )


def transitive_reduction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Transitive REDUCTION of a DAG edge relation — the unique minimal
    edge set with the same reachability (Aho, Garey & Ullman 1972): drop
    every edge (u, v) that is implied by a longer path u -> ... -> v.
    The taxonomy-cleaning inverse of `transitive_closure`: harvested
    subClassOf / broader-than edge sets (Hearst patterns, category
    scrapes) arrive full of redundant "grandparent shortcuts", and
    downstream per-edge costs (storage, entailment, visualization) pay
    for each one.

    Algebra: for a DAG, (u, v) is redundant iff there exists w with
    edge(u, w) and closure(w, v) — i.e. a path of length >= 2. So:
    reduced = edges ANTI-JOIN (edges ∘ closure(edges)). One closure
    (log-depth repeated squaring), one equi-join on the midpoint, one
    anti-join — all keyed shuffles, no iteration beyond the closure's.

    Uniqueness of the result requires acyclicity, so a cycle is an input
    error: the closure of a cycle member contains (x, x), which is
    detected with one aggregate and raised as ValueError rather than
    silently returning one of many valid reductions.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    tc = transitive_closure(e, "src", "dst", max_iterations=max_iterations)
    n_cyclic = (
        tc.filter(F.col("src") == F.col("dst")).limit(1).count()
    )
    if n_cyclic:
        raise ValueError(
            "transitive_reduction requires a DAG; the closure contains a "
            "self-pair (cycle detected)"
        )
    two_step = (
        e.alias("e")
        .join(tc.alias("t"), F.col("e.dst") == F.col("t.src"))
        .select(F.col("e.src").alias("src"), F.col("t.dst").alias("dst"))
        .distinct()
    )
    return (
        e.join(two_step, ["src", "dst"], "left_anti")
        .select(F.col("src").alias(src), F.col("dst").alias(dst))
    )
