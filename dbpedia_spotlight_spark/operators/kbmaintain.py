"""KB maintenance operators: owl:sameAs canonicalization, snapshot
diffing, and incremental transitive-closure maintenance.

Reference parity: the reference canonicalizes URIs through the redirect
closure before any counting (WikipediaToDBpediaClosure,
index/src/main/scala/org/dbpedia/spotlight/db/WikipediaToDBpediaClosure.scala:106-116)
and DBpedia itself ships owl:sameAs interlanguage/external links that play
the same role across KBs. Redirects are a FUNCTIONAL relation (one
out-edge, pointer chase — operators/closure.py:redirect_closure);
owl:sameAs is SYMMETRIC + TRANSITIVE, so its canonical form is the
connected component of the undirected sameAs graph, not a chain end.
Snapshot diff / incremental closure cover the other maintenance half:
the reference rebuilds its model from full dumps
(index/.../CreateSpotlightModel.scala), but at 100 TB a rebuild per dump
is the bottleneck — delta maintenance is the Spark-native answer.

Spark design notes (100 TB):
- sameAs graphs are tiny next to the KB (|sameAs| << |triples|); the
  component labels come from O(log d) pointer-doubling rounds over the
  edge set only (datapipe/dedup.py:connected_components), and the
  rewrite joins the label map to the triple table twice (subj, obj) --
  two shuffle equi-joins, broadcastable when the map fits.
- kb_diff is two anti-joins on the full (subj,pred,obj) key -- one
  shuffle each, no driver state.
- transitive_closure_delta is SEMI-NAIVE evaluation: only paths that
  use at least one NEW edge are derived, so a 1% edge delta costs ~1%
  of the full-closure joins instead of a full repeated-squaring rerun.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.datapipe.dedup import connected_components

SAMEAS_PRED = "owl:sameAs"


def sameas_components(
    triples: DataFrame,
    sameas_pred: str = SAMEAS_PRED,
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve the owl:sameAs equivalence classes of a triple table.

    -> (node, canonical): one row per resource that appears in any
    sameAs triple, mapped to the lexicographically least member of its
    component (deterministic canonical pick, the convention DBpedia
    uses for its canonical-URI choice). Resources never mentioned in a
    sameAs triple are absent -- callers coalesce to the original id.
    """
    pairs = (
        triples.filter(F.col("pred") == sameas_pred)
        .select(F.col("subj").alias("a"), F.col("obj").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    return connected_components(pairs, max_iterations=max_iterations).select(
        F.col("doc_id").alias("node"), F.col("component").alias("canonical")
    )


def sameas_canonicalize(
    triples: DataFrame,
    sameas_pred: str = SAMEAS_PRED,
    max_iterations: int = 20,
    drop_sameas: bool = True,
) -> DataFrame:
    """Rewrite a KB so every owl:sameAs-equivalent resource uses one
    canonical id: subj and obj are both mapped through the component
    labels; the sameAs triples themselves are dropped by default (their
    content IS the mapping) and the result is distinct (merging ids can
    collapse previously distinct assertions -- that collapse is the
    point of the operation).

    -> (subj, pred, obj), canonicalized and deduplicated.
    """
    mapping = sameas_components(
        triples, sameas_pred=sameas_pred, max_iterations=max_iterations
    )
    body = (
        triples.filter(F.col("pred") != sameas_pred)
        if drop_sameas
        else triples
    )
    s_map = mapping.select(
        F.col("node").alias("subj"), F.col("canonical").alias("_s_canon")
    )
    o_map = mapping.select(
        F.col("node").alias("obj"), F.col("canonical").alias("_o_canon")
    )
    return (
        body.join(s_map, "subj", "left")
        .join(o_map, "obj", "left")
        .select(
            F.coalesce(F.col("_s_canon"), F.col("subj")).alias("subj"),
            F.col("pred"),
            F.coalesce(F.col("_o_canon"), F.col("obj")).alias("obj"),
        )
        .distinct()
    )


def kb_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Diff two KB snapshots (subj, pred, obj): rows only in ``new`` are
    'added', rows only in ``old`` are 'removed'. Unchanged triples emit
    nothing -- the delta is the output, sized to the change, not the KB.

    -> (subj, pred, obj, change). Two left_anti joins on the full
    triple key; each is a single hash-shuffle, and at 100 TB both sides
    prune to the join key columns only (no payload).
    """
    key = ["subj", "pred", "obj"]
    added = new.select(key).join(old.select(key), key, "left_anti").withColumn(
        "change", F.lit("added")
    )
    removed = old.select(key).join(new.select(key), key, "left_anti").withColumn(
        "change", F.lit("removed")
    )
    return added.unionByName(removed)


def transitive_closure_delta(
    closure: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Incrementally maintain a transitive closure under edge INSERTS
    (semi-naive evaluation): given the closure C of the old edge set and
    a batch of new edges E, derive exactly the pairs whose witnessing
    path uses >= 1 new edge, without re-deriving the old closure.

    Let B = C? . E . C? (pairs witnessed by a path using exactly one
    new edge, old-closure hops absorbed on BOTH sides; C? = C + id).
    The new closure is C + B + B^2 + B^3 + ... and -- because B absorbs
    C on either side (C.B and B.C are subsets of B) -- any B^k whose
    block-pair is already derivable from C collapses into a composition
    of FEWER, genuinely-new blocks. So it suffices to (1) seed with
    D = B \\ C, then (2) repeatedly square the ACCUMULATED new-pair set
    (D <- D + (D.D \\ seen)): after r rounds every B^k with k <= 2^r is
    covered. Squaring the accumulated set (not just the last round's
    increment) is what makes cross-generation compositions like B^2 . B
    reachable.

    -> the UPDATED closure (old + delta), same (src, dst) columns.

    Scale shape: each round joins the accumulated delta (sized to the
    CHANGE) to itself -- never the full closure to itself. A 1%-of-edges
    insert batch touches ~1% of the join work of a full rebuild.
    Deletes need delete-rederive (out of scope; rebuild via
    operators/closure.py:transitive_closure).
    """
    c = closure.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = new_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()

    def comp(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.alias("x")
            .join(b.alias("y"), F.col("x.dst") == F.col("y.src"))
            .select(F.col("x.src").alias("src"), F.col("y.dst").alias("dst"))
        )

    ce = comp(c, e)
    acc = (
        e.union(ce).union(comp(e, c)).union(comp(ce, c)).distinct()
        # only genuinely new pairs participate in further composition
        .join(c, ["src", "dst"], "left_anti")
        .localCheckpoint()
    )
    total = c.union(acc).distinct().localCheckpoint()
    for _ in range(max_iterations):
        if acc.limit(1).count() == 0:
            break
        fresh = (
            comp(acc, acc)
            .distinct()
            .join(total, ["src", "dst"], "left_anti")
            .localCheckpoint()
        )
        if fresh.limit(1).count() == 0:
            break
        acc = acc.union(fresh).localCheckpoint()
        total = total.union(fresh).localCheckpoint()
    else:
        raise RuntimeError(
            f"transitive_closure_delta did not converge in {max_iterations} rounds"
        )
    return total.select(F.col("src").alias(src), F.col("dst").alias(dst))


def entity_digest(triples: DataFrame) -> DataFrame:
    """Content hash of each subject's outbound neighborhood -> (subj,
    n_facts, digest): md5 over the BINARY-sorted (pred, obj) fact list
    (unit-separator joined, so no fact pair can collide with another
    by concatenation). Two snapshots agree on an entity iff digests
    match — kb_diff tells you WHICH triples changed, this tells you
    WHICH ENTITIES changed at 1/1000th the comparison payload (32 bytes
    per subject), the right granularity for shipping KB deltas between
    clusters.

    One groupBy(subj) with collect_list + array_sort + concat_ws + md5,
    all codegen; determinism comes from the sort, not task order.
    """
    fact = F.concat_ws("\x1f", F.col("pred"), F.col("obj"))
    return triples.groupBy("subj").agg(
        F.count("*").cast("long").alias("n_facts"),
        F.md5(
            F.concat_ws("\x1e", F.array_sort(F.collect_list(fact)))
        ).alias("digest"),
    )


def ifp_sameas(
    triples: DataFrame,
    functional: list[str] | None = None,
    inverse_functional: list[str] | None = None,
) -> DataFrame:
    """Infer owl:sameAs links from OWL property semantics — the ABox
    half of OWL-RL entity resolution (rules prp-fp / prp-ifp) and the
    standard LOD interlinking primitive: a FunctionalProperty admits one
    object per subject, so (s p o1) & (s p o2) entail o1 sameAs o2; an
    InverseFunctionalProperty (ISBN, homepage, IMDb id) admits one
    subject per object, so (s1 p o) & (s2 p o) entail s1 sameAs s2.
    Complements sameas_components above, which consumes ASSERTED links;
    this operator mines the implied ones from the data.

    -> (a, b, pred, rule) with a < b lexicographically, distinct;
    rule in {'functional', 'inverse_functional'}. Feed the (a, b) pairs
    (as (subj, obj) sameAs triples) into sameas_components /
    sameas_canonicalize to merge.

    Scale shape: per rule ONE groupBy on the key side (functional:
    (pred, subj); inverse-functional: (pred, obj)) emitting the group
    MIN as a hub — each extra member yields one (member, hub) pair, a
    STAR not a clique, so a dirty key shared by 10^5 subjects costs
    10^5 rows, never 10^10. The transitive closure downstream
    reconstructs the full equivalence class. No self-join anywhere.
    """
    fn = [p for p in (functional or [])]
    ifp = [p for p in (inverse_functional or [])]
    if not fn and not ifp:
        raise ValueError("ifp_sameas needs >= 1 (inverse_)functional pred")
    spark = triples.sparkSession
    parts = []
    for preds, key, val, rule in (
        (fn, "subj", "obj", "functional"),
        (ifp, "obj", "subj", "inverse_functional"),
    ):
        if not preds:
            continue
        dim = spark.createDataFrame([(p,) for p in preds], ["pred"])
        from pyspark.sql import Window

        # window-min instead of collect_set: a dirty key shared by 10^5
        # members stays 10^5 flat rows, never one 10^5-element array
        w = Window.partitionBy("pred", "_k")
        members = (
            triples.join(F.broadcast(dim), "pred")
            .select("pred", F.col(key).alias("_k"), F.col(val).alias("_v"))
            .distinct()
            .withColumn("_hub", F.min("_v").over(w))
        )
        parts.append(
            members.filter(F.col("_v") != F.col("_hub")).select(
                F.col("_hub").alias("a"),
                F.col("_v").alias("b"),
                "pred",
                F.lit(rule).alias("rule"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def truthy_statements(
    statements: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    rank_col: str = "rank",
) -> DataFrame:
    """Wikidata-style best-rank ("truthy") statement filtering: ranked
    statements carry 'preferred' / 'normal' / 'deprecated'; the truthy
    view of a (subject, predicate) group keeps the PREFERRED statements
    if any exist, else the normal ones, and always drops deprecated —
    exactly the semantics of Wikidata's wdt: truthy dump (RDF dump
    format spec §statement ranks), the flattening every KG consumer
    applies before plain-triple querying.

    One keyed window (max rank-value per (subj, pred) group) + filter —
    no join, no global window; unknown rank strings are treated as
    deprecated (dropped) rather than silently kept."""
    rv = (
        F.when(F.col(rank_col) == "preferred", F.lit(2))
        .when(F.col(rank_col) == "normal", F.lit(1))
        .otherwise(F.lit(0))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(subj, pred)
    out = (
        statements.withColumn("_rv", rv)
        .withColumn("_best", F.max("_rv").over(w))
        .filter((F.col("_rv") == F.col("_best")) & (F.col("_rv") >= 1))
        .drop("_rv", "_best")
    )
    return out
