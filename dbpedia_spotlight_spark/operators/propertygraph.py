"""Property-graph <-> RDF mapping — the interchange layer between this
engine's triple tables and the labeled-property-graph world (Neo4j /
GraphFrames-style node+edge tables). The reference's co-occurrence and
referent graphs are property graphs in all but name (nodes with
attributes, weighted typed edges — core/.../graph/*.scala); the standard
mapping (neosemantics / W3C RDF-star PG work) makes them round-trip:

- node row (id, label, k1=v1, ...) ->
    (id, rdf:type, label) + one (id, k, "v") data-property triple per
    non-null property column
- edge row (src, rel, dst, k=v, ...) ->
    (src, rel, dst) relationship triple; edge properties become
    RDF-star statement annotations (subj/pred/obj + ann_pred/ann_obj),
    the modern encoding for edge weights/provenance (serialize with
    functions/rdf.to_turtle_star).

Both directions are static-schema codegen projections/pivots — the
property column list is known at plan time (never a dynamic pivot, same
rationale as kglayout.property_table), so everything whole-stage-compiles
and the only shuffle is the pivot groupBy in rdf_to_pg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TYPE_PRED = "rdf:type"


def pg_to_rdf(
    nodes: DataFrame,
    edges: DataFrame,
    node_id: str = "id",
    node_label: str = "label",
    edge_src: str = "src",
    edge_dst: str = "dst",
    edge_rel: str = "rel",
) -> tuple[DataFrame, DataFrame]:
    """Map property-graph node/edge tables to RDF. Returns
    (triples, edge_annotations):

    - triples (subj, pred, obj): node types, node data properties
      (stringified, null properties skipped), and relationship triples.
    - edge_annotations (subj, pred, obj, ann_pred, ann_obj): one row
      per non-null edge property — RDF-star statement-annotation shape,
      ready for to_turtle_star or reify_statements.

    Every non-id/label node column and non-src/dst/rel edge column is a
    property. Unions of per-column projections — no shuffle at all.
    """
    node_props = [c for c in nodes.columns if c not in (node_id, node_label)]
    edge_props = [
        c for c in edges.columns if c not in (edge_src, edge_dst, edge_rel)
    ]
    parts = [
        nodes.select(
            F.col(node_id).cast("string").alias("subj"),
            F.lit(TYPE_PRED).alias("pred"),
            F.col(node_label).cast("string").alias("obj"),
        )
    ]
    for p in node_props:
        parts.append(
            nodes.filter(F.col(p).isNotNull()).select(
                F.col(node_id).cast("string").alias("subj"),
                F.lit(p).alias("pred"),
                F.col(p).cast("string").alias("obj"),
            )
        )
    parts.append(
        edges.select(
            F.col(edge_src).cast("string").alias("subj"),
            F.col(edge_rel).cast("string").alias("pred"),
            F.col(edge_dst).cast("string").alias("obj"),
        )
    )
    triples = parts[0]
    for p in parts[1:]:
        triples = triples.unionByName(p)

    ann_parts = []
    for p in edge_props:
        ann_parts.append(
            edges.filter(F.col(p).isNotNull()).select(
                F.col(edge_src).cast("string").alias("subj"),
                F.col(edge_rel).cast("string").alias("pred"),
                F.col(edge_dst).cast("string").alias("obj"),
                F.lit(p).alias("ann_pred"),
                F.col(p).cast("string").alias("ann_obj"),
            )
        )
    if ann_parts:
        ann = ann_parts[0]
        for p in ann_parts[1:]:
            ann = ann.unionByName(p)
    else:
        ann = triples.limit(0).select(
            "subj", "pred", "obj",
            F.lit(None).cast("string").alias("ann_pred"),
            F.lit(None).cast("string").alias("ann_obj"),
        )
    return triples, ann


def rdf_to_pg(
    triples: DataFrame,
    node_props: list[str],
    rel_preds: list[str],
    type_pred: str = TYPE_PRED,
) -> tuple[DataFrame, DataFrame]:
    """Inverse mapping: (subj, pred, obj) triples back to property-graph
    node and edge tables. Returns (nodes, edges):

    - nodes (id, label, <one column per node_props entry>): label = MIN
      rdf:type (deterministic for multi-typed nodes), properties pivoted
      with the same static-list groupBy as kglayout.property_table.
    - edges (src, rel, dst): the rows whose predicate is in rel_preds.

    pg_to_rdf -> rdf_to_pg round-trips exactly when each node has one
    type and single-valued properties (the property-graph contract);
    multi-valued data collapses by MIN, documented not silent.
    """
    aggs = [
        F.min(F.when(F.col("pred") == type_pred, F.col("obj"))).alias("label")
    ]
    aggs += [
        F.min(F.when(F.col("pred") == p, F.col("obj"))).alias(p)
        for p in node_props
    ]
    node_side = triples.filter(
        (F.col("pred") == type_pred) | F.col("pred").isin(node_props)
    )
    nodes = (
        node_side.groupBy(F.col("subj").alias("id"))
        .agg(*aggs)
        .filter(F.col("label").isNotNull())
    )
    edges = triples.filter(F.col("pred").isin(rel_preds)).select(
        F.col("subj").alias("src"),
        F.col("pred").alias("rel"),
        F.col("obj").alias("dst"),
    )
    return nodes, edges
