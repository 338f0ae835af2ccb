"""SHACL-lite shape validation over a triple table — the KG-construction
QA gate (W3C SHACL core constraints, the subset that covers real KB loads:
sh:minCount, sh:maxCount, sh:class). The reference pipeline validates its
exported model tables structurally (index/.../CreateSpotlightModel.scala
asserts table invariants at build time); for an RDF export the same role
is played by shape validation, so this engine ships it as a first-class
operator next to the datapipe table expectations
(datapipe/expectations.py — the property-graph twin).

Spark design: shapes are ontology-sized (broadcast everywhere); the
instance table is scanned once for the per-(focus, pred) cardinality
aggregate and once for the value-class anti-join. All plain joins +
groupBy — no UDF, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TYPE_PRED = "rdf:type"


def shacl_validate(
    triples: DataFrame,
    shapes: DataFrame,
    type_pred: str = TYPE_PRED,
) -> DataFrame:
    """Validate ``triples`` (subj, pred, obj) against ``shapes``
    (target_class, pred, min_count, max_count, value_class) — one row
    per property shape, null disables a constraint:

    - min_count: every focus node (instance of target_class) must have
      >= min_count values of pred (minCount 1 = required property).
    - max_count: <= max_count values.
    - value_class: every value must itself be typed value_class.

    -> violations (focus, target_class, pred, constraint, expected,
    actual): empty result = conformant graph. Cardinality violations
    report counts; class violations report the offending value, one row
    per bad value (the SHACL validation-report granularity).

    Scale shape: |focus nodes per class| rows flow through ONE
    cardinality groupBy keyed (subj, pred); the value-class check is a
    left_anti join against the type table keyed on the value. Shapes
    broadcast (they are the smallest table of any KB).
    """
    sh = shapes.select(
        F.col("target_class").alias("_tc"),
        F.col("pred").alias("_p"),
        F.col("min_count").cast("long").alias("_min"),
        F.col("max_count").cast("long").alias("_max"),
        F.col("value_class").alias("_vc"),
    )
    types = triples.filter(F.col("pred") == type_pred).select(
        F.col("subj").alias("_node"), F.col("obj").alias("_cls")
    )
    focus = types.join(
        F.broadcast(sh), types["_cls"] == sh["_tc"]
    ).select("_node", "_tc", "_p", "_min", "_max", "_vc")

    counts = triples.groupBy(
        F.col("subj").alias("_node"), F.col("pred").alias("_p")
    ).agg(F.count("*").alias("_n"))
    card = focus.join(counts, ["_node", "_p"], "left").withColumn(
        "_n", F.coalesce(F.col("_n"), F.lit(0))
    )
    min_viol = card.filter(
        F.col("_min").isNotNull() & (F.col("_n") < F.col("_min"))
    ).select(
        F.col("_node").alias("focus"),
        F.col("_tc").alias("target_class"),
        F.col("_p").alias("pred"),
        F.lit("minCount").alias("constraint"),
        F.col("_min").cast("string").alias("expected"),
        F.col("_n").cast("string").alias("actual"),
    )
    max_viol = card.filter(
        F.col("_max").isNotNull() & (F.col("_n") > F.col("_max"))
    ).select(
        F.col("_node").alias("focus"),
        F.col("_tc").alias("target_class"),
        F.col("_p").alias("pred"),
        F.lit("maxCount").alias("constraint"),
        F.col("_max").cast("string").alias("expected"),
        F.col("_n").cast("string").alias("actual"),
    )

    vals = focus.filter(F.col("_vc").isNotNull()).join(
        triples.select(
            F.col("subj").alias("_node"),
            F.col("pred").alias("_p"),
            F.col("obj").alias("_val"),
        ),
        ["_node", "_p"],
    )
    typed_ok = types.select(
        F.col("_node").alias("_val"), F.col("_cls").alias("_vc")
    )
    class_viol = vals.join(typed_ok, ["_val", "_vc"], "left_anti").select(
        F.col("_node").alias("focus"),
        F.col("_tc").alias("target_class"),
        F.col("_p").alias("pred"),
        F.lit("class").alias("constraint"),
        F.col("_vc").alias("expected"),
        F.col("_val").alias("actual"),
    )
    return min_viol.unionByName(max_viol).unionByName(class_viol).distinct()
