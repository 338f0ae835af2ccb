"""SHACL-lite shape validation over a triple table — the KG-construction
QA gate (W3C SHACL core constraints, the subset that covers real KB loads:
sh:minCount, sh:maxCount, sh:class, sh:pattern, sh:datatype, sh:nodeKind,
sh:in). The reference pipeline validates its
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

    Four further SHACL core value constraints are honored when their
    column exists in ``shapes`` (all nullable — absent column ==
    all-null column, so existing shape tables keep working):

    - pattern: every value's literal content (term_value for
      ``"v"@lang`` / ``"v"^^<dt>`` forms, the raw term otherwise) must
      match the anchored-as-written regex (sh:pattern semantics).
    - datatype: every value must be a typed literal carrying exactly
      that datatype IRI (sh:datatype; plain strings only satisfy
      xsd:string, per RDF 1.1 §3.3 where simple literals ARE
      xsd:string).
    - node_kind: 'IRI' (value must not be a quoted literal form) or
      'Literal' (must be) — sh:nodeKind against the engine's string
      term convention (functions/rdfterm.py).
    - in_values: pipe-separated allowed-value list (sh:in).

    -> violations (focus, target_class, pred, constraint, expected,
    actual): empty result = conformant graph. Cardinality violations
    report counts; class violations report the offending value, one row
    per bad value (the SHACL validation-report granularity).

    Scale shape: |focus nodes per class| rows flow through ONE
    cardinality groupBy keyed (subj, pred); the value-class check is a
    left_anti join against the type table keyed on the value. Shapes
    broadcast (they are the smallest table of any KB).
    """
    def _opt(name: str):
        if name in shapes.columns:
            return F.col(name).cast("string")
        return F.lit(None).cast("string")

    sh = shapes.select(
        F.col("target_class").alias("_tc"),
        F.col("pred").alias("_p"),
        F.col("min_count").cast("long").alias("_min"),
        F.col("max_count").cast("long").alias("_max"),
        F.col("value_class").alias("_vc"),
        _opt("pattern").alias("_pat"),
        _opt("datatype").alias("_dt"),
        _opt("node_kind").alias("_nk"),
        _opt("in_values").alias("_in"),
    )
    types = triples.filter(F.col("pred") == type_pred).select(
        F.col("subj").alias("_node"), F.col("obj").alias("_cls")
    )
    focus = types.join(
        F.broadcast(sh), types["_cls"] == sh["_tc"]
    ).select(
        "_node", "_tc", "_p", "_min", "_max", "_vc",
        "_pat", "_dt", "_nk", "_in",
    )

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

    # value-term constraints (pattern / datatype / nodeKind / in) share
    # ONE focus-x-values join; each is a filter over it, so the instance
    # table is scanned once more in total, not once per constraint
    from dbpedia_spotlight_spark.functions.rdfterm import (  # noqa: PLC0415
        _DT_RE,
        _VALUE_RE,
        XSD_STRING,
    )

    RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    valcon = focus.filter(
        F.col("_pat").isNotNull()
        | F.col("_dt").isNotNull()
        | F.col("_nk").isNotNull()
        | F.col("_in").isNotNull()
    ).join(
        triples.select(
            F.col("subj").alias("_node"),
            F.col("pred").alias("_p"),
            F.col("obj").alias("_val"),
        ),
        ["_node", "_p"],
    )
    is_literal = F.col("_val").startswith('"')
    content = F.when(
        is_literal, F.regexp_extract(F.col("_val"), _VALUE_RE, 1)
    ).otherwise(F.col("_val"))
    eff_dt = (
        F.when(
            F.col("_val").rlike(_DT_RE),
            F.regexp_extract(F.col("_val"), _DT_RE, 1),
        )
        .when(F.col("_val").rlike(r'^".*"@'), F.lit(RDF_LANGSTRING))
        .when(is_literal, F.lit(XSD_STRING))
        .otherwise(F.lit(None).cast("string"))
    )

    def _viol(cond, name: str, expected):
        return valcon.filter(cond).select(
            F.col("_node").alias("focus"),
            F.col("_tc").alias("target_class"),
            F.col("_p").alias("pred"),
            F.lit(name).alias("constraint"),
            expected.alias("expected"),
            F.col("_val").alias("actual"),
        )

    pat_viol = _viol(
        F.col("_pat").isNotNull() & ~F.regexp_like(content, F.col("_pat")),
        "pattern",
        F.col("_pat"),
    )
    dt_viol = _viol(
        F.col("_dt").isNotNull()
        & ~(eff_dt.isNotNull() & (eff_dt == F.col("_dt"))),
        "datatype",
        F.col("_dt"),
    )
    nk_viol = _viol(
        F.col("_nk").isNotNull()
        & (
            ((F.col("_nk") == "IRI") & is_literal)
            | ((F.col("_nk") == "Literal") & ~is_literal)
        ),
        "nodeKind",
        F.col("_nk"),
    )
    in_viol = _viol(
        F.col("_in").isNotNull()
        & ~F.array_contains(F.split(F.col("_in"), r"\|"), F.col("_val")),
        "in",
        F.col("_in"),
    )

    return (
        min_viol.unionByName(max_viol)
        .unionByName(class_viol)
        .unionByName(pat_viol)
        .unionByName(dt_viol)
        .unionByName(nk_viol)
        .unionByName(in_viol)
        .distinct()
    )


def infer_shapes(
    triples: DataFrame,
    type_pred: str = TYPE_PRED,
    max_in_values: int = 8,
    min_support: int = 1,
) -> DataFrame:
    """MINE property shapes from instance data — the inverse of
    shacl_validate, and the step a KG built from extraction actually
    starts with: nobody hand-writes shapes for 10^4 predicates, they
    are inferred from a trusted snapshot and then enforced on the next
    build (the sheXer / RDF2Graph workflow; the reference hard-codes
    the same invariants for its model tables in
    index/.../CreateSpotlightModel.scala assertions).

    Per (target_class, pred) of any class instance carrying the
    predicate (support >= min_support focus nodes):

    - min_count: 0 when some class instance LACKS the predicate, else
      the observed per-instance minimum; max_count: observed maximum.
    - node_kind: 'Literal' when every value is a quoted-literal term,
      'IRI' when none is (functions/rdfterm.py term convention), null
      when mixed.
    - datatype: the single observed literal datatype (term_datatype:
      ^^IRI, langString for tagged, xsd:string for plain quoted) when
      uniform AND node_kind is Literal, else null.
    - in_values: '|'-joined sorted distinct values when the predicate
      ranges over <= max_in_values distinct terms (an enum candidate,
      sh:in), else null.

    Scale shape: one equi-join of the non-type scan against the type
    table on the subject (both shuffle-keyed on subj), then two
    groupBys — (class, pred, subj) for cardinalities, (class, pred)
    for the shape row. Enum candidates come from a distinct-value
    projection row_number-capped at max_in_values+1 BEFORE any
    collect, so a predicate with 10^9 distinct objects contributes at
    most k+1 rows to the array build — enum mining never materializes
    a giant set. All codegen, no UDF.
    """
    from pyspark.sql import Window
    from ..functions.rdfterm import term_datatype

    types = triples.filter(F.col("pred") == type_pred).select(
        F.col("subj").alias("inst"), F.col("obj").alias("cls")
    )
    class_sizes = types.groupBy("cls").agg(
        F.countDistinct("inst").alias("_cls_n")
    )
    props = (
        triples.filter(F.col("pred") != type_pred)
        .join(types, F.col("subj") == F.col("inst"))
        .select("cls", "pred", "subj", "obj")
    )
    per_focus = props.groupBy("cls", "pred", "subj").agg(
        F.count("*").alias("_cnt")
    )
    card = per_focus.groupBy("cls", "pred").agg(
        F.count("*").alias("_n_focus"),
        F.min("_cnt").alias("_min_present"),
        F.max("_cnt").alias("max_count"),
    )
    is_lit = F.col("obj").startswith('"')
    vals = props.groupBy("cls", "pred").agg(
        F.min(is_lit.cast("int")).alias("_all_lit"),
        F.max(is_lit.cast("int")).alias("_any_lit"),
        F.countDistinct(term_datatype(F.col("obj"))).alias("_n_dt"),
        F.min(term_datatype(F.col("obj"))).alias("_dt"),
    )
    dvals = props.select("cls", "pred", "obj").distinct()
    rn = F.row_number().over(
        Window.partitionBy("cls", "pred").orderBy("obj")
    )
    enum = (
        dvals.withColumn("_rn", rn)
        .filter(F.col("_rn") <= max_in_values + 1)
        .groupBy("cls", "pred")
        .agg(
            F.count("*").alias("_n_vals"),
            F.array_sort(F.collect_set("obj")).alias("_val_set"),
        )
    )
    return (
        card.join(vals, ["cls", "pred"])
        .join(enum, ["cls", "pred"])
        .join(class_sizes, "cls")
        .filter(F.col("_n_focus") >= min_support)
        .select(
            F.col("cls").alias("target_class"),
            "pred",
            F.col("_n_focus").alias("n_focus"),
            F.when(F.col("_n_focus") < F.col("_cls_n"), F.lit(0))
            .otherwise(F.col("_min_present"))
            .alias("min_count"),
            "max_count",
            F.when(F.col("_all_lit") == 1, F.lit("Literal"))
            .when(F.col("_any_lit") == 0, F.lit("IRI"))
            .alias("node_kind"),
            F.when(
                (F.col("_all_lit") == 1) & (F.col("_n_dt") == 1), F.col("_dt")
            ).alias("datatype"),
            F.when(
                F.col("_n_vals") <= max_in_values,
                F.concat_ws("|", F.col("_val_set")),
            ).alias("in_values"),
        )
    )
