"""KG physical-design / profiling operators: schema (quotient) graph
summarization and the property-table pivot.

Reference parity: the reference keeps its KB facts in typed lookup
stores rather than a triple table (MemoryResourceStore /
MemoryCandidateMapStore, core/src/main/scala/org/dbpedia/spotlight/db/
memory/MemoryStore.scala) — i.e. it uses a PROPERTY-TABLE layout, one
array-backed column per attribute keyed by resource id. `property_table`
re-expresses that layout decision as a Spark operator over an open
triple table; `schema_summary` is the profiling step that tells you
WHICH predicates deserve columns (the quotient graph over types is the
standard RDF summarization from the property-table literature, e.g.
Wilkinson 2006 "Jena property table implementation").

Spark design: the pivot is ONE groupBy(subj) with a conditional-min
aggregate per requested predicate — map-side combinable, a single
shuffle, and downstream queries on the wide table turn triple
self-joins into column scans (the reason RDF stores do this). The
summary is a join of the edge table to the (broadcastable when small)
type table on both endpoints plus one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TYPE_PRED = "rdf:type"


def property_table(
    triples: DataFrame,
    preds: list[str],
    type_pred: str = TYPE_PRED,
) -> DataFrame:
    """Pivot a (subj, pred, obj) triple table into one wide row per
    subject: a column per predicate in ``preds`` (column name = the
    predicate with ':' -> '_', lowercased) holding the MIN object value
    (deterministic pick for multi-valued predicates — document
    cardinality with schema_summary first), plus ``n_triples`` (the
    subject's total triple count, type triples included).

    Explicit ``preds`` (never a dynamic pivot): at 100 TB a dynamic
    pivot needs a driver-side distinct over the predicate column before
    planning; the explicit list keeps the plan static and the aggregate
    map-side combinable.
    """
    if not preds:
        raise ValueError("preds must be a non-empty list of predicates")
    aggs = [
        F.min(F.when(F.col("pred") == p, F.col("obj"))).alias(
            p.replace(":", "_").lower()
        )
        for p in preds
    ]
    aggs.append(F.count("*").alias("n_triples"))
    return triples.groupBy("subj").agg(*aggs)


def schema_summary(
    triples: DataFrame,
    type_pred: str = TYPE_PRED,
    untyped: str = "untyped",
) -> DataFrame:
    """Quotient-graph summary: collapse every non-type edge onto the
    (type(subj), pred, type(obj)) triple and count instances ->
    (subj_type, pred, obj_type, n). Endpoints without a type assertion
    land in the ``untyped`` bucket; a node with MULTIPLE types
    contributes one row per type pair (the standard multigraph quotient
    — the counts answer 'how many Person-authored-Book edges exist per
    type reading').

    Literal-valued predicates summarize too (their obj side is just
    ``untyped``), which is exactly the profiling signal property_table
    needs: high-count (T, p, untyped) rows are the column candidates.
    """
    types = triples.filter(F.col("pred") == type_pred).select(
        F.col("subj").alias("_node"), F.col("obj").alias("_cls")
    )
    edges = triples.filter(F.col("pred") != type_pred)
    st = types.select(
        F.col("_node").alias("subj"), F.col("_cls").alias("_s_cls")
    )
    ot = types.select(
        F.col("_node").alias("obj"), F.col("_cls").alias("_o_cls")
    )
    return (
        edges.join(st, "subj", "left")
        .join(ot, "obj", "left")
        .groupBy(
            F.coalesce(F.col("_s_cls"), F.lit(untyped)).alias("subj_type"),
            F.col("pred"),
            F.coalesce(F.col("_o_cls"), F.lit(untyped)).alias("obj_type"),
        )
        .agg(F.count("*").alias("n"))
    )


def fact_ranking(
    triples: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Entity summarization (LinkSUM/RELIN family): keep each subject's
    k most INFORMATIVE facts, scoring a fact by its predicate's rarity
    -ln(c(pred) / total_edges) — ubiquitous predicates (type, label)
    score near zero, rare ones bubble up. Deterministic ties: (pred,
    obj) lexicographic. -> (subj, pred, obj, score, rank), rank <= k.

    Scale shape: predicate counts are a tiny dim (|distinct preds|,
    broadcast); the top-k is a row_number window PARTITIONED BY subj —
    per-entity state only, no global sort. Type triples rank like any
    other fact (callers filter first if summaries shouldn't spend
    budget on types).
    """
    from pyspark.sql import Window

    pc = triples.groupBy("pred").agg(F.count("*").alias("_pc"))
    tot = pc.agg(F.sum("_pc").cast("double").alias("_T"))
    scored = (
        triples.join(F.broadcast(pc), "pred")
        .crossJoin(F.broadcast(tot))
        .withColumn("score", -F.log(F.col("_pc") / F.col("_T")))
    )
    w = Window.partitionBy("subj").orderBy(
        F.col("score").desc(), F.col("pred"), F.col("obj")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("subj", "pred", "obj", F.round("score", 6).alias("score"), "rank")
    )


def direct_mapping(
    df: DataFrame,
    key_col: str,
    table_name: str | None = None,
) -> DataFrame:
    """W3C Direct Mapping (RDB2RDF, the zero-config half of R2RML):
    one row -> one subject `<table>/<key>=<value>`, one triple per
    non-null column `(subject, <table>#<column>, value-as-string)` plus
    an rdf:type triple `(subject, rdf:type, <table>)`. This is THE
    entry point for lifting existing warehouse tables into the KG the
    rest of this engine queries/validates/maintains.

    One stack() unpivot per row — no shuffle at all until the caller's
    own distinct/write; nulls drop per the W3C rule (absent fact, not
    an empty literal).
    """
    tn = table_name or "table"
    cols = [c for c in df.columns if c != key_col]
    if not cols:
        raise ValueError("direct_mapping needs at least one non-key column")
    subj = F.concat(
        F.lit(f"{tn}/{key_col}="), F.col(key_col).cast("string")
    )
    stack_args = ", ".join(
        f"'{tn}#{c}', cast(`{c}` as string)" for c in cols
    )
    props = df.select(
        subj.alias("subj"),
        F.expr(f"stack({len(cols)}, {stack_args})").alias("pred", "obj"),
    ).filter(F.col("obj").isNotNull())
    types = df.select(
        subj.alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.lit(tn).alias("obj"),
    )
    return props.unionByName(types)


def dangling_objects(
    triples: DataFrame,
    type_pred: str = TYPE_PRED,
) -> DataFrame:
    """Referential-integrity profile: per predicate, how many object
    values point at a resource the KB knows NOTHING about (never a
    subject of any triple)? -> (pred, n_edges, n_dangling,
    dangling_ratio rounded to 6) — the KB-construction QA signal for
    'this extractor emits references it never resolves'. Type triples
    are excluded (class IRIs are vocabulary, not instances).

    One distinct subject set (left_anti probe side), one groupBy —
    both shuffles keyed on the value id.
    """
    subjects = triples.select(F.col("subj").alias("_s")).distinct()
    edges = triples.filter(F.col("pred") != type_pred)
    flagged = edges.join(
        subjects, edges["obj"] == subjects["_s"], "left"
    ).select("pred", F.col("_s").isNull().cast("long").alias("_dang"))
    return flagged.groupBy("pred").agg(
        F.count("*").alias("n_edges"),
        F.sum("_dang").alias("n_dangling"),
        F.round(F.sum("_dang") / F.count("*"), 6).alias("dangling_ratio"),
    )


def void_stats(triples: DataFrame, type_pred: str = TYPE_PRED) -> DataFrame:
    """VoID dataset description (W3C VoID: void:triples,
    void:distinctSubjects, void:distinctObjects, void:properties,
    void:classes) as ONE aggregation row — the dataset-level statistics
    a cost-based BGP planner (operators/kgquery.py orders joins by
    selectivity) and a dataset catalog both need.

    Single pass: count + approx-free exact distincts in one agg (four
    shuffles fused by the planner into one multi-distinct aggregate).
    """
    return triples.agg(
        F.count("*").cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_subjects"),
        F.countDistinct("obj").cast("long").alias("n_objects"),
        F.countDistinct("pred").cast("long").alias("n_properties"),
        F.countDistinct(
            F.when(F.col("pred") == type_pred, F.col("obj"))
        ).cast("long").alias("n_classes"),
    )


def path_profile(
    triples: DataFrame, type_pred: str = TYPE_PRED
) -> DataFrame:
    """Predicate 2-path statistics: how many length-2 paths compose
    pred1 then pred2 through a shared middle node -> (pred1, pred2, n).
    This is the join-cardinality table for SPARQL planning: the BGP
    compiler's selectivity ordering picks which pattern pair to join
    first, and (pred1, pred2) path counts are exactly the estimate it
    needs for chain patterns ?a <p1> ?m . ?m <p2> ?b.

    One self-equi-join on the middle node + one groupBy; type triples
    excluded (class IRIs terminate paths). Per-(pred1,pred2) counts are
    map-side combinable after the join.
    """
    ed = triples.filter(F.col("pred") != type_pred)
    a = ed.select(F.col("pred").alias("pred1"), F.col("obj").alias("_m"))
    b = ed.select(F.col("subj").alias("_m"), F.col("pred").alias("pred2"))
    return a.join(b, "_m").groupBy("pred1", "pred2").agg(
        F.count("*").cast("long").alias("n")
    )


def predicate_profile(
    triples: DataFrame,
    type_pred: str = TYPE_PRED,
) -> DataFrame:
    """Per-predicate schema discovery -> one row per non-type predicate:

    - n_triples, n_subjects, n_objects (distinct)
    - functionality = n_subjects / n_triples (1.0 = functional property,
      the owl:FunctionalProperty candidates — safe property_table
      columns with no min() collapse)
    - inverse_functionality = n_objects / n_triples (1.0 = key-like,
      the owl:InverseFunctionalProperty / entity-resolution join keys)
    - dominant object datatype by simple inference: integer / decimal /
      date (yyyy-mm-dd) / string, with its share of the predicate's
      objects

    This is PARIS-style (Suchanek 2011) functionality profiling, the
    statistic ontology alignment and key discovery both start from.
    One groupBy(pred) with conditional aggregates — a single shuffle on
    the (tiny) predicate key; ratios rounded to 6 dp.
    """
    o = F.col("obj")
    dtype = (
        F.when(o.rlike(r"^-?\d+$"), F.lit("integer"))
        .when(o.rlike(r"^-?\d+\.\d+$"), F.lit("decimal"))
        .when(o.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.lit("date"))
        .otherwise(F.lit("string"))
    )
    ed = triples.filter(F.col("pred") != type_pred).withColumn("_dt", dtype)
    counts = ed.groupBy("pred", "_dt").agg(F.count("*").alias("_c"))
    from pyspark.sql import Window

    w = Window.partitionBy("pred").orderBy(
        F.col("_c").desc(), F.col("_dt")
    )
    dom = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "pred",
            F.col("_dt").alias("dominant_dtype"),
            F.col("_c").alias("_dom_c"),
        )
    )
    stats = ed.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_subjects"),
        F.countDistinct("obj").cast("long").alias("n_objects"),
    )
    return stats.join(dom, "pred").select(
        "pred",
        "n_triples",
        "n_subjects",
        "n_objects",
        F.round(F.col("n_subjects") / F.col("n_triples"), 6).alias(
            "functionality"
        ),
        F.round(F.col("n_objects") / F.col("n_triples"), 6).alias(
            "inverse_functionality"
        ),
        "dominant_dtype",
        F.round(F.col("_dom_c") / F.col("n_triples"), 6).alias(
            "dtype_share"
        ),
    )


def numeric_literal_outliers(
    triples: DataFrame,
    k: float = 3.0,
    min_values: int = 10,
) -> DataFrame:
    """Numeric-literal outlier detection per predicate — the KG-quality
    check that catches extraction unit errors (a population of 1.4e9
    next to populations in millions, a year parsed into a height field):
    Tukey fences at quartiles ± k·IQR (Tukey 1977; k=3 is the "far out"
    fence, tuned for error detection rather than tail flagging —
    Wienand & Paulheim, ESWC'14 apply exactly this family to DBpedia
    numeric facts).

    Values: the literal content (functions/rdfterm.term_value — quotes,
    tags stripped) cast to double; non-numeric objects drop out. Exact
    interpolated quartiles via percentile() — keyed by PREDICATE, whose
    cardinality is schema-sized, so the non-partial aggregate is cheap
    and the fence table broadcasts back onto the value scan.

    -> (pred, subj, value, lo, hi) for values strictly outside
    [lo, hi]; predicates with fewer than min_values numeric values are
    skipped (quartiles of 3 points flag nothing but noise).
    """
    from ..functions.rdfterm import term_value
    from pyspark.sql.functions import broadcast

    vals = triples.select(
        "pred",
        "subj",
        term_value(F.col("obj")).try_cast("double").alias("value"),
    ).filter(F.col("value").isNotNull())
    fences = (
        vals.groupBy("pred")
        .agg(
            F.count("*").alias("_n"),
            F.percentile("value", F.lit(0.25)).alias("_q1"),
            F.percentile("value", F.lit(0.75)).alias("_q3"),
        )
        .filter(F.col("_n") >= min_values)
        .select(
            "pred",
            (F.col("_q1") - k * (F.col("_q3") - F.col("_q1"))).alias("lo"),
            (F.col("_q3") + k * (F.col("_q3") - F.col("_q1"))).alias("hi"),
        )
    )
    return vals.join(broadcast(fences), "pred").filter(
        (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    )


def _template_expr(template: str) -> "F.Column":
    """Compile an R2RML string template — literal text with {column}
    placeholders — to one concat expression. '{{' / '}}' escape literal
    braces (R2RML §7.3's backslash escapes, in Python-format spelling)."""
    import re

    # escaped braces go through sentinels so the placeholder regex never
    # sees them (otherwise '{{lit}}' parses as literal '{' + column ref)
    masked = template.replace("{{", "\x00").replace("}}", "\x01")
    parts = []
    for piece in re.split(r"(\{[^{}]+\})", masked):
        if not piece:
            continue
        if piece.startswith("{") and piece.endswith("}"):
            parts.append(F.col(piece[1:-1]).cast("string"))
        else:
            parts.append(
                F.lit(piece.replace("\x00", "{").replace("\x01", "}"))
            )
    if not parts:
        raise ValueError("empty template")
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def r2rml_map(
    df: DataFrame,
    subject_template: str,
    predicate_object_maps: list[tuple[str, str]],
    rdf_type: str | None = None,
) -> DataFrame:
    """R2RML-lite customized mapping (W3C R2RML triples maps, the
    configured half that direct_mapping's zero-config rules can't
    express): mint subject IRIs from a string template over row columns
    ("http://ex/customer/{c_custkey}") and emit one triple per
    predicate-object map, where the object spec is either another
    {column} template (an IRI / object property — cross-table joins by
    minting the target's subject IRI) or a bare column name (a literal
    data property). Rows with a null in any referenced object column
    skip that triple (R2RML §11.1: NULL yields no triple); a null in
    the SUBJECT template's columns skips the whole row's triples.
    Optional rdf_type adds the class triple per row.

    One codegen projection per map, unioned — zero shuffle, the same
    scale shape as direct_mapping.
    """
    subj = _template_expr(subject_template)
    parts = []
    if rdf_type is not None:
        parts.append(
            df.select(
                subj.alias("subj"),
                F.lit("rdf:type").alias("pred"),
                F.lit(rdf_type).alias("obj"),
            )
        )
    for pred, spec in predicate_object_maps:
        obj = (
            _template_expr(spec)
            if "{" in spec
            else F.col(spec).cast("string")
        )
        parts.append(
            df.select(
                subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj")
            )
        )
    if not parts:
        raise ValueError("r2rml_map needs rdf_type or >= 1 map")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())


def characteristic_sets(
    triples: DataFrame,
    type_pred: str = TYPE_PRED,
    include_types: bool = True,
) -> DataFrame:
    """Characteristic sets (Neumann & Moerkotte, ICDE 2011): group
    subjects by their exact set of distinct predicates — the structure
    RDF-3X/engines use for join-cardinality estimation, because a
    star-join's result size over a CS is exact, not estimated. This is
    the statistics side of the layout decisions above: property_table
    wants the high-count characteristic sets as its column templates.

    -> one row per distinct predicate-set signature:
    (cs: comma-joined sorted predicate list, n_preds, n_subjects,
    n_triples — total triples carried by the CS's subjects). Ordered
    output left to the caller.

    Scale shape: ONE groupBy(subj) with collect_set(pred) + count(*)
    (map-side combinable, single shuffle over subjects), then ONE
    groupBy on the signature string (tiny: real KGs have 10^2-10^4
    distinct CSs for 10^9+ subjects — the ICDE'11 measurement). No
    self-join, no per-predicate pass.
    """
    base = triples if include_types else triples.filter(
        F.col("pred") != type_pred
    )
    per_subj = base.groupBy("subj").agg(
        F.array_join(F.sort_array(F.collect_set("pred")), ",").alias("cs"),
        F.count("*").alias("_nt"),
    )
    return per_subj.groupBy("cs").agg(
        F.size(F.split(F.first("cs"), ",")).alias("n_preds"),
        F.count("*").alias("n_subjects"),
        F.sum("_nt").alias("n_triples"),
    )


def equi_depth_histogram(
    triples: DataFrame,
    value_col: str = "obj",
    key_col: str = "pred",
    num_buckets: int = 8,
) -> DataFrame:
    """Per-predicate equi-depth histograms over numeric literal values —
    the selectivity-estimation statistic every optimizer keeps next to
    the characteristic sets above (equi-depth beats equi-width under
    the skew real KG literals always have): ntile(num_buckets) over the
    values of each key, then one rollup per bucket.

    -> (key_col, bucket 1..num_buckets, lo, hi, n). Non-numeric values
    are dropped (cast null). Bucket boundaries are tie-order
    INDEPENDENT even though ntile splits ties positionally: equal
    values straddling a boundary change which COPY lands where, never
    the (lo, hi, n) triple.

    Scale shape: one per-key window (hash-partitioned on the predicate
    — per-key sequential, the documented histogram-build cost every
    engine pays) + one groupBy. Predicates with billions of values
    should sample first; the shape stays one shuffle.
    """
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    vals = triples.select(
        F.col(key_col).alias("key"),
        F.col(value_col).try_cast("double").alias("v"),
    ).filter(F.col("v").isNotNull())
    w = Window.partitionBy("key").orderBy("v")
    return (
        vals.withColumn("bucket", F.ntile(num_buckets).over(w))
        .groupBy("key", "bucket")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("*").alias("n"),
        )
    )


def completeness_score(
    triples: DataFrame,
    type_pred: str = TYPE_PRED,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-entity KB completeness against its class's TYPICAL property
    set (the recoin/Galárraga completeness heuristic: a property is
    EXPECTED of a class when >= threshold of the class's instances
    carry it; an instance's completeness is the fraction of expected
    properties it has). The QA counterpart to infer_shapes: shapes
    mine structure, this scores each entity against it — the triage
    list a KB-completion pipeline (kbaugment) feeds from.

    -> (inst, cls, n_expected, n_present, completeness round 6), one
    row per (typed instance, class); classes with NO expected property
    score 1.0 by convention (nothing expected, nothing missing).

    Scale shape: prevalence = instances-x-properties equi-join on subj
    then ONE (cls, pred) groupBy — map-side combinable; the expected
    set is class-schema-sized and BROADCAST back; per-entity scoring is
    one semi-join + groupBy. No self-join, no window over instances.
    """
    types = triples.filter(F.col("pred") == type_pred).select(
        F.col("subj").alias("inst"), F.col("obj").alias("cls")
    ).distinct()
    props = triples.filter(F.col("pred") != type_pred).select(
        F.col("subj").alias("inst"), "pred"
    ).distinct()
    sizes = types.groupBy("cls").agg(F.count("*").alias("_n_inst"))
    prevalence = (
        types.join(props, "inst")
        .groupBy("cls", "pred")
        .agg(F.countDistinct("inst").alias("_n_with"))
        .join(sizes, "cls")
        .filter(F.col("_n_with") >= F.lit(threshold) * F.col("_n_inst"))
        .select("cls", "pred")
    )
    n_exp = prevalence.groupBy("cls").agg(F.count("*").alias("n_expected"))
    present = (
        types.join(props, "inst")
        .join(F.broadcast(prevalence), ["cls", "pred"], "left_semi")
        .groupBy("inst", "cls")
        .agg(F.count("*").alias("_n_present"))
    )
    return (
        types.join(F.broadcast(n_exp), "cls", "left")
        .join(present, ["inst", "cls"], "left")
        .select(
            "inst",
            "cls",
            F.coalesce(F.col("n_expected"), F.lit(0)).cast("long")
            .alias("n_expected"),
            F.coalesce(F.col("_n_present"), F.lit(0)).cast("long")
            .alias("n_present"),
            F.when(
                F.coalesce(F.col("n_expected"), F.lit(0)) == 0, F.lit(1.0)
            )
            .otherwise(
                F.round(
                    F.coalesce(F.col("_n_present"), F.lit(0))
                    / F.col("n_expected"),
                    6,
                )
            )
            .alias("completeness"),
        )
    )


def taxonomy_profile(
    subclass: DataFrame,
    max_iterations: int = 32,
) -> DataFrame:
    """One-row class-hierarchy profile — the ontology-QA numbers a KB
    maintainer watches across releases (a depth or tangledness jump
    usually means a bad import): class/root/leaf counts, longest-chain
    depth stats, and the multi-inheritance ratio.

    ``subclass``: (sub, sup) direct edges, DAG (cycles raise via
    non-convergence). depth(c) = longest edge-chain from any root
    (class with no superclass); roots have depth 0.

    -> (n_classes, n_roots, n_leaves, max_depth, avg_depth round 6,
    multi_parent_ratio round 6).

    Scale shape: longest-path depths via iterative relaxation — rounds
    of ONE equi-join (depth frontier x edges) + ONE groupBy-max, the
    bfs_sigma shape with per-round lineage truncation; rounds bounded
    by the hierarchy depth (tens, not corpus-sized). Everything else
    is two degree aggregations over ontology-sized tables.
    """
    e = subclass.select(
        F.col("sub").alias("sub"), F.col("sup").alias("sup")
    ).distinct()
    nodes = (
        e.select(F.col("sub").alias("node"))
        .unionByName(e.select(F.col("sup").alias("node")))
        .distinct()
    )
    roots = nodes.join(
        e.select(F.col("sub").alias("node")).distinct(), "node", "left_anti"
    )
    depth = roots.withColumn("depth", F.lit(0)).localCheckpoint()
    for _ in range(max_iterations):
        relaxed = (
            depth.join(e, depth["node"] == e["sup"])
            .select(F.col("sub").alias("node"), (F.col("depth") + 1).alias("depth"))
            .unionByName(depth)
            .groupBy("node")
            .agg(F.max("depth").alias("depth"))
            .localCheckpoint()
        )
        same = (
            relaxed.join(depth, ["node", "depth"], "left_anti").isEmpty()
            and depth.join(relaxed, ["node", "depth"], "left_anti").isEmpty()
        )
        depth = relaxed
        if same:
            break
    else:
        raise RuntimeError(
            f"taxonomy_profile did not converge in {max_iterations} rounds "
            "(cycle in the subclass graph?)"
        )
    leaves = nodes.join(
        e.select(F.col("sup").alias("node")).distinct(), "node", "left_anti"
    )
    parents = e.groupBy("sub").agg(F.count("*").alias("_np"))
    multi = parents.filter(F.col("_np") > 1).count()
    n_classes = nodes.count()
    n_sub = parents.count()
    return depth.agg(
        F.lit(n_classes).cast("long").alias("n_classes"),
        F.lit(roots.count()).cast("long").alias("n_roots"),
        F.lit(leaves.count()).cast("long").alias("n_leaves"),
        F.max("depth").cast("long").alias("max_depth"),
        F.round(F.avg("depth"), 6).alias("avg_depth"),
        F.round(
            F.lit(multi / n_sub if n_sub else 0.0).cast("double"), 6
        ).alias("multi_parent_ratio"),
    )


def join_cardinality_check(
    triples: DataFrame,
    pred_a: str,
    pred_b: str,
    bucket_width: float = 5.0,
) -> DataFrame:
    """Histogram join-cardinality estimation vs ground truth — the
    validation loop for the statistics layer (characteristic_sets /
    equi_depth_histogram): estimate |σ_{pred=a} ⋈_obj σ_{pred=b}|
    with the textbook per-bucket formula n_a·n_b / max(ndv_a, ndv_b)
    over SHARED equi-width buckets, compute the true join size, and
    report the q-error (max(est/true, true/est) — the metric the
    cardinality-estimation literature scores on).

    -> one row: (est, true_n, q_error round 4). Estimation arithmetic
    is INTEGER (counts and exact per-bucket distinct counts, floor
    division), so the estimate is bit-identical on any engine; only
    the final q-error ratio is floating point, computed from exact
    longs.

    Scale shape: two filtered scans -> ONE groupBy per side on the
    bucket id (count + exact count-distinct); the bucket-pair join is
    histogram-sized; the ground truth is one value equi-join counted
    — the thing the estimator exists to avoid, computed here exactly
    because this operator IS the accuracy check.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")

    def side(p):
        return (
            triples.filter(F.col("pred") == p)
            .select(F.col("obj").try_cast("double").alias("v"))
            .filter(F.col("v").isNotNull())
            .withColumn("b", F.floor(F.col("v") / bucket_width))
        )
    a, b = side(pred_a), side(pred_b)
    ha = a.groupBy("b").agg(
        F.count("*").alias("na"), F.countDistinct("v").alias("va")
    )
    hb = b.groupBy("b").agg(
        F.count("*").alias("nb"), F.countDistinct("v").alias("vb")
    )
    est = (
        ha.join(hb, "b")
        .select(
            F.expr("(na * nb) div greatest(va, vb)").alias("_e")
        )
        .agg(F.coalesce(F.sum("_e"), F.lit(0)).cast("long").alias("est"))
    )
    true_n = (
        a.select("v")
        .join(b.select("v"), "v")
        .agg(F.count("*").cast("long").alias("true_n"))
    )
    out = est.crossJoin(true_n)
    q = F.when(
        (F.col("est") > 0) & (F.col("true_n") > 0),
        F.greatest(
            F.col("est") / F.col("true_n"), F.col("true_n") / F.col("est")
        ),
    )
    return out.select("est", "true_n", F.round(q, 4).alias("q_error"))


def star_cardinality_check(
    triples: DataFrame,
    preds: list[str],
) -> DataFrame:
    """Characteristic-set star-join cardinality (Neumann & Moerkotte,
    ICDE 2011 — the reason engines keep CS statistics at all): for a
    star query ?s p1 ?o1 . ?s p2 ?o2 . ..., the CS table answers the
    SUBJECT count exactly (subjects whose predicate set covers the
    query), and the RESULT size as sum over covering CSs of
    n_subjects · prod_p(avg multiplicity of p in that CS) — exact when
    multiplicities are uniform within a CS (the paper's observation),
    an estimate otherwise. This operator computes the CS estimate AND
    the true star-join size so the gap is measurable (the q-error
    methodology of kg_join_card, applied to the CS layer).

    -> one row: (n_subjects_exact, est round 4, true_n, q_error
    round 4).

    Scale shape: one groupBy(subj) building the signature + the query
    predicates' per-subject counts (conditional sums — map-side
    combinable), one groupBy over the tiny CS space, one exact
    product-sum per subject for the ground truth (the quantity the
    estimator exists to avoid; computed here because this operator IS
    the accuracy check). No joins over the triple table at all.
    """
    if len(preds) < 1:
        raise ValueError("star_cardinality_check needs >= 1 predicate")
    aggs = [
        F.array_join(F.sort_array(F.collect_set("pred")), ",").alias("cs")
    ] + [
        F.sum((F.col("pred") == p).cast("long")).alias(f"_c{i}")
        for i, p in enumerate(preds)
    ]
    per_subj = triples.groupBy("subj").agg(*aggs)
    covered = per_subj
    for i in range(len(preds)):
        covered = covered.filter(F.col(f"_c{i}") > 0)
    # exact: sum over covering subjects of the count product
    prod = F.lit(1).cast("long")
    for i in range(len(preds)):
        prod = prod * F.col(f"_c{i}")
    exact = covered.agg(
        F.count("*").cast("long").alias("n_subjects_exact"),
        F.coalesce(F.sum(prod), F.lit(0)).cast("long").alias("true_n"),
    )
    # CS estimate: per covering CS, n_subjects * prod(avg multiplicity)
    per_cs = covered.groupBy("cs").agg(
        F.count("*").alias("_ns"),
        *[F.sum(f"_c{i}").alias(f"_s{i}") for i in range(len(preds))],
    )
    est_term = F.col("_ns").cast("double")
    for i in range(len(preds)):
        est_term = est_term * (F.col(f"_s{i}") / F.col("_ns"))
    est = per_cs.agg(
        F.round(F.coalesce(F.sum(est_term), F.lit(0.0)), 4).alias("est")
    )
    out = exact.crossJoin(est)
    q = F.when(
        (F.col("est") > 0) & (F.col("true_n") > 0),
        F.round(
            F.greatest(
                F.col("est") / F.col("true_n"),
                F.col("true_n") / F.col("est"),
            ),
            4,
        ),
    )
    return out.select(
        "n_subjects_exact", "est", "true_n", q.alias("q_error")
    )


def winsorize_literals(
    triples: DataFrame,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Winsorize numeric literals per predicate — the REPAIR half of
    numeric_literal_outliers (which only detects): clamp each
    predicate's values to its [lo_q, hi_q] quantile band, the standard
    robust-statistics cleanup before aggregating extracted numbers
    (one '10000x unit error' otherwise owns the predicate's mean).
    Quantiles are EXACT values at rank ceil(q·n) of the per-predicate
    order (the event_quantiles rank arithmetic — engine-deterministic,
    no interpolation).

    -> (subj, pred, value, clamped_value, clamped boolean): numeric
    rows only (non-numeric objects are not value errors, they're a
    different predicate — filtered out).

    Scale shape: one per-pred rank window over numeric rows (the
    exact-quantile cost), the two band values kept as per-pred columns
    via a conditional max — no collect; clamping is per-row codegen.
    """
    from pyspark.sql import Window

    if not (0.0 < lo_q < hi_q <= 1.0):
        raise ValueError("need 0 < lo_q < hi_q <= 1")
    vals = triples.select(
        "subj", "pred", F.col("obj").try_cast("double").alias("value")
    ).filter(F.col("value").isNotNull())
    w = Window.partitionBy("pred").orderBy(F.col("value").asc())
    ranked = vals.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy("pred"))
    )
    band = (
        ranked.groupBy("pred")
        .agg(
            F.max(
                F.when(
                    F.col("_rn") == F.ceil(F.lit(lo_q) * F.col("_n")),
                    F.col("value"),
                )
            ).alias("_lo"),
            F.max(
                F.when(
                    F.col("_rn") == F.ceil(F.lit(hi_q) * F.col("_n")),
                    F.col("value"),
                )
            ).alias("_hi"),
        )
    )
    return (
        vals.join(F.broadcast(band), "pred")
        .select(
            "subj",
            "pred",
            "value",
            F.least(F.greatest(F.col("value"), F.col("_lo")), F.col("_hi"))
            .alias("clamped_value"),
            (
                (F.col("value") < F.col("_lo"))
                | (F.col("value") > F.col("_hi"))
            ).alias("clamped"),
        )
    )


def functional_dependencies(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Pairwise functional-dependency discovery (the TANE/FDEP family
    restricted to single-column FDs — the profiling pass that decides
    direct_mapping/r2rml_map KEY choices: a column that functionally
    determines the others is a subject-key candidate; a violated
    "almost-FD" is a data-quality finding): for every ordered pair
    (A, B), does A -> B hold, and how badly is it violated?

    -> one row per ordered pair: (determinant, dependent, n_keys,
    n_violating_keys, holds): n_keys = distinct A values,
    n_violating_keys = A values mapped to >1 distinct B.

    Scale shape: per pair ONE (A) groupBy with countDistinct(B) —
    map-side combinable — unioned into a single plan; |cols|² pairs
    of aggregations over column-pruned scans (Parquet reads only the
    two columns per branch). No joins, no windows, no collect.
    """
    if len(cols) < 2:
        raise ValueError("functional_dependencies needs >= 2 columns")
    parts = []
    for a in cols:
        for b in cols:
            if a == b:
                continue
            parts.append(
                df.select(F.col(a).alias("_a"), F.col(b).alias("_b"))
                .groupBy("_a")
                .agg(F.countDistinct("_b").alias("_nb"))
                .agg(
                    F.lit(a).alias("determinant"),
                    F.lit(b).alias("dependent"),
                    F.count("*").cast("long").alias("n_keys"),
                    F.sum((F.col("_nb") > 1).cast("long")).alias(
                        "n_violating_keys"
                    ),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("holds", F.col("n_violating_keys") == 0)
