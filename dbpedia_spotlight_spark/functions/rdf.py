"""RDF text serializers: N-Triples and Turtle lines from a (subj, pred,
obj) DataFrame — the remaining S12 output shapes next to the NIF/JSON/
XML/HTML serializers (reference: output stack around
core/src/main/scala/org/dbpedia/spotlight/io/OutputGenerator-family and
rest/.../OutputManager.java; the reference emits NIF/XML/JSON — NT and
Turtle are the canonical at-rest forms any downstream triple store
ingests).

All pure column expressions (literal `replace` chains + concat /
collect_list — whole-stage codegen, no UDF). Literal escaping follows
N-Triples canonical form (W3C RDF 1.1 N-Triples §2.4): backslash first,
then quote, LF, CR, TAB. Objects are treated as IRIs when they match
``^https?://`` — the convention of this engine's triple tables, where
every non-literal object carries a full http(s) IRI — and as plain
literals otherwise (no datatype/lang tags; documented simplification).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IRI_RE = "^https?://"


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def nt_escape(lit) -> Column:
    """N-Triples string-literal escaping (backslash, quote, LF, CR, TAB;
    backslash first so escapes are never double-escaped)."""
    t = _col(lit)
    for raw, esc in (
        ("\\", "\\\\"),
        ('"', '\\"'),
        ("\n", "\\n"),
        ("\r", "\\r"),
        ("\t", "\\t"),
    ):
        t = F.replace(t, F.lit(raw), F.lit(esc))
    return t


def _obj_term(obj) -> Column:
    o = _col(obj)
    return F.when(
        o.rlike(_IRI_RE), F.concat(F.lit("<"), o, F.lit(">"))
    ).otherwise(F.concat(F.lit('"'), nt_escape(o), F.lit('"')))


def to_ntriples(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """One N-Triples line per triple: ``<s> <p> <o|"lit"> .`` in a single
    ``line`` column (write with df.write.text). Embarrassingly parallel —
    no shuffle, one codegen projection."""
    return triples.select(
        F.concat(
            F.lit("<"),
            _col(subj),
            F.lit("> <"),
            _col(pred),
            F.lit("> "),
            _obj_term(obj),
            F.lit(" ."),
        ).alias("line")
    )


def to_turtle(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """One Turtle block per subject: predicate-object pairs joined with
    ``;`` continuations, deterministically ordered (lexicographic on the
    serialized pair) so output is stable across cluster sizes. One
    hash-partition shuffle on subj — the same key the triple sink buckets
    by (pipeline/triples.py:write_triples), so co-partitioned upstream
    plans reuse the exchange. Returns (subj, block)."""
    po = F.concat(
        F.lit("<"), _col(pred), F.lit("> "), _obj_term(obj)
    ).alias("po")
    return (
        triples.select(_col(subj).alias("subj"), po)
        .groupBy("subj")
        .agg(F.array_sort(F.collect_list("po")).alias("pos"))
        .select(
            "subj",
            F.concat(
                F.lit("<"),
                F.col("subj"),
                F.lit("> "),
                F.array_join(F.col("pos"), " ;\n    "),
                F.lit(" ."),
            ).alias("block"),
        )
    )


def to_jsonld(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """One flattened JSON-LD node object per subject (W3C JSON-LD 1.1
    flattened document form, one node per line — the shape
    ``jsonld.flatten`` emits and entity-KB loaders ingest):
    ``{"@id": s, p1: [v, ...], p2: [...]}`` with IRI objects as
    ``{"@id": iri}`` references and literals as JSON strings. Returns
    (subj, node).

    Deterministic: values sort within a predicate, predicate entries
    sort within the node, so output is stable across cluster sizes.
    Escaping: JSON string escaping coincides with the N-Triples chain on
    the chars we escape (backslash, quote, LF, CR, TAB) — nt_escape is
    reused; predicates/subjects are IRIs in this engine's triple tables
    and pass through unescaped (documented convention, same as
    _obj_term). Two groupBys, both keyed on the subject (the second is
    map-side-combinable on the first's partitioning); pure column
    expressions, whole-stage codegen, no UDF."""
    o = _col(obj)
    val = F.when(
        o.rlike(_IRI_RE), F.concat(F.lit('{"@id":"'), o, F.lit('"}'))
    ).otherwise(F.concat(F.lit('"'), nt_escape(o), F.lit('"')))
    entries = (
        triples.select(_col(subj).alias("subj"), _col(pred).alias("pred"), val.alias("_v"))
        .groupBy("subj", "pred")
        .agg(F.array_sort(F.collect_list("_v")).alias("_vs"))
        .select(
            "subj",
            F.concat(
                F.lit('"'),
                F.col("pred"),
                F.lit('":['),
                F.array_join(F.col("_vs"), ","),
                F.lit("]"),
            ).alias("_e"),
        )
    )
    return (
        entries.groupBy("subj")
        .agg(F.array_sort(F.collect_list("_e")).alias("_es"))
        .select(
            "subj",
            F.concat(
                F.lit('{"@id":"'),
                F.col("subj"),
                F.lit('",'),
                F.array_join(F.col("_es"), ","),
                F.lit("}"),
            ).alias("node"),
        )
    )


def to_nquads(
    quads: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    graph: str = "graph",
) -> DataFrame:
    """One N-Quads line per statement: ``<s> <p> <o|"lit"> <g> .`` — the
    named-graph (RDF dataset) serialization; a NULL graph falls back to
    the default graph and serializes as a plain N-Triples line (the
    N-Quads spec makes the graph label optional). Same zero-shuffle
    projection shape as to_ntriples."""
    g = _col(graph)
    return quads.select(
        F.concat(
            F.lit("<"),
            _col(subj),
            F.lit("> <"),
            _col(pred),
            F.lit("> "),
            _obj_term(obj),
            F.when(g.isNull(), F.lit("")).otherwise(
                F.concat(F.lit(" <"), g, F.lit(">"))
            ),
            F.lit(" ."),
        ).alias("line")
    )


def to_trig(
    quads: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    graph: str = "graph",
) -> DataFrame:
    """One TriG block per named graph (W3C TriG: Turtle subject blocks
    wrapped in ``<g> { ... }``; a NULL graph is the default graph and
    emits its statements unwrapped, per the spec). Statements and their
    ``;`` predicate-object continuations are deterministically ordered,
    so output is stable across cluster sizes. Two groupBys keyed
    (graph, subj) then (graph) — the graph key is the partitioning a
    dataset sink wants anyway, so the final exchange is reused by the
    writer. Returns (graph, block); completes the serializer family
    next to to_ntriples/to_turtle/to_nquads/to_jsonld/to_rdfxml."""
    po = F.concat(
        F.lit("<"), _col(pred), F.lit("> "), _obj_term(obj)
    ).alias("po")
    stmts = (
        quads.select(
            _col(graph).alias("graph"), _col(subj).alias("subj"), po
        )
        .groupBy("graph", "subj")
        .agg(F.array_sort(F.collect_list("po")).alias("pos"))
        .select(
            "graph",
            F.concat(
                F.lit("  <"),
                F.col("subj"),
                F.lit("> "),
                F.array_join(F.col("pos"), " ;\n    "),
                F.lit(" ."),
            ).alias("_stmt"),
        )
    )
    return (
        stmts.groupBy("graph")
        .agg(F.array_sort(F.collect_list("_stmt")).alias("_ss"))
        .select(
            "graph",
            F.when(
                F.col("graph").isNull(), F.array_join(F.col("_ss"), "\n")
            )
            .otherwise(
                F.concat(
                    F.lit("<"),
                    F.col("graph"),
                    F.lit("> {\n"),
                    F.array_join(F.col("_ss"), "\n"),
                    F.lit("\n}"),
                )
            )
            .alias("block"),
        )
    )


def with_graph(
    triples: DataFrame, graph_name, graph_col: str = "graph"
) -> DataFrame:
    """Lift a triple table into a named graph: adds a constant (or
    column-derived) graph label -> quads. Datasets assemble by
    unionByName of per-source lifts — provenance tracking for
    multi-extractor KG construction (each wikiextract/direct_mapping/
    relation_extract source keeps its origin)."""
    g = F.lit(graph_name) if isinstance(graph_name, str) else graph_name
    return triples.withColumn(graph_col, g)


def xml_escape(lit) -> Column:
    """XML content/attribute escaping (& first so entities are never
    double-escaped; the same four-char set the JAXP serializer escapes,
    pipeline/serializers.py:_xml_escape)."""
    out = F.replace(_col(lit), F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return F.replace(out, F.lit('"'), F.lit("&quot;"))


_LOCAL_RE = r"([A-Za-z_][A-Za-z0-9_.-]*)$"


def to_rdfxml(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """One RDF/XML description block per subject (W3C RDF 1.1 XML
    syntax) — the last of the at-rest RDF forms next to N-Triples,
    N-Quads, Turtle and JSON-LD; the serialization the reference's own
    NTripleSource-era DBpedia dumps shipped in (reference consumes
    RDF/XML-derived dumps via io/NTripleSource; OutputManager.java emits
    per-annotation XML — this is the triple-table counterpart).

    Each predicate IRI splits into (namespace, local name) at the last
    XML-NCName boundary; the property element declares its own prefix
    inline (``<n:local xmlns:n="ns">``), so blocks are self-contained
    and need no document-level namespace negotiation — the property
    attribute trick every streaming RDF/XML writer uses. IRI objects
    become ``rdf:resource`` attributes, literals become text content
    (both XML-escaped). A predicate with no NCName tail (ends in ``/``
    or ``#``) keeps the whole IRI as namespace with local ``_p``
    (deterministic, documented fallback). Elements sort
    lexicographically inside a block, so output is stable across
    cluster sizes; one subject-keyed groupBy, pure codegen, no UDF.
    Returns (subj, block)."""
    p = _col(pred)
    local = F.regexp_extract(p, _LOCAL_RE, 1)
    local = F.when(local == "", F.lit("_p")).otherwise(local)
    ns = F.substring(
        p, F.lit(1),
        F.length(p) - F.length(F.regexp_extract(p, _LOCAL_RE, 1)),
    )
    o = _col(obj)
    elem = F.when(
        o.rlike(_IRI_RE),
        F.concat(
            F.lit("<n:"), local,
            F.lit(' xmlns:n="'), xml_escape(ns),
            F.lit('" rdf:resource="'), xml_escape(o), F.lit('"/>'),
        ),
    ).otherwise(
        F.concat(
            F.lit("<n:"), local,
            F.lit(' xmlns:n="'), xml_escape(ns), F.lit('">'),
            xml_escape(o),
            F.lit("</n:"), local, F.lit(">"),
        )
    )
    return (
        triples.select(_col(subj).alias("subj"), elem.alias("_e"))
        .groupBy("subj")
        .agg(F.array_sort(F.collect_list("_e")).alias("_es"))
        .select(
            "subj",
            F.concat(
                F.lit('<rdf:Description rdf:about="'),
                xml_escape(F.col("subj")),
                F.lit('">\n    '),
                F.array_join(F.col("_es"), "\n    "),
                F.lit("\n</rdf:Description>"),
            ).alias("block"),
        )
    )


# ---------------------------------------------------------------------------
# Blank-node canonicalization (RDF dataset canonicalization, WL-style)
# ---------------------------------------------------------------------------


def canonical_bnode_labels(
    triples: DataFrame, iterations: int = 2
) -> DataFrame:
    """Deterministic canonical labels for blank nodes — the
    color-refinement (1-WL) core of RDF dataset canonicalization
    (W3C RDF-CANON / URDNA2015's first-degree hashing generalized to
    n degrees; Hogan, "Canonical Forms for Isomorphic and Equivalent
    RDF Graphs", TOCS 2017). Two blank nodes get the same label iff
    their n-hop neighborhoods are indistinguishable, so labels are
    stable across graph serializations that renumber bnodes — the
    primitive for RDF-level dataset diff and dedup (the same role
    kg_diff/entity digests play for IRI-named nodes).

    Blank nodes are terms with the ``_:`` prefix (subject or object
    position). Ground terms (IRIs/literals) contribute their own value
    as a fixed label. Per iteration, every bnode hashes the sorted
    multiset of its edge signatures::

        out-edge (b, p, o):  "O|" + p + "|" + label(o)
        in-edge  (s, p, b):  "I|" + p + "|" + label(s)

    with md5 — chosen because it is bit-identical across engines, so an
    unrolled SQL twin reproduces labels exactly (not a security use).
    Returns (bnode, label).

    Scale shape: each iteration is two equi-joins of the bnode-incident
    edge list against the label table plus one hash aggregation
    (sort_array(collect_list) over per-node edge lists — bounded by node
    degree, the same per-group shape as the entity-digest operator); the
    Python loop only composes the bounded-depth plan. No UDF, no driver
    data.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    is_b = lambda c: F.col(c).startswith("_:")  # noqa: E731
    edges = triples.filter(is_b("subj") | is_b("obj")).select(
        "subj", "pred", "obj"
    )
    bnodes = (
        edges.filter(is_b("subj")).select(F.col("subj").alias("bnode"))
        .unionByName(
            edges.filter(is_b("obj")).select(F.col("obj").alias("bnode"))
        )
        .distinct()
    )
    labels = bnodes.select("bnode", F.lit("").alias("label"))
    for _ in range(iterations):
        ol = labels.select(
            F.col("bnode").alias("obj"), F.col("label").alias("_olab")
        )
        sl = labels.select(
            F.col("bnode").alias("subj"), F.col("label").alias("_slab")
        )
        out_sigs = (
            edges.filter(is_b("subj"))
            .join(ol, "obj", "left")
            .select(
                F.col("subj").alias("bnode"),
                F.concat(
                    F.lit("O|"), F.col("pred"), F.lit("|"),
                    F.coalesce(F.col("_olab"), F.col("obj")),
                ).alias("sig"),
            )
        )
        in_sigs = (
            edges.filter(is_b("obj"))
            .join(sl, "subj", "left")
            .select(
                F.col("obj").alias("bnode"),
                F.concat(
                    F.lit("I|"), F.col("pred"), F.lit("|"),
                    F.coalesce(F.col("_slab"), F.col("subj")),
                ).alias("sig"),
            )
        )
        labels = (
            out_sigs.unionByName(in_sigs)
            .groupBy("bnode")
            .agg(
                F.md5(
                    F.concat_ws("\n", F.sort_array(F.collect_list("sig")))
                ).alias("label")
            )
        )
    return labels


def nt_unescape(lit) -> Column:
    """Inverse of nt_escape: unwind N-Triples string escapes. Escaped
    backslashes route through a sentinel first so '\\\\n' (escaped
    backslash + n) is never misread as an escaped newline."""
    t = F.replace(_col(lit), F.lit("\\\\"), F.lit("\x00"))
    for esc, raw in (
        ("\\t", "\t"), ("\\r", "\r"), ("\\n", "\n"), ('\\"', '"'),
    ):
        t = F.replace(t, F.lit(esc), F.lit(raw))
    return F.replace(t, F.lit("\x00"), F.lit("\\"))


def to_turtle_star(
    annotated: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    ann_pred: str = "ann_pred",
    ann_obj: str = "ann_obj",
) -> DataFrame:
    """RDF-star Turtle statement annotations (W3C RDF-star CG report
    §4.2): one ``<< <s> <p> o >> <ap> ao .`` line per (fact, annotation)
    row — the modern syntax for what reify_statements encodes as four
    RDF 1.1 triples (confidence scores, provenance, extraction offsets
    attached to a fact without a blank statement node). Embarrassingly
    parallel codegen projection, no shuffle — the same scale shape as
    to_ntriples. -> single ``line`` column."""
    return annotated.select(
        F.concat(
            F.lit("<< <"),
            _col(subj),
            F.lit("> <"),
            _col(pred),
            F.lit("> "),
            _obj_term(obj),
            F.lit(" >> <"),
            _col(ann_pred),
            F.lit("> "),
            _obj_term(ann_obj),
            F.lit(" ."),
        ).alias("line")
    )


_TSTAR_TERM = r'(<[^>]*>|"(?:[^"\\]|\\.)*")'
_TSTAR_RE = (
    r"^<< <([^>]*)> <([^>]*)> "
    + _TSTAR_TERM
    + r" >> <([^>]*)> "
    + _TSTAR_TERM
    + r" \.$"
)


def parse_turtle_star(lines: DataFrame, col: str = "line") -> DataFrame:
    """Parse the Turtle-star annotation lines to_turtle_star emits back
    to (subj, pred, obj, ann_pred, ann_obj) in the engine's term
    convention (IRIs bare, literals unquoted + unescaped) — the ingest
    half of the round trip, one regexp_extract pass per field, no UDF.
    Lines that don't match the annotation grammar are dropped (they
    belong to the plain-Turtle parser)."""
    def grp(i: int) -> Column:
        return F.regexp_extract(F.col(col), _TSTAR_RE, i)

    def unterm(c: Column) -> Column:
        return F.when(
            c.startswith("<"),
            F.substring(c, 2, F.length(c) - 2),
        ).otherwise(nt_unescape(F.substring(c, 2, F.length(c) - 2)))

    return (
        lines.filter(F.col(col).rlike(_TSTAR_RE))
        .select(
            grp(1).alias("subj"),
            grp(2).alias("pred"),
            unterm(grp(3)).alias("obj"),
            grp(4).alias("ann_pred"),
            unterm(grp(5)).alias("ann_obj"),
        )
    )


def skolemize(
    triples: DataFrame,
    base: str = "https://example.org/.well-known/genid/",
    iterations: int = 2,
) -> DataFrame:
    """RDF 1.1 §3.5 skolemization: replace every blank node with a
    well-known genid IRI so graphs can be merged, diffed, and joined
    across systems without blank-node scoping headaches (bnodes are
    document-scoped; skolem IRIs are global — the spec's own answer).
    The genid is derived from canonical_bnode_labels, so ISOMORPHIC
    inputs (bnodes renumbered by a different serializer) skolemize to
    the SAME IRIs on any engine; automorphic twins (bnodes the 1-WL
    refinement provably cannot distinguish) get a deterministic
    ``~k`` suffix by (label, bnode-name) rank — stable per dataset,
    and the only part that depends on input bnode names at all.

    -> the triple table with ``_:`` terms replaced by
    ``<base><label>[~k]``; ground terms untouched. Invertible by
    unskolemize (modulo the original bnode names, which RDF semantics
    say carry no meaning anyway).

    Scale shape: the label table is bnode-sized; the suffix rank is a
    per-label window (automorphism classes are tiny); application is
    two keyed left joins (subj, obj) — no UDF, no collect.
    """
    from pyspark.sql import Window

    labels = canonical_bnode_labels(triples, iterations=iterations)
    w = Window.partitionBy("label").orderBy("bnode")
    m = labels.withColumn("_rn", F.row_number().over(w)).withColumn(
        "iri",
        F.concat(
            F.lit(base),
            F.col("label"),
            F.when(
                F.col("_rn") > 1, F.concat(F.lit("~"), F.col("_rn") - 1)
            ).otherwise(F.lit("")),
        ),
    ).select("bnode", "iri")
    ms = m.select(F.col("bnode").alias("subj"), F.col("iri").alias("_si"))
    mo = m.select(F.col("bnode").alias("obj"), F.col("iri").alias("_oi"))
    return (
        triples.join(ms, "subj", "left")
        .join(mo, "obj", "left")
        .select(
            F.coalesce(F.col("_si"), F.col("subj")).alias("subj"),
            "pred",
            F.coalesce(F.col("_oi"), F.col("obj")).alias("obj"),
        )
    )


def unskolemize(
    triples: DataFrame,
    base: str = "https://example.org/.well-known/genid/",
) -> DataFrame:
    """Inverse of skolemize: rewrite ``<base>...`` IRIs back to blank
    nodes ``_:<tail>`` (RDF 1.1 §3.5 explicitly allows systems to
    recognize their own genid IRIs and treat them as bnodes again).
    Pure per-row codegen — one startswith + substring per position."""
    n = len(base)

    def back(c):
        return F.when(
            F.col(c).startswith(base),
            F.concat(F.lit("_:"), F.substring(F.col(c), n + 1, 1 << 20)),
        ).otherwise(F.col(c))

    return triples.select(
        back("subj").alias("subj"), "pred", back("obj").alias("obj")
    )


def parse_nquads(lines: DataFrame, col: str = "line") -> DataFrame:
    """Inverse of to_nquads: N-Quads lines back to (subj, pred, obj,
    graph) — graph NULL for default-graph (plain N-Triples) lines,
    quoted literal objects unescaped with nt_unescape, IRI objects
    stripped of <>. Together with to_nquads this closes the dataset
    round trip the way parse_turtle_star does for RDF-star (and the
    driver's roundtrip queries pin). Comment / non-matching lines drop.

    One regexp per line, zero shuffle — the mirror image of the
    serializer's projection shape.
    """
    l = lines.select(F.col(col).alias("_l")).filter(
        ~F.col("_l").startswith("#")
    )
    pat = r'^<([^>]+)>\s+<([^>]+)>\s+(<[^>]+>|"(?:[^"\\]|\\.)*")(?:\s+<([^>]+)>)?\s*\.\s*$'
    parsed = l.select(
        F.regexp_extract("_l", pat, 1).alias("subj"),
        F.regexp_extract("_l", pat, 2).alias("pred"),
        F.regexp_extract("_l", pat, 3).alias("_t"),
        F.regexp_extract("_l", pat, 4).alias("_g"),
    ).filter(F.col("subj") != "")
    obj = F.when(
        F.col("_t").startswith("<"),
        F.regexp_replace(F.col("_t"), r"^<|>$", ""),
    ).otherwise(
        nt_unescape(F.regexp_replace(F.col("_t"), r'^"|"$', ""))
    )
    return parsed.select(
        "subj",
        "pred",
        obj.alias("obj"),
        F.when(F.col("_g") == "", F.lit(None)).otherwise(F.col("_g"))
        .alias("graph"),
    )
