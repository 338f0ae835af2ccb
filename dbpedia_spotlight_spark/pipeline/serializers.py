"""Annotation output serializers (S12 — the reference's REST response
shapes re-expressed as DataFrame columns).

Reference: rest/src/main/java/org/dbpedia/spotlight/web/rest/
OutputManager.java — makeXML (:78-111) emits an <Annotation> element with
per-occurrence <Resource> attributes in the order URI, support, types,
surfaceForm, offset, similarityScore, percentageOfSecondRank
(getResourcesXml :117-141); xml2json (:231-240, json-lib XMLSerializer)
turns those attributes into "@"-prefixed JSON keys — the well-known
Spotlight JSON API shape; makeHTML/makeRDFa (:250-268 + formatters
:278-320) splice <a> links over the original text at the mention offsets.

Spark-first shape: every serializer is a pure column expression over the
annotations table — to_json(struct(...)) for JSON, concat/escape chains
for XML, and an F.aggregate fold over the offset-sorted mention list for
the link-spliced HTML/RDFa text. No UDFs anywhere, so serialization is
whole-stage-codegen'd and embarrassingly parallel: one output string per
document, zero shuffle beyond the per-doc groupBy the REST shape itself
requires. All attribute values are strings (the reference writes CDATA
attributes via String.valueOf), which keeps the JSON/XML byte-stable and
lets a SQL oracle reproduce it exactly; callers pass similarity scores
pre-rounded for cross-engine float stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# attribute order of getResourcesXml (OutputManager.java:126-134)
RESOURCE_FIELDS = (
    "URI",
    "support",
    "types",
    "surfaceForm",
    "offset",
    "similarityScore",
    "percentageOfSecondRank",
)


def _resource_struct(round_scores: int = 4):
    """The per-occurrence payload struct, reference field order, all
    strings. Expects annotation columns uri, support, types,
    surface_form, offset, similarity_score, percentage_second_rank
    (pipeline/annotate.py ANNOTATION_COLS)."""
    return F.struct(
        F.col("uri").cast("string").alias("@URI"),
        F.coalesce(F.col("support").cast("string"), F.lit("0")).alias(
            "@support"
        ),
        F.coalesce(
            F.concat_ws(",", F.col("types")), F.lit("")
        ).alias("@types"),
        F.col("surface_form").cast("string").alias("@surfaceForm"),
        F.col("offset").cast("string").alias("@offset"),
        F.coalesce(
            F.round(F.col("similarity_score"), round_scores).cast("string"),
            F.lit("0"),
        ).alias("@similarityScore"),
        F.coalesce(
            F.round(F.col("percentage_second_rank"), round_scores).cast(
                "string"
            ),
            F.lit("0"),
        ).alias("@percentageOfSecondRank"),
    )


def annotations_to_json(
    annotations: DataFrame,
    documents_text: DataFrame,
    confidence: float = 0.1,
    support: int = 10,
    round_scores: int = 4,
) -> DataFrame:
    """-> (doc_id, json): one Spotlight-REST JSON document per doc_id —
    the xml2json shape ("@"-prefixed attribute keys, Resources array
    sorted by offset then URI).

    documents_text: (doc_id, text) — the annotated text per document
    (the reference echoes the request text back as @text)."""
    resources = (
        annotations.withColumn("_res", _resource_struct(round_scores))
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("offset").alias("_o"),
                        F.col("uri").alias("_u"),
                        F.col("_res").alias("r"),
                    )
                )
            ).alias("_sorted")
        )
        .select("doc_id", F.col("_sorted.r").alias("Resources"))
    )
    docs = documents_text.select("doc_id", F.col("text").alias("@text"))
    return (
        docs.join(resources, "doc_id", "left")
        .select(
            "doc_id",
            F.to_json(
                F.struct(
                    F.col("@text"),
                    F.lit(str(confidence)).alias("@confidence"),
                    F.lit(str(support)).alias("@support"),
                    F.coalesce(
                        F.col("Resources"),
                        F.array().cast(
                            "array<struct<`@URI`:string,`@support`:string,"
                            "`@types`:string,`@surfaceForm`:string,"
                            "`@offset`:string,`@similarityScore`:string,"
                            "`@percentageOfSecondRank`:string>>"
                        ),
                    ).alias("Resources"),
                )
            ).alias("json"),
        )
    )


def _xml_escape(col):
    """XML attribute escaping, the four characters the JAXP serializer
    escapes in CDATA attribute values (& first — order matters)."""
    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    return F.regexp_replace(out, '"', "&quot;")


def annotations_to_xml(
    annotations: DataFrame,
    documents_text: DataFrame,
    confidence: float = 0.1,
    support: int = 10,
    round_scores: int = 4,
) -> DataFrame:
    """-> (doc_id, xml): one <Annotation> document per doc_id, the makeXML
    element/attribute structure (attributes in reference order; resources
    sorted by offset then URI). Structural parity, not byte-parity with
    the JAXP pretty-printer: no XML declaration / indentation whitespace
    — those are Transformer OutputKeys, not content."""
    res_xml = F.concat(
        F.lit('<Resource URI="'),
        _xml_escape(F.col("uri").cast("string")),
        F.lit('" support="'),
        F.coalesce(F.col("support").cast("string"), F.lit("0")),
        F.lit('" types="'),
        _xml_escape(F.coalesce(F.concat_ws(",", F.col("types")), F.lit(""))),
        F.lit('" surfaceForm="'),
        _xml_escape(F.col("surface_form").cast("string")),
        F.lit('" offset="'),
        F.col("offset").cast("string"),
        F.lit('" similarityScore="'),
        F.coalesce(
            F.round(F.col("similarity_score"), round_scores).cast("string"),
            F.lit("0"),
        ),
        F.lit('" percentageOfSecondRank="'),
        F.coalesce(
            F.round(F.col("percentage_second_rank"), round_scores).cast(
                "string"
            ),
            F.lit("0"),
        ),
        F.lit('"/>'),
    )
    per_doc = (
        annotations.withColumn("_r", res_xml)
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("offset").alias("_o"),
                        F.col("uri").alias("_u"),
                        F.col("_r").alias("x"),
                    )
                )
            ).alias("_sorted")
        )
        .select(
            "doc_id",
            F.concat(
                F.lit("<Resources>"),
                F.array_join(F.col("_sorted.x"), ""),
                F.lit("</Resources>"),
            ).alias("_resources"),
        )
    )
    docs = documents_text.select("doc_id", "text")
    head = F.concat(
        F.lit('<Annotation text="'),
        _xml_escape(F.col("text")),
        F.lit(f'" confidence="{confidence}" support="{support}"'),
        F.lit(' types="" sparql="" policy="whitelist">'),
    )
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.concat(
            head, F.coalesce(F.col("_resources"), F.lit("")),
            F.lit("</Annotation>"),
        ).alias("xml"),
    )


def _spliced_text(link_fmt):
    """Fold the offset-sorted mention list over the document text,
    replacing each surface form with link_fmt(uri, sf, types) — the
    makeWebRepresentation splice (:250-268) as one F.aggregate over a
    (pos, acc) accumulator. Assumes non-overlapping mentions sorted by
    offset (the pipeline's overlap resolution guarantees this)."""
    return F.aggregate(
        F.col("_sorted"),
        F.struct(F.lit(0).alias("pos"), F.lit("").alias("acc")),
        lambda acc, m: F.struct(
            (m["_o"] + F.length(m["_sf"])).cast("int").alias("pos"),
            F.concat(
                acc["acc"],
                F.substring(
                    F.col("text"),
                    acc["pos"] + 1,
                    (m["_o"] - acc["pos"]).cast("int"),
                ),
                link_fmt(m),
            ).alias("acc"),
        ),
        lambda acc: F.concat(
            acc["acc"],
            F.substring(
                F.col("text"), acc["pos"] + 1, F.length(F.col("text"))
            ),
        ),
    )


_HTML_MAIN_PRE = (
    '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" '
    '"http://www.w3.org/TR/html4/loose.dtd">\n<html>\n<head>\n<title>'
    "DBpedia Spotlight annotation</title>\n<meta http-equiv=\"Content-type\""
    ' content="text/html;charset=UTF-8">\n</head>\n<body>\n<div>\n'
)
_HTML_MAIN_POST = "\n</div>\n</body>\n</html>"

_RDFA_MAIN_PRE = (
    '<?xml version="1.0" encoding="UTF-8"?>\n<!DOCTYPE html PUBLIC '
    '"-//W3C//DTD XHTML+RDFa 1.0//EN" '
    '"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd">\n'
    '<html xmlns="http://www.w3.org/1999/xhtml" '
    'xmlns:lexvo="http://lexvo.org/ontology#" '
    'xmlns:dbpedia="http://dbpedia.org/resource/" '
    'xmlns:dbpo="http://dbpedia.org/ontology/">\n<head>\n<title>'
    "DBpedia Spotlight annotation</title>\n</head>\n<body>\n<div>\n"
)


def _web_representation(
    annotations: DataFrame, documents_text: DataFrame, link_fmt, pre, post
) -> DataFrame:
    sorted_mentions = (
        annotations.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("offset").alias("_o"),
                        F.col("surface_form").alias("_sf"),
                        F.col("uri").alias("_u"),
                        F.col("types").alias("_t"),
                    )
                )
            ).alias("_sorted")
        )
    )
    docs = documents_text.select("doc_id", "text")
    joined = docs.join(sorted_mentions, "doc_id", "left")
    body = F.when(
        F.col("_sorted").isNull() | (F.size("_sorted") == 0),
        F.col("text"),
    ).otherwise(_spliced_text(link_fmt))
    # the reference replaces newlines AFTER splicing (:268)
    body = F.regexp_replace(body, "\n", "<br/>")
    return joined.select(
        "doc_id", F.concat(F.lit(pre), body, F.lit(post)).alias("html")
    )


def annotations_to_html(
    annotations: DataFrame, documents_text: DataFrame
) -> DataFrame:
    """-> (doc_id, html): the HTMLFormatter page — each mention becomes
    <a href="uri" title="uri" target="_blank">sf</a> (:278-291)."""

    def link(m):
        return F.concat(
            F.lit('<a href="'), m["_u"], F.lit('" title="'), m["_u"],
            F.lit('" target="_blank">'), m["_sf"], F.lit("</a>"),
        )

    return _web_representation(
        annotations, documents_text, link, _HTML_MAIN_PRE, _HTML_MAIN_POST
    )


def annotations_to_rdfa(
    annotations: DataFrame, documents_text: DataFrame
) -> DataFrame:
    """-> (doc_id, html): the RDFaFormatter page — typed mentions get
    typeof= with the MOST SPECIFIC (last) type (:293-318); untyped
    mentions get the plain about/href/title/target form."""

    def link(m):
        plain = F.concat(
            F.lit('<a about="'), m["_u"], F.lit('" href="'), m["_u"],
            F.lit('" title="'), m["_u"], F.lit('" target="_blank" >'),
            m["_sf"], F.lit("</a>"),
        )
        typed = F.concat(
            F.lit('<a about="'), m["_u"], F.lit('" typeof="'),
            F.element_at(m["_t"], -1), F.lit('" href="'), m["_u"],
            F.lit('" title="'), m["_u"], F.lit('">'), m["_sf"],
            F.lit("</a>"),
        )
        return F.when(
            m["_t"].isNull() | (F.size(m["_t"]) == 0), plain
        ).otherwise(typed)

    return _web_representation(
        annotations, documents_text, link, _RDFA_MAIN_PRE, _HTML_MAIN_POST
    )


def triples_to_jsonld(
    triples: DataFrame,
    iri_markers: tuple = ("://", "_:"),
) -> DataFrame:
    """Flattened JSON-LD (W3C JSON-LD 1.1 flattened document form,
    one node object per subject) — the serializer modern KG consumers
    ask for first, completing this engine's W3C format family
    (N-Triples / Turtle / TriG / RDF-XML / RDF-star are in
    functions/rdf.py): each subject becomes
    ``{"@id": s, "<pred>": [v1, v2, ...], ...}`` with predicates and
    values SORTED, so the serialization is canonical and
    engine-replayable. Values that look like IRIs/bnodes (contain
    "://" or start with "_:") serialize as ``{"@id": ...}`` node
    references, everything else as JSON string literals — the
    object-vs-literal rule JSON-LD needs and a triple table doesn't
    carry (callers with typed-literal terms should expand with
    functions/rdfterm first).

    -> (subj, jsonld): one row per subject. All escaping delegates to
    to_json (Jackson-correct quoting on every engine).

    Scale shape: one groupBy (subj, pred) with a sorted collect for
    the value arrays, one groupBy (subj) assembling sorted predicate
    fragments — both keyed on the subject, map-side combinable sizes,
    bounded by per-entity fact counts (the entity_digest skew
    profile). No UDF, no driver-side JSON building.
    """
    is_iri = F.col("obj").contains(iri_markers[0]) | F.col("obj").startswith(
        iri_markers[1]
    )
    # to_json(struct(obj)) -> {"obj":"..."} ; strip the wrapper to get
    # just the escaped string scalar
    scalar = F.regexp_extract(F.to_json(F.struct(F.col("obj"))), r'^\{"obj":(.*)\}$', 1)
    val = F.when(
        is_iri, F.concat(F.lit('{"@id":'), scalar, F.lit("}"))
    ).otherwise(scalar)
    key = F.regexp_extract(
        F.to_json(F.struct(F.col("pred").alias("p"))), r'^\{"p":(.*)\}$', 1
    )
    per_pred = (
        triples.select("subj", "pred", "obj")
        .distinct()
        .withColumn("_v", val)
        .groupBy("subj", "pred")
        .agg(
            F.concat(
                key,
                F.lit(":["),
                F.array_join(F.array_sort(F.collect_list("_v")), ","),
                F.lit("]"),
            ).alias("_frag")
        )
    )
    subj_key = F.regexp_extract(
        F.to_json(F.struct(F.col("subj").alias("s"))), r'^\{"s":(.*)\}$', 1
    )
    return per_pred.groupBy("subj").agg(
        F.concat(
            F.lit('{"@id":'),
            subj_key,
            F.lit(","),
            F.array_join(F.array_sort(F.collect_list("_frag")), ","),
            F.lit("}"),
        ).alias("jsonld")
    )
