"""Wiki-markup KG extraction: category links, first-level infobox
properties, and interlanguage links, as (subj, pred, obj) triples.

Reference parity: the reference CONSUMES the DBpedia extraction
framework's outputs — instance_types.nt / redirects.nt /
disambiguations.nt loaded by NTripleSource and WikipediaToDBpediaClosure
(core/src/main/scala/org/dbpedia/spotlight/io/NTripleSource.scala,
index/.../db/WikipediaToDBpediaClosure.scala:60-103). These operators
re-express the PRODUCING side for the three extractor families whose
output the pipeline actually uses (types via infobox, category
membership, cross-KB sameAs), so the engine can construct its own KG
from raw wiki markup instead of depending on pre-extracted dumps.

Spark design: every extractor is a single projection over the documents
table — regexp_extract_all / split / explode, all whole-stage codegen,
zero UDF, embarrassingly parallel (no shuffle until the caller's own
distinct/groupBy). Restrictions are explicit: infobox parsing handles
FIRST-LEVEL ``{{Infobox T | k = v | ... }}`` blocks without nested
templates (nested-template values need a real parser — out of scope and
absent from the reference pipeline too, which never parses infoboxes
itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# [[Category:Name]] or [[Category:Name|sortkey]]
_CATEGORY_PAT = r"\[\[Category:([^\]\|]+)(?:\|[^\]]*)?\]\]"
# [[xx:Title]] two-letter interlanguage prefix
_INTERLANG_PAT = r"\[\[([a-z][a-z]):([^\]\|:]+)\]\]"
# {{Infobox Type | k = v | ... }} — first-level only (no nested {{ }})
_INFOBOX_PAT = r"\{\{Infobox ([^|}]+)((?:\|[^|}]*)*)\}\}"


def _page_uri(doc_id_col: str = "doc_id") -> F.Column:
    return F.concat(F.lit("page:"), F.col(doc_id_col).cast("string"))


def category_triples(
    documents_flat: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``[[Category:X]]`` membership links -> (subj=page:<doc_id>,
    pred='dcterms:subject', obj='Category:X'), spaces underscored the
    way DBpedia category URIs are. Sort keys after ``|`` are markup,
    not content, and are dropped. Distinct per page (repeating a
    category tag twice asserts one membership)."""
    cats = documents_flat.select(
        _page_uri().alias("subj"),
        F.regexp_extract_all(
            F.col(text_col), F.lit(_CATEGORY_PAT), 1
        ).alias("_cats"),
    )
    return (
        cats.select("subj", F.explode("_cats").alias("_c"))
        .select(
            "subj",
            F.lit("dcterms:subject").alias("pred"),
            F.concat(
                F.lit("Category:"),
                F.regexp_replace(F.trim(F.col("_c")), " ", "_"),
            ).alias("obj"),
        )
        .distinct()
    )


def interlanguage_sameas(
    documents_flat: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``[[xx:Title]]`` interlanguage links -> (page:<doc_id>,
    'owl:sameAs', 'xx:Title') triples, the cross-KB identity input to
    operators/kbmaintain.py:sameas_canonicalize. Distinct per page."""
    links = documents_flat.select(
        _page_uri().alias("subj"),
        F.regexp_extract_all(
            F.col(text_col), F.lit(_INTERLANG_PAT), 0
        ).alias("_ls"),
    )
    return (
        links.select("subj", F.explode("_ls").alias("_l"))
        .select(
            "subj",
            F.lit("owl:sameAs").alias("pred"),
            F.regexp_replace(
                F.regexp_replace(F.col("_l"), r"^\[\[", ""), r"\]\]$", ""
            ).alias("obj"),
        )
        .distinct()
    )


def infobox_triples(
    documents_flat: DataFrame,
    text_col: str = "text",
    prop_prefix: str = "prop:",
) -> DataFrame:
    """First-level ``{{Infobox Type | key = value | ... }}`` blocks ->
    one rdf:type triple (obj = 'Infobox:Type', spaces underscored) plus
    one (page, prop:<key>, <value>) triple per ``key = value`` cell.
    Keys are lowercased + underscored (DBpedia property-namespace
    convention); empty values and cells without '=' are skipped.

    One regexp pass extracts (type, params); the params string splits
    on '|' and explodes — per-page work is linear in markup size, no
    shuffle beyond the final distinct.
    """
    box = documents_flat.select(
        _page_uri().alias("subj"),
        F.regexp_extract(F.col(text_col), _INFOBOX_PAT, 1).alias("_type"),
        F.regexp_extract(F.col(text_col), _INFOBOX_PAT, 2).alias("_params"),
    ).filter(F.col("_type") != "")

    type_tri = box.select(
        "subj",
        F.lit("rdf:type").alias("pred"),
        F.concat(
            F.lit("Infobox:"),
            F.regexp_replace(F.trim(F.col("_type")), " ", "_"),
        ).alias("obj"),
    )

    cells = box.select(
        "subj", F.explode(F.split(F.col("_params"), r"\|")).alias("_cell")
    ).filter(F.col("_cell").contains("="))
    prop_tri = cells.select(
        "subj",
        F.concat(
            F.lit(prop_prefix),
            F.regexp_replace(
                F.lower(F.trim(F.substring_index(F.col("_cell"), "=", 1))),
                " ",
                "_",
            ),
        ).alias("pred"),
        F.trim(
            F.expr("substring(_cell, instr(_cell, '=') + 1)")
        ).alias("obj"),
    ).filter(F.col("obj") != "")

    return type_tri.unionByName(prop_tri).distinct()


def wiki_kg_triples(
    documents_flat: DataFrame, text_col: str = "text"
) -> DataFrame:
    """All three extractors unioned — the one-call 'construct a KG from
    raw wiki markup' entry point (categories + infobox + sameAs)."""
    return (
        category_triples(documents_flat, text_col)
        .unionByName(infobox_triples(documents_flat, text_col))
        .unionByName(interlanguage_sameas(documents_flat, text_col))
    )
