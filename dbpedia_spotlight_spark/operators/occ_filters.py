"""Occurrence filters — F7/F8 in SURVEY.md §2.5: gold-corpus / indexing-time
cleanup applied to occurrence tables `occs(doc_id, offset, surface_form,
uri, ...)` before evaluation or model building.

Reference files (index/src/main/scala/org/dbpedia/spotlight/filter/occurrences/
unless noted):
  - RedirectResolveFilter.scala:27-48 — map uri through redirect closure
    (implemented as operators.closure.resolve_uris; re-exported here).
  - UriWhitelistFilter.scala — keep only concept URIs.
  - ContextNarrowFilter.scala + core/.../string/ContextExtractor.scala:35-106
    — trim context to ±N tokens around the occurrence offset.
  - LowerCaseSurfaceFormsFilter — lowercase all sfs.
  - NumberResourcesFilter — drop occurrences whose sf is purely numeric.
  - ListPagesFilter — drop List_of_* / Liste_* target pages.
  - core/src/main/java/org/dbpedia/spotlight/spot/cooccurrence/filter/
    Filter{POS,Termsize,Pattern}.java — spot-level drops by POS blacklist,
    term size, regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.closure import resolve_uris  # noqa: F401  (F8a)


def uri_whitelist_filter(occs: DataFrame, concept_uris: DataFrame) -> DataFrame:
    wl = concept_uris.select(F.col(concept_uris.columns[0]).alias("uri")).distinct()
    return occs.join(F.broadcast(wl), "uri", "left_semi")


def lowercase_surface_forms_filter(occs: DataFrame) -> DataFrame:
    return occs.withColumn("surface_form", F.lower("surface_form"))


def number_resources_filter(occs: DataFrame) -> DataFrame:
    """Drop occurrences whose surface form is purely numeric
    (ref NumberResourcesFilter)."""
    return occs.filter(~F.col("surface_form").rlike(r"^[0-9]+([.,][0-9]+)?$"))


def list_pages_filter(occs: DataFrame) -> DataFrame:
    """Drop List_of_* / Liste_* link targets (ref ListPagesFilter)."""
    return occs.filter(~F.col("uri").rlike(r"^(List_of_|Liste_|Lists_of_)"))


def term_size_filter(
    spots: DataFrame, min_words: int = 1, max_words: int = 5
) -> DataFrame:
    """FilterTermsize twin: bound the spot word count."""
    n = F.size(F.split("surface_form", " "))
    return spots.filter((n >= min_words) & (n <= max_words))


def pattern_filter(spots: DataFrame, blacklist_regex: str) -> DataFrame:
    """FilterPattern twin: drop spots matching a regex."""
    return spots.filter(~F.col("surface_form").rlike(blacklist_regex))


def narrow_context(
    tokens: DataFrame,
    occs: DataFrame,
    window_tokens: int = 100,
) -> DataFrame:
    """ContextNarrowFilter / ContextExtractor: per occurrence, keep only the
    ±window_tokens tokens nearest its offset.

    tokens: the tokenizer output (doc_id, offset, stem, is_stopword, ...).
    occs must carry (doc_id, offset). Returns (doc_id, occ_offset, token_id
    ordinals trimmed) — one row per kept (occurrence, token) pair, ready for
    per-occurrence context scoring.

    Scale: the join is an equi-join on doc_id followed by a rank filter —
    per-doc cardinality is bounded by doc length × occurrences-per-doc; no
    cross product across documents.
    """
    w = Window.partitionBy("doc_id").orderBy("offset")
    tk = tokens.withColumn("tok_idx", F.row_number().over(w) - 1).select(
        "doc_id", F.col("offset").alias("tok_offset"), "tok_idx", "stem"
    )
    # the token index of each occurrence = index of the nearest token at or
    # before the occurrence offset
    occ_idx = (
        occs.select("doc_id", F.col("offset").alias("occ_offset"))
        .distinct()
        .join(tk, "doc_id")
        .filter(F.col("tok_offset") <= F.col("occ_offset"))
        .groupBy("doc_id", "occ_offset")
        .agg(F.max("tok_idx").alias("occ_idx"))
    )
    return (
        occ_idx.join(tk, "doc_id")
        .filter(
            (F.col("tok_idx") >= F.col("occ_idx") - window_tokens)
            & (F.col("tok_idx") <= F.col("occ_idx") + window_tokens)
        )
        .select("doc_id", "occ_offset", "tok_idx", "stem")
    )
