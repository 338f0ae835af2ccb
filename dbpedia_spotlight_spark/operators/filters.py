"""Annotation filters — F1-F8 in SURVEY.md §2.5, applied in the reference's
order: coreference -> support -> confidence(similarity) -> confidence(second
rank) -> type -> sparql, then sort by offset
(core/src/main/scala/org/dbpedia/spotlight/util/AnnotationFilter.scala:71-87,
chain built in rest/.../SpotlightInterface.java:159-160).

All are plain relational filters/joins — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# REST defaults (ref core/.../model/SpotlightConfiguration.java:48-53)
DEFAULT_CONFIDENCE = 0.1
DEFAULT_SUPPORT = 10

# ref ConfidenceFilter.scala:47-63 — simThresholds list from server config;
# the shipped default config uses these four (SpotlightConfiguration).
DEFAULT_SIM_THRESHOLDS = (0.0, 0.1, 0.2, 0.3)


def confidence_filter(
    df: DataFrame,
    confidence: float = DEFAULT_CONFIDENCE,
    sim_thresholds=DEFAULT_SIM_THRESHOLDS,
) -> DataFrame:
    """F1: drop if similarity_score < simThresholds[round((len-1)*confidence)]
    (ref ConfidenceFilter.scala:47-63)."""
    idx = round((len(sim_thresholds) - 1) * confidence)
    threshold = sim_thresholds[int(idx)]
    return df.filter(F.col("similarity_score") >= F.lit(threshold))


def second_rank_filter(df: DataFrame, confidence: float = DEFAULT_CONFIDENCE) -> DataFrame:
    """F2: drop if percentageOfSecondRank > 1 - confidence²
    (ref ConfidenceFilter.scala:26-45; unset values (-1) pass)."""
    limit = 1.0 - confidence * confidence
    return df.filter(F.col("percentage_second_rank") <= F.lit(limit))


def support_filter(df: DataFrame, support: int = DEFAULT_SUPPORT) -> DataFrame:
    """F3: drop if resource support <= target (ref SupportFilter.scala:26-41)."""
    return df.filter(F.col("support") > F.lit(support))


def type_filter(
    df: DataFrame,
    types: list | None,
    policy: str = "whitelist",
    untyped_passes: bool = True,
) -> DataFrame:
    """F4: whitelist/blacklist on ontology type qnames; empty list = pass-all;
    untyped resources pass a whitelist iff UNKNOWN is whitelisted
    (ref TypeFilter.scala:25-66). Expects a `types` array<string> column."""
    if not types:
        return df
    overlap = F.arrays_overlap(
        F.coalesce(F.col("types"), F.array()), F.array(*[F.lit(t) for t in types])
    )
    is_untyped = F.size(F.coalesce(F.col("types"), F.array())) == 0
    if policy == "whitelist":
        cond = overlap | (is_untyped & F.lit(untyped_passes))
        return df.filter(cond)
    return df.filter(~overlap)


def sparql_filter(df: DataFrame, uris: DataFrame, policy: str = "whitelist") -> DataFrame:
    """F5: semi/anti-join vs a provided URI set (we accept a table instead of
    calling an endpoint; ref SparqlFilter.scala)."""
    uri_df = uris.select(F.col(uris.columns[0]).alias("uri"))
    how = "left_semi" if policy == "whitelist" else "left_anti"
    return df.join(F.broadcast(uri_df), "uri", how)


def coreference_filter(df: DataFrame) -> DataFrame:
    """F6: single-word surface form whose word appears inside an earlier
    multi-word all-uppercase-initial surface form in the same doc inherits
    that occurrence's resource (ref CoreferenceFilter.scala:28-79).

    Relational form: self-join annotations on doc_id with offset_prev <
    offset, word containment + casing conditions; earliest antecedent wins.
    """
    base = df
    single = base.filter(~F.col("surface_form").contains(" ")).alias("s")
    multi = (
        base.filter(F.col("surface_form").contains(" "))
        # every word starts uppercase (ref isCoreferent :71-79)
        .filter(
            F.forall(
                F.split(F.col("surface_form"), " "),
                lambda w: w.rlike("^[A-Z]"),
            )
        )
        .alias("m")
    )
    matches = single.join(
        multi,
        (F.col("s.doc_id") == F.col("m.doc_id"))
        & (F.col("m.offset") < F.col("s.offset"))
        & (
            F.array_contains(
                F.split(F.col("m.surface_form"), " "), F.col("s.surface_form")
            )
        ),
        "inner",
    )
    w = Window.partitionBy(
        "s.doc_id", "s.span_pos", "s.offset"
    ).orderBy(F.asc("m.offset"))
    resolved = (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("s.doc_id").alias("doc_id"),
            F.col("s.span_pos").alias("span_pos"),
            F.col("s.offset").alias("offset"),
            F.col("s.surface_form").alias("surface_form"),
            # inherit the antecedent's resource + scores
            F.col("m.uri").alias("uri"),
            F.col("m.res_id").alias("res_id"),
            F.col("m.support").alias("support"),
            F.col("m.types").alias("types"),
            F.col("m.similarity_score").alias("similarity_score"),
            F.col("m.percentage_second_rank").alias("percentage_second_rank"),
            F.col("m.contextual_score").alias("contextual_score"),
        )
    )
    keep_cols = resolved.columns
    unchanged = base.select(*keep_cols).join(
        resolved.select("doc_id", "span_pos", "offset"),
        ["doc_id", "span_pos", "offset"],
        "left_anti",
    )
    return unchanged.unionByName(resolved)


def apply_default_filter_chain(
    df: DataFrame,
    confidence: float = DEFAULT_CONFIDENCE,
    support: int = DEFAULT_SUPPORT,
    types: list | None = None,
    policy: str = "whitelist",
    coreference: bool = True,
    sparql_uris: DataFrame | None = None,
) -> DataFrame:
    """The REST /annotate filter chain with its default ordering
    (ref AnnotationFilter.scala:71-87)."""
    out = df
    if coreference:
        out = coreference_filter(out)
    out = support_filter(out, support)
    out = confidence_filter(out, confidence)
    out = second_rank_filter(out, confidence)
    out = type_filter(out, types, policy)
    if sparql_uris is not None:
        out = sparql_filter(out, sparql_uris, policy)
    # The reference sorts by offset *within a request's document*
    # (AnnotationFilter.scala:85). A global orderBy would be a total sort
    # (range-partition sampling + full shuffle) across the whole corpus —
    # per-doc clustering + local sort gives the same per-document order for
    # one hash shuffle.
    return out.repartition("doc_id").sortWithinPartitions(
        "doc_id", "span_pos", "offset"
    )
