"""Model-building aggregations — M1-M10 in SURVEY.md §2.6: the reference's
Pig/Hadoop dataflow (pignlproc jobs invoked by bin/index_db.sh:238-258,
consumed by index/.../db/io/*.scala) re-expressed as Spark jobs.

Input: an occurrences table `occs(doc_id, span_pos, offset, surface_form,
uri)` — wikilink-style gold anchors — plus the tokens table from the same
corpus. All heavy stages are groupBy aggregations with map-side partial
combine; canonicalization (redirect closure + disambiguation exclusion)
happens before counting, matching the reference order
(index/.../db/io/DBpediaResourceSource.scala:96-119,
CandidateMapSource.scala:41-61).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.model.model_tables import SpotlightModel
from dbpedia_spotlight_spark.functions.text import normalize_surface_form_col
from dbpedia_spotlight_spark.operators.closure import redirect_closure, resolve_uris

MIN_PAIR_COUNT = 5  # ref core/.../util/CreateLexicalizations.scala:33
MIN_COOCCURRENCE_COUNT = 3  # ref index/src/main/pig/CooccurrencesCount.pig:49


def canonicalize_occurrences(
    occs: DataFrame,
    redirects: DataFrame | None,
    disambiguations: DataFrame | None,
) -> DataFrame:
    """M8+M9 applied to the link targets."""
    if redirects is None:
        return occs
    closure = redirect_closure(redirects)
    return resolve_uris(occs, closure, "uri", disambiguations)


def uri_counts(occs: DataFrame) -> DataFrame:
    """M1: per-URI occurrence count = resource support
    (consumed at DBpediaResourceSource.scala:96-119)."""
    return occs.groupBy("uri").agg(F.count("*").alias("support"))


def pair_counts(occs: DataFrame) -> DataFrame:
    """M3: per (surface form, uri) pair count = candidate map
    (consumed at CandidateMapSource.scala:41-61)."""
    return occs.groupBy("surface_form", "uri").agg(F.count("*").alias("pair_count"))


def sf_and_total_counts(occs: DataFrame, spotted_all: DataFrame | None = None) -> DataFrame:
    """M2: per surface form, annotated count (link anchors) + total count
    (raw n-gram hits over the corpus; -1 when unmeasured — ref
    SurfaceFormSource.scala:35-57).

    spotted_all: output of spotting the *full* dictionary with no threshold
    over the corpus (P8 automaton), i.e. all raw mentions."""
    annotated = occs.groupBy("surface_form").agg(
        F.count("*").alias("annotated_count")
    )
    if spotted_all is None:
        return annotated.withColumn("total_count", F.lit(-1).cast("long"))
    totals = spotted_all.groupBy("surface_form").agg(
        F.count("*").alias("total_count")
    )
    return annotated.join(totals, "surface_form", "left").withColumn(
        "total_count", F.coalesce(F.col("total_count"), F.lit(-1).cast("long"))
    )


def token_counts(tokens: DataFrame, occs: DataFrame) -> DataFrame:
    """M4: per URI, bag of stemmed context-token counts. The context of a
    link is its document's token bag (pignlproc token_counts.pig semantics:
    per-article text keyed by the article/link target)."""
    doc_uris = occs.select("doc_id", "uri").distinct()
    doc_tokens = tokens.filter(~F.col("is_stopword")).select("doc_id", "stem")
    return (
        doc_tokens.join(doc_uris, "doc_id")
        .groupBy("uri", "stem")
        .agg(F.count("*").alias("count"))
    )


def occurrences_count(occs: DataFrame) -> DataFrame:
    """M5 (OccurrencesCount.pig:38-49): per uri, count + id bag."""
    return occs.groupBy("uri").agg(
        F.count("*").alias("occ_count"),
        F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
    )


def sorted_occurrences(occs: DataFrame) -> DataFrame:
    """M7 (SortedOccurrences.pig:10-14): group by uri, collect sf bags,
    global order by uri."""
    return (
        occs.groupBy("uri")
        .agg(F.sort_array(F.collect_list("surface_form")).alias("surface_forms"))
        .orderBy("uri")
    )


def cooccurrence_edges(
    occs: DataFrame, min_count: int = MIN_COOCCURRENCE_COUNT
) -> DataFrame:
    """M6 (CooccurrencesCount.pig:24-61): entity co-occurrence graph — per-doc
    self-join of link targets, src<dst, groupBy count, min-count filter.

    Scale note: the self-join is per doc_id; a doc with L links yields
    L·(L-1)/2 pairs. Docs are bounded (a Wikipedia page has hundreds of
    links, not millions), so the blow-up is bounded per key; the heavy
    groupBy(src,dst) benefits from map-side combine + AQE.
    """
    a = occs.select("doc_id", F.col("uri").alias("src_uri")).distinct()
    b = occs.select("doc_id", F.col("uri").alias("dst_uri")).distinct()
    return (
        a.join(b, "doc_id")
        .filter(F.col("src_uri") < F.col("dst_uri"))
        .groupBy("src_uri", "dst_uri")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= min_count)
    )


def lexicalization_triples(
    occs: DataFrame, min_pair_count: int = MIN_PAIR_COUNT
) -> DataFrame:
    """S13 (core/.../util/CreateLexicalizations.scala:112-160): NT-style score
    triples per uri and per (uri, sf) pair:
      uriCount, uriProbability, and for pairs with count >= 5:
      sfGivenUri = pair/uriCount, pmi = log(pXY/(pX*pY)),
      uriGivenSf = sfGivenUri*pX/pY (Bayes).
    Output: (subj, pred, obj) strings — the flagship triple materialization.
    """
    pairs = pair_counts(occs)
    uri_c = pairs.groupBy("uri").agg(F.sum("pair_count").alias("uri_count"))
    sf_c = pairs.groupBy("surface_form").agg(F.sum("pair_count").alias("sf_count"))
    # scalar total stays in the plan (single-row broadcast cross join) — no
    # driver round-trip, the whole job remains one lazy DAG
    total_df = F.broadcast(
        pairs.agg(F.coalesce(F.sum("pair_count"), F.lit(1)).alias("_total"))
    )

    pred = {
        "uriCount": "http://dbpedia.org/spotlight/score#uriCount",
        "uriProbability": "http://dbpedia.org/spotlight/score#uriProbability",
        "sfGivenUri": "http://dbpedia.org/spotlight/score#sfGivenUri",
        "pmi": "http://dbpedia.org/spotlight/score#pmi",
        "uriGivenSf": "http://dbpedia.org/spotlight/score#uriGivenSf",
    }
    res_prefix = "http://dbpedia.org/resource/"
    subj = F.concat(F.lit(res_prefix), F.col("uri"))

    t_count = uri_c.select(
        subj.alias("subj"),
        F.lit(pred["uriCount"]).alias("pred"),
        F.col("uri_count").cast("string").alias("obj"),
    )
    t_prob = uri_c.crossJoin(total_df).select(
        subj.alias("subj"),
        F.lit(pred["uriProbability"]).alias("pred"),
        (F.col("uri_count") / F.col("_total")).cast("string").alias("obj"),
    )

    p = (
        pairs.filter(F.col("pair_count") >= min_pair_count)
        .join(uri_c, "uri")
        .join(sf_c, "surface_form")
        .crossJoin(total_df)
        .withColumn("sf_given_uri", F.col("pair_count") / F.col("uri_count"))
        .withColumn("p_x", F.col("uri_count") / F.col("_total"))
        .withColumn("p_y", F.col("sf_count") / F.col("_total"))
        .withColumn("p_xy", F.col("pair_count") / F.col("_total"))
        .withColumn("pmi", F.log(F.col("p_xy") / (F.col("p_x") * F.col("p_y"))))
        .withColumn("uri_given_sf", F.col("sf_given_uri") * F.col("p_x") / F.col("p_y"))
    )

    def quad(value_col: str, rel: str) -> DataFrame:
        return p.select(
            subj.alias("subj"),
            F.lit(pred[rel]).alias("pred"),
            F.concat_ws(
                "|", F.col("surface_form"), F.col(value_col).cast("string")
            ).alias("obj"),
        )

    return (
        t_count.unionByName(t_prob)
        .unionByName(quad("sf_given_uri", "sfGivenUri"))
        .unionByName(quad("pmi", "pmi"))
        .unionByName(quad("uri_given_sf", "uriGivenSf"))
    )


def build_model_from_occurrences(
    documents: DataFrame,
    occs: DataFrame,
    tokens: DataFrame,
    redirects: DataFrame | None = None,
    disambiguations: DataFrame | None = None,
) -> SpotlightModel:
    """Full CreateSpotlightModel equivalent (SURVEY.md §3.2): the four Pig
    aggregations + closure, with dense integer ids assigned per dim.

    Id assignment is sorted-dense per dim via skew.dense_sorted_id (range
    partition + parallel windows + prefix offsets) — identical ids to a
    global row_number window, but no single-partition sort stage even at
    the 10M+ surface forms a full-dump build produces; the fact tables
    then join the dims to pick up ids.
    """
    from pyspark import StorageLevel

    from .skew import dense_sorted_id

    # The canonicalized occurrences feed FOUR scans (sf/res dims, pair
    # counts, token counts) and the dim builds collect eagerly, so without
    # a persist the redirect-closure canonicalization recomputes per scan.
    # MEMORY_AND_DISK: at full-dump scale this is the standard "write the
    # reused intermediate once" trade — recomputing the closure joins four
    # times costs far more than one spill copy.
    occs = canonicalize_occurrences(occs, redirects, disambiguations).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    sf_counts = sf_and_total_counts(occs)
    surface_forms = dense_sorted_id(sf_counts, ["surface_form"], "sf_id").withColumn(
        "sf_id", F.col("sf_id").cast("int")
    ).withColumn(
        "surface_form_norm", normalize_surface_form_col(F.col("surface_form"))
    ).select(
        "sf_id", "surface_form", "surface_form_norm",
        "annotated_count", "total_count",
    )

    res_counts = uri_counts(occs)
    resources = dense_sorted_id(res_counts, ["uri"], "res_id").withColumn(
        "res_id", F.col("res_id").cast("int")
    ).withColumn("types", F.array().cast("array<smallint>")).select(
        "res_id", "uri", F.col("support").cast("long").alias("support"), "types"
    )

    pairs = pair_counts(occs)
    candidates = (
        pairs.join(surface_forms.select("sf_id", "surface_form"), "surface_form")
        .join(resources.select("res_id", "uri"), "uri")
        .select("sf_id", "res_id", F.col("pair_count").cast("long").alias("pair_count"))
    )

    # tok_counts is already aggregated to (uri, stem) — persisting HERE
    # (rather than the raw per-token table) covers both its consumers
    # (vocab dim collect + context_counts) while caching the small
    # aggregate, not the corpus-sized token stream.
    tok_counts = token_counts(tokens, occs).persist(StorageLevel.MEMORY_AND_DISK)
    vocab = tok_counts.groupBy("stem").agg(F.sum("count").alias("count"))
    token_types = dense_sorted_id(vocab, ["stem"], "token_id", start=1).withColumn(
        "token_id", F.col("token_id").cast("int")  # 0 reserved
    ).select("token_id", F.col("stem").alias("token"), F.col("count").cast("long").alias("count"))

    context_counts = (
        tok_counts.join(token_types.select("token_id", F.col("token").alias("stem")), "stem")
        .join(resources.select("res_id", "uri"), "uri")
        .select("res_id", "token_id", F.col("count").cast("long").alias("count"))
    )

    return SpotlightModel(
        surface_forms=surface_forms,
        resources=resources,
        candidates=candidates,
        token_types=token_types,
        context_counts=context_counts,
        redirects=redirects,
        disambiguations=disambiguations,
    )
