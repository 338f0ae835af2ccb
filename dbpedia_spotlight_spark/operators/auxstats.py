"""M14 auxiliary statistics (SURVEY.md §2.6, deferred in round 1).

Reference:
  - ExtractTopicSignatures (index/src/main/scala/org/dbpedia/spotlight/util/
    ExtractTopicSignatures.scala:33-68): per URI, the top-N context keywords
    (TF-ranked via contextSearcher.getContextWords — KeywordExtractor
    .scala:63-70), stopword-filtered, written as `uri<TAB>keywords`.
  - GetWebPriors (index/.../util/GetWebPriors.scala:53-95): builds a web
    search query per URI from the topic signature and a "must" clause
    derived from the URI title (KeywordExtractor.scala:44-61: decode
    underscores, split a trailing ' (qualifier)' into its own quoted term),
    then queries a search API for occurrence counts. The network call is out
    of scope here (sandbox + long-dead Yahoo BOSS API); the deterministic
    dataflow — signature extraction and query-string construction — is the
    Spark part and is fully implemented.

All stages are window-rank + string aggregation: one shuffle on res/uri for
the groupBy, top-N inside the window, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def uri_token_counts(occs: DataFrame, tokens: DataFrame) -> DataFrame:
    """Per-(uri, token) context counts from gold occurrences and the
    document token table -> (uri, token, count)."""
    doc_uris = occs.select("doc_id", "uri").distinct()
    return (
        tokens.select("doc_id", "token")
        .join(doc_uris, "doc_id")
        .groupBy("uri", "token")
        .agg(F.count("*").alias("count"))
    )


def topic_signatures(
    uri_token_counts: DataFrame,
    stopwords: list | None = None,
    n_keywords: int = 3,
) -> DataFrame:
    """Top-N context keywords per uri, TF-ranked (count desc, token asc
    tie-break), stopword-filtered -> (uri, keywords) with keywords
    space-joined in rank order (the .topicsig line format)."""
    df = uri_token_counts
    if stopwords:
        df = df.filter(~F.lower(F.col("token")).isin([s.lower() for s in stopwords]))
    w = Window.partitionBy("uri").orderBy(F.desc("count"), F.asc("token"))
    ranked = df.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= n_keywords
    )
    return (
        ranked.groupBy("uri")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rk", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("keywords")
        )
    )


def must_clause(uri_col) -> Column:
    """KeywordExtractor.createKeywordsFromDBpediaResourceURI
    (:44-61): decode underscores; a trailing ' (qualifier)' becomes its own
    quoted MUST term."""
    decoded = F.regexp_replace(uri_col, "_", " ")
    title = F.regexp_extract(decoded, r"^(.+?) \((.+?)\)$", 1)
    qualifier = F.regexp_extract(decoded, r"^(.+?) \((.+?)\)$", 2)
    return F.when(
        qualifier != F.lit(""),
        F.concat(F.lit('+"'), title, F.lit('" +"'), qualifier, F.lit('"')),
    ).otherwise(F.concat(F.lit('+"'), decoded, F.lit('"')))


def web_query_strings(
    uri_token_counts: DataFrame,
    stopwords: list | None = None,
    n_keywords: int = 3,
) -> DataFrame:
    """GetWebPriors query construction (KeywordExtractor.getKeywordsWithMust
    :66-75): must clause + top extra keywords — 2N candidates are ranked,
    those already contained in the must string (case-insensitive) drop out,
    the first N survive. -> (uri, must, keywords, query)."""
    df = uri_token_counts
    if stopwords:
        df = df.filter(~F.lower(F.col("token")).isin([s.lower() for s in stopwords]))
    w = Window.partitionBy("uri").orderBy(F.desc("count"), F.asc("token"))
    cand = (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 2 * n_keywords)
        .withColumn("must", must_clause(F.col("uri")))
        .filter(
            ~F.lower(F.col("must")).contains(F.lower(F.col("token")))
        )
    )
    w2 = Window.partitionBy("uri").orderBy("_rk")
    kept = cand.withColumn("_rk2", F.row_number().over(w2)).filter(
        F.col("_rk2") <= n_keywords
    )
    agg = kept.groupBy("uri", "must").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_rk2", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias("keywords")
    )
    return agg.select(
        "uri",
        "must",
        "keywords",
        F.concat_ws(" ", "must", "keywords").alias("query"),
    )



def surface_ambiguity(pairs: DataFrame) -> DataFrame:
    """Per-surface-form ambiguity profile over the candidate map (M3's
    pair counts): sense count, Shannon entropy of the sense
    distribution, and the dominant-sense prior — the numbers that
    drive spotter tuning (the reference's SpotterTuner trades recall
    against exactly this ambiguity) and that decide when a surface
    form is safe to link by prior alone (entropy ~ 0) versus needing
    context (entropy high).

    ``pairs``: (surface_form, uri, pair_count). -> (surface_form,
    n_senses, total, entropy round 6, top_prior round 6), entropy in
    nats, 0.0 for unambiguous forms by the 0·ln0 = 0 convention.

    Scale shape: ONE groupBy over the candidate map (map-side
    combinable sums; entropy via sum(p ln p) needs the total first,
    so the per-form total is computed in the same aggregation using
    sum/sum identities: H = ln(T) - Σ c·ln(c) / T). No window, no
    join, no second pass.
    """
    return pairs.groupBy("surface_form").agg(
        F.count("*").cast("long").alias("n_senses"),
        F.sum("pair_count").cast("long").alias("total"),
        F.round(
            F.log(F.sum("pair_count").cast("double"))
            - F.sum(
                F.col("pair_count")
                * F.log(F.col("pair_count").cast("double"))
            )
            / F.sum("pair_count"),
            6,
        ).alias("entropy"),
        F.round(
            F.max("pair_count") / F.sum("pair_count"), 6
        ).alias("top_prior"),
    )
