"""BM25 ranked retrieval — the Lucene search stack's scoring capability
re-expressed as DataFrame aggregations (reference: the legacy Lucene
candidate/context searchers, core/src/main/java/org/dbpedia/spotlight/
lucene/search/MergedOccurrencesContextSearcher.java and
CandidateResourceQuery.java, which rank documents/resources for a term
query; our db-stack D6 TF-ICF covers the *disambiguation* use, this
covers the *retrieval* use).

Shape for 100 TB: one tokenize pass -> per-(doc, term) tf (map-side
partial agg), per-term document frequency (groupBy on term — the
"inverted index" is this aggregate, never a driver-side structure), a
scalar avgdl, and a broadcast semi-join of the query terms so scoring
touches only postings of queried terms (the classic term-at-a-time
plan). Top-k per query via TakeOrderedAndProject-friendly window. No
Python UDFs anywhere — the whole scorer is codegen column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_terms(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents -> (doc_id, term, tf) on whitespace-lowercase terms.
    Deliberately the plain split both engines can replay; swap in the
    Snowball tokenizer (operators/tokenizer.py) for linguistic search."""
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def bm25_scores(
    documents: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """queries(query_id, term) -> top-k (query_id, doc_id, score, rank) by
    BM25 (Robertson/Sparck Jones; the Lucene-classic idf form
    ln(1 + (N - df + 0.5) / (df + 0.5)), which is nonnegative).

    score(q, d) = sum over query terms t of
      idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    Duplicate query terms count once (Lucene BooleanQuery semantics on a
    term set); score ties broken by doc_id for a deterministic top-k."""
    tf = doc_terms(documents, text_col=text_col, id_col=id_col)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n_docs, avgdl = dl.agg(F.count("*"), F.avg("dl")).collect()[0]
    qterms = queries.select("query_id", "term").distinct()
    # postings of queried terms only (broadcast semi-restriction): both the
    # document frequencies and the scoring touch nothing else — the
    # term-at-a-time inverted-index plan, never a corpus-wide df aggregate
    postings = tf.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).persist()
    df_q = postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_q), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            idf
            * F.col("tf")
            * (F.lit(k1) + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
