"""Triple materialization — the KG-construction output (north rule).

Three triple families, all (subj, pred, obj) rows partitioned by pred +
bucket(subj) on write (SURVEY.md §4):

  1. mention anchors (NIF-style; ref rest/.../NIFOutputFormatter.scala:43-84):
     span URIs `<doc>#char=<start>,<end>` linked to resources via
     itsrdf:taIdentRef, plus anchorOf / confidence literals.
  2. lexicalization score triples (ref core/.../util/CreateLexicalizations.scala)
     — see operators/modelbuild.lexicalization_triples.
  3. entity co-occurrence edges (ref index/src/main/pig/CooccurrencesCount.pig)
     — see operators/modelbuild.cooccurrence_edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ITSRDF_TA_IDENT_REF = "http://www.w3.org/2005/11/its/rdf#taIdentRef"
ITSRDF_TA_CONFIDENCE = "http://www.w3.org/2005/11/its/rdf#taConfidence"
NIF_ANCHOR_OF = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#anchorOf"
RESOURCE_PREFIX = "http://dbpedia.org/resource/"


def annotation_triples(annotations: DataFrame, doc_prefix: str = "http://example.org/doc/") -> DataFrame:
    """annotations -> NIF-style mention triples."""
    span_uri = F.concat(
        F.lit(doc_prefix),
        F.col("doc_id"),
        F.lit("#char="),
        F.col("offset").cast("string"),
        F.lit(","),
        (F.col("offset") + F.length("surface_form")).cast("string"),
    )
    ident = annotations.select(
        span_uri.alias("subj"),
        F.lit(ITSRDF_TA_IDENT_REF).alias("pred"),
        F.concat(F.lit(RESOURCE_PREFIX), F.col("uri")).alias("obj"),
    )
    anchor = annotations.select(
        span_uri.alias("subj"),
        F.lit(NIF_ANCHOR_OF).alias("pred"),
        F.col("surface_form").alias("obj"),
    )
    conf = annotations.select(
        span_uri.alias("subj"),
        F.lit(ITSRDF_TA_CONFIDENCE).alias("pred"),
        F.col("similarity_score").cast("string").alias("obj"),
    )
    return ident.unionByName(anchor).unionByName(conf)


def write_triples(
    triples: DataFrame, path: str, num_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Partitioned triple sink: pred is low-cardinality (directory
    partitioning → partition pruning per predicate); subj is hash-bucketed
    into a fixed column so a 100 TB output never creates giant single files
    nor millions of tiny ones."""
    (
        triples.withColumn("subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(num_buckets)))
        .repartition("pred", "subj_bucket")
        .write.mode(mode)
        .partitionBy("pred", "subj_bucket")
        .parquet(path)
    )
