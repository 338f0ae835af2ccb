"""Model-table enrichers — the Lucene IndexEnricher family (S15 in
SURVEY.md §2.1) re-expressed as dim-table joins.

Reference (index/src/main/scala/org/dbpedia/spotlight/lucene/index/):
  - AddTypesToIndex.scala — attach ontology types to every resource doc.
  - AddCountsToIndex.scala — attach uriCount (support) values.
  - AddSurfaceFormsToIndex.scala — attach alternative surface forms.
  - CompressIndex.scala — merge/optimize segments.
On Spark the "index" is the model tables, so each enricher is a broadcast
join producing a new table version (overwrite-partition under Iceberg,
path swap under parquet — see the versioned CURRENT commit in streaming/model_updates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_types_to_resources(
    resources: DataFrame, types: DataFrame
) -> DataFrame:
    """types(uri, type_qname) folded into resources.types array
    (ref AddTypesToIndex.scala; skips owl#Thing like
    DBpediaResourceSource.scala:122-164)."""
    t = (
        types.filter(~F.col("type_qname").contains("owl#Thing"))
        .groupBy("uri")
        .agg(F.collect_set("type_qname").alias("_new_types"))
    )
    return (
        resources.join(F.broadcast(t), "uri", "left")
        .withColumn(
            "types",
            F.when(
                F.col("_new_types").isNotNull(), F.col("_new_types")
            ).otherwise(F.col("types").cast("array<string>")),
        )
        .drop("_new_types")
    )


def add_counts_to_resources(
    resources: DataFrame, uri_counts: DataFrame
) -> DataFrame:
    """Replace/refresh support from a uriCounts table
    (ref AddCountsToIndex.scala)."""
    c = uri_counts.select("uri", F.col("support").alias("_new_support"))
    return (
        resources.join(F.broadcast(c), "uri", "left")
        .withColumn("support", F.coalesce("_new_support", "support"))
        .drop("_new_support")
    )


def add_surface_forms(
    surface_forms: DataFrame, extra_sfs: DataFrame
) -> DataFrame:
    """Union new surface forms into the dim, re-assigning ids for new rows
    only (ref AddSurfaceFormsToIndex.scala). extra_sfs: (surface_form,
    annotated_count?, total_count?)."""
    from dbpedia_spotlight_spark.functions.text import normalize_surface_form_col
    from dbpedia_spotlight_spark.operators.skew import dense_sorted_id

    cols = extra_sfs.columns
    new = extra_sfs.select(
        "surface_form",
        (F.col("annotated_count") if "annotated_count" in cols else F.lit(1))
        .cast("long").alias("annotated_count"),
        (F.col("total_count") if "total_count" in cols else F.lit(-1))
        .cast("long").alias("total_count"),
    ).join(
        surface_forms.select("surface_form"), "surface_form", "left_anti"
    )
    max_id = surface_forms.agg(F.max("sf_id")).collect()[0][0] or 0
    new = dense_sorted_id(
        new, ["surface_form"], "sf_id", start=max_id + 1
    ).withColumn(
        "sf_id", F.col("sf_id").cast("int")
    ).withColumn(
        "surface_form_norm", normalize_surface_form_col(F.col("surface_form"))
    )
    return surface_forms.unionByName(
        new.select(*surface_forms.columns)
    )


def compact_table(df: DataFrame, target_partitions: int) -> DataFrame:
    """CompressIndex twin: coalesce a model table to few large files before
    a rewrite (segment merge == file compaction)."""
    return df.coalesce(target_partitions)
