#!/usr/bin/env python
"""spark-submit entrypoint: materialize the complete knowledge graph from
annotate output — the north-rule "graph materialize" step as one resumable
job.

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/kg_export_job.py \
        --annotations /data/annotations_parquet \
        --documents /data/documents_parquet \
        --output /kg [--min-cooc 3] [--iterations 3] [--nil-threshold 0.5]

annotations schema: (doc_id, surface_form, uri, pos:int token position
[, prior]) — OR the annotate pipeline's own output (doc_id, offset:char
offset, surface_form, uri, similarity_score, ...): when `pos` is absent
it is derived from `offset` by counting spaces in text[:offset] (the
corpus is single-space tokenized), and `similarity_score` stands in for
`prior` as the NIL confidence. documents: (doc_id, text) for predicate-
surface tokens.

Writes five KG tables as parquet under --output:
  relations/  open-IE (subj_uri, pred, obj_uri, support) triples
  edges/      entity co-occurrence graph (src_uri, dst_uri, count)
  entities/   entity dim: support + global PageRank + LPA community
              + connected component
  salience/   per-(doc, entity) salience features + score
  emerging/   NIL clusters minted as new KB entities (needs `prior`)

Resumable (same per-table _SUCCESS protocol as build_model_job): on rerun
with the same --output, tables whose _SUCCESS marker exists are skipped;
a table killed mid-write has no marker and is rewritten with
mode=overwrite. One JSON metrics line: tables written vs resumed + row
counts + wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--annotations", required=True)
    p.add_argument("--documents", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--min-cooc", type=int, default=3)
    p.add_argument("--iterations", type=int, default=3)
    p.add_argument("--nil-threshold", type=float, default=0.5)
    p.add_argument("--min-support", type=int, default=1)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("spotlight-kg-export").getOrCreate()

    from dbpedia_spotlight_spark.datapipe.dedup import connected_components
    from dbpedia_spotlight_spark.operators.graph import (
        global_pagerank,
        label_propagation,
    )
    from dbpedia_spotlight_spark.operators.kbaugment import (
        emerging_entities,
        entity_salience,
    )
    from dbpedia_spotlight_spark.operators.modelbuild import cooccurrence_edges
    from dbpedia_spotlight_spark.pipeline.triples import relation_triples

    t0 = time.time()
    ann = spark.read.parquet(args.annotations)
    docs = spark.read.parquet(args.documents)
    tokens = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    )
    if "pos" not in ann.columns:
        # annotate-pipeline output: char offset -> token position =
        # number of spaces before the offset (single-space tokenization)
        ann = ann.join(docs.select("doc_id", "text"), "doc_id").withColumn(
            "pos",
            F.length(
                F.regexp_replace(
                    F.substring(F.col("text"), 1, F.col("offset").cast("int")),
                    "[^ ]",
                    "",
                )
            ).cast("long"),
        ).drop("text")
    score_col = (
        "prior"
        if "prior" in ann.columns
        else ("similarity_score" if "similarity_score" in ann.columns else None)
    )
    mentions = ann.select("doc_id", "pos", "uri")

    def build_entities():
        edges = cooccurrence_edges(
            ann.select("doc_id", "uri"), min_count=args.min_cooc
        )
        sym = edges.select(
            F.col("src_uri").alias("src"),
            F.col("dst_uri").alias("dst"),
            "count",
        ).unionByName(
            edges.select(
                F.col("dst_uri").alias("src"),
                F.col("src_uri").alias("dst"),
                "count",
            )
        )
        support = ann.groupBy("uri").agg(F.count("*").alias("support"))
        pr = global_pagerank(sym, args.iterations, weight="count").select(
            F.col("node").alias("uri"), F.round("rank", 6).alias("pagerank")
        )
        lp = label_propagation(sym, args.iterations).select(
            F.col("node").alias("uri"), F.col("label").alias("community")
        )
        cc = connected_components(
            edges.select(F.col("src_uri").alias("a"), F.col("dst_uri").alias("b"))
        ).select(F.col("doc_id").alias("uri"), "component")
        return (
            support.join(pr, "uri", "left")
            .join(lp, "uri", "left")
            .join(cc, "uri", "left")
        )

    stages = {
        "relations": lambda: relation_triples(
            mentions, tokens, max_gap=2, min_support=args.min_support
        ),
        "edges": lambda: cooccurrence_edges(
            ann.select("doc_id", "uri"), min_count=args.min_cooc
        ),
        "entities": build_entities,
        "salience": lambda: entity_salience(mentions),
    }
    if score_col is not None:
        stages["emerging"] = lambda: emerging_entities(
            ann, score_col=score_col, threshold=args.nil_threshold
        )

    from dbpedia_spotlight_spark.pipeline.checkpoint import (
        success_marker_exists,
    )

    written, resumed = [], []
    for name, make in stages.items():
        table_dir = os.path.join(args.output, name)
        if success_marker_exists(spark, table_dir):
            resumed.append(name)
            continue
        make().write.mode("overwrite").parquet(table_dir)
        written.append(name)

    counts = {
        name: spark.read.parquet(os.path.join(args.output, name)).count()
        for name in written + resumed
    }
    print(
        json.dumps(
            {
                "job": "kg_export",
                "seconds": round(time.time() - t0, 2),
                "tables_written": written,
                "resumed_from": resumed,
                **counts,
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
