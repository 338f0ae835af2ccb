#!/usr/bin/env python
"""spark-submit entrypoint: harvest KB-construction signals from a raw
corpus in one pass — the text-mining front half of the KG loop, feeding
the ingest/quality jobs downstream:

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/kb_harvest_job.py \
        --documents /data/documents_parquet \
        --output    /out/harvest \
        [--mentions /data/mentions_parquet] [--kb /data/triples_parquet] \
        [--min-support 2] [--max-distance 30]

Tables written under --output (each with _SUCCESS-style parquet dirs):
  isa_candidates/       Hearst-pattern (hyponym, hypernym, pattern,
                        support) — subclass-edge feed
  acronym_lexicalizations/  Schwartz-Hearst (long_form, acronym,
                        support) — surface-form enrichment feed
  silver_relations/     distant-supervision (doc, spans, pred) examples
                        — written only when BOTH --mentions (doc_id,
                        pos, uri) and --kb (subj, pred, obj) are given

Prints ONE JSON metrics line with per-table row counts.

Scale shape: hearst/acronym mining are single-pass regexp codegen +
one support groupBy each; distant supervision is the KB-first keyed
join pair (no all-pairs stage) — see the operators' own docstrings.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--mentions", default=None)
    p.add_argument("--kb", default=None)
    p.add_argument("--min-support", type=int, default=2)
    p.add_argument("--max-distance", type=int, default=30)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("kb-harvest").getOrCreate()
    t0 = time.time()

    from dbpedia_spotlight_spark.pipeline.triples import (
        acronym_pairs,
        distant_supervision,
        hearst_patterns,
    )

    docs = spark.read.parquet(args.documents)
    metrics = {"job": "kb-harvest"}

    isa = hearst_patterns(docs, min_support=args.min_support)
    isa.write.mode("overwrite").parquet(f"{args.output}/isa_candidates")
    metrics["isa_candidates"] = spark.read.parquet(
        f"{args.output}/isa_candidates"
    ).count()

    acr = acronym_pairs(docs, min_support=args.min_support)
    acr.write.mode("overwrite").parquet(
        f"{args.output}/acronym_lexicalizations"
    )
    metrics["acronym_lexicalizations"] = spark.read.parquet(
        f"{args.output}/acronym_lexicalizations"
    ).count()

    if args.mentions and args.kb:
        silver = distant_supervision(
            spark.read.parquet(args.mentions),
            spark.read.parquet(args.kb),
            max_distance=args.max_distance,
        )
        silver.write.mode("overwrite").parquet(
            f"{args.output}/silver_relations"
        )
        metrics["silver_relations"] = spark.read.parquet(
            f"{args.output}/silver_relations"
        ).count()

    metrics["seconds"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
