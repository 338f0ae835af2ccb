#!/usr/bin/env python
"""spark-submit entrypoint: build the Spotlight statistics model tables from
a corpus of interleaved documents + wikilink-style gold occurrences
(the CreateSpotlightModel / index_db.sh equivalent, SURVEY.md §3.2).

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/build_model_job.py \
        --documents /data/documents_parquet \
        --occurrences /data/occs_parquet \
        [--redirects /data/redirects_parquet] \
        [--disambiguations /data/disambiguations_parquet] \
        --output /models/spotlight

occurrences schema: (doc_id string, surface_form string, uri string).
Writes the five model tables as parquet under --output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--occurrences", required=True)
    p.add_argument("--redirects")
    p.add_argument("--disambiguations")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("spotlight-build-model").getOrCreate()

    from dbpedia_spotlight_spark.operators.modelbuild import (
        build_model_from_occurrences,
    )
    from dbpedia_spotlight_spark.operators.tokenizer import tokenize_documents

    t0 = time.time()
    docs = spark.read.parquet(args.documents)
    occs = spark.read.parquet(args.occurrences)
    redirects = spark.read.parquet(args.redirects) if args.redirects else None
    disamb = (
        spark.read.parquet(args.disambiguations) if args.disambiguations else None
    )
    model = build_model_from_occurrences(
        docs, occs, tokenize_documents(docs), redirects, disamb
    )
    model.save(args.output)
    counts = {
        "surface_forms": model.surface_forms.count(),
        "resources": model.resources.count(),
        "candidates": model.candidates.count(),
        "token_types": model.token_types.count(),
        "context_counts": model.context_counts.count(),
    }
    print(
        json.dumps(
            {"job": "build_model", "seconds": round(time.time() - t0, 2), **counts}
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
