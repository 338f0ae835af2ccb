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

Resumable (north rule: every stage writes checkpoint state so a killed
job resumes without recomputing completed work): each model table is one
write stage, committed by Spark's _SUCCESS marker. On rerun with the same
--output, tables whose _SUCCESS exists are SKIPPED (their action — the
expensive part of the stage — never runs); a table killed mid-write has
no _SUCCESS and is rewritten with mode=overwrite, so the protocol is
idempotent. The metrics line reports `tables_written` vs `resumed_from`.
"""

from __future__ import annotations

import argparse
import json
import os
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
    from dbpedia_spotlight_spark.model.model_tables import TABLE_NAMES

    written, resumed = [], []
    for name in TABLE_NAMES:
        df = getattr(model, name)
        if df is None:
            continue
        table_dir = os.path.join(args.output, name)
        if os.path.exists(os.path.join(table_dir, "_SUCCESS")):
            resumed.append(name)
            continue
        df.write.mode("overwrite").parquet(table_dir)
        written.append(name)
    loaded = {
        name: spark.read.parquet(os.path.join(args.output, name))
        for name in written + resumed
    }
    counts = {name: df.count() for name, df in loaded.items()}
    print(
        json.dumps(
            {
                "job": "build_model",
                "seconds": round(time.time() - t0, 2),
                "tables_written": written,
                "resumed_from": resumed,
                **counts,
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
