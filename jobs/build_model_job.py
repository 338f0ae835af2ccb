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

    from dbpedia_spotlight_spark.pipeline.checkpoint import (
        success_marker_exists,
    )

    written, resumed = [], []
    for name in TABLE_NAMES:
        df = getattr(model, name)
        if df is None:
            continue
        table_dir = os.path.join(args.output, name)
        if success_marker_exists(spark, table_dir):
            resumed.append(name)
            continue
        df.write.mode("overwrite").parquet(table_dir)
        written.append(name)
    loaded = {
        name: spark.read.parquet(os.path.join(args.output, name))
        for name in written + resumed
    }
    counts = {name: df.count() for name, df in loaded.items()}

    # Spotter-dictionary artifact: build the compact FSA once here and
    # persist it, so every annotate job LOADS it (one unpickle) instead of
    # paying the serial driver-side build on each cold start — the
    # reference persists exactly this (CreateSpotlightModel.scala:226-228
    # -> fsa_dict.mem). Resumable like the tables: skipped when present.
    dict_path = os.path.join(args.output, "spotter_dict.pkl")
    dict_state = "resumed"
    if not os.path.exists(dict_path):
        from dbpedia_spotlight_spark.operators.spotter import (
            _collect_dictionary,
        )

        _collect_dictionary(loaded["surface_forms"]).save(dict_path)
        dict_state = "written"

    print(
        json.dumps(
            {
                "job": "build_model",
                "seconds": round(time.time() - t0, 2),
                "tables_written": written,
                "resumed_from": resumed,
                "spotter_dict": dict_state,
                **counts,
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
