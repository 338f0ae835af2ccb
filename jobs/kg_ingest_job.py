#!/usr/bin/env python
"""spark-submit entrypoint: run the streaming KG ingest once over
everything currently in an append-only triple directory (availableNow
trigger) and fold it into a versioned KB with an incrementally
maintained closure (streaming/kg_ingest.py).

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/kg_ingest_job.py \
        --input /feeds/triples --kb /kg/kb --checkpoint /kg/ckpt \
        [--closure-pred skos:broader]

Rerunnable: the streaming checkpoint skips already-read files and the
CURRENT-marker batch-id guard makes a replayed batch a no-op, so cron
restarts are exactly-once. Prints one JSON metrics line with the
committed version plus triple/closure row counts.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--kb", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--closure-pred", default="skos:broader")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("spotlight-kg-ingest").getOrCreate()
    from dbpedia_spotlight_spark.streaming.kg_ingest import (
        _current_version,
        load_kb,
        run_kg_ingest_stream,
    )

    t0 = time.time()
    q = run_kg_ingest_stream(
        spark,
        args.input,
        args.kb,
        args.checkpoint,
        closure_pred=args.closure_pred,
        available_now=True,
    )
    q.awaitTermination()
    version = _current_version(args.kb)
    metrics = {
        "job": "kg_ingest",
        "version": version,
        "n_triples": load_kb(spark, args.kb, "triples").count()
        if version
        else 0,
        "n_closure": load_kb(spark, args.kb, "closure").count()
        if version
        else 0,
        "wall_s": round(time.time() - t0, 2),
    }
    print(json.dumps(metrics))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
