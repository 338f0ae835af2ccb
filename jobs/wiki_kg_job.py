#!/usr/bin/env python
"""spark-submit entrypoint: construct a KG from raw wiki-markup documents
end-to-end — extract (categories + infoboxes + interlanguage links),
canonicalize owl:sameAs identities, validate shapes, profile integrity,
and write the triple table.

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/wiki_kg_job.py \
        --documents /data/docs_parquet --output /kg/out \
        [--text-col text] [--shapes /kg/shapes_parquet]

Stages (each a module this engine ships; the job is pure composition):
  1. io/wikiextract.py: wiki_kg_triples       markup -> triples
  2. operators/kbmaintain.py: sameas_canonicalize   merge identities
  3. operators/shacl.py: shacl_validate       violations table (optional,
     needs --shapes with target_class/pred/min_count/max_count/value_class)
  4. operators/kglayout.py: void_stats + dangling_objects   profile
  5. write triples/ (+ violations/) parquet under --output

Prints ONE JSON metrics line: triple counts per stage, VoID stats, the
worst dangling predicate, and violation count. Designed for 100 TB the
same way its parts are: extraction is an embarrassingly parallel
projection; canonicalization joins the (tiny) sameAs component map
twice; validation and profiling are single groupBys/anti-joins.
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
    p.add_argument("--output", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--shapes", default=None)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("spotlight-wiki-kg").getOrCreate()
    from dbpedia_spotlight_spark.io.wikiextract import wiki_kg_triples
    from dbpedia_spotlight_spark.operators.kbmaintain import (
        sameas_canonicalize,
    )
    from dbpedia_spotlight_spark.operators.kglayout import (
        dangling_objects,
        void_stats,
    )

    t0 = time.time()
    docs = spark.read.parquet(args.documents)
    raw = wiki_kg_triples(docs, text_col=args.text_col)
    raw.persist()
    n_raw = raw.count()

    canon = sameas_canonicalize(raw)
    canon.persist()
    n_canon = canon.count()
    canon.write.mode("overwrite").parquet(f"{args.output}/triples")

    n_violations = None
    if args.shapes:
        from dbpedia_spotlight_spark.operators.shacl import shacl_validate

        shapes = spark.read.parquet(args.shapes)
        viol = shacl_validate(canon, shapes)
        viol.write.mode("overwrite").parquet(f"{args.output}/violations")
        n_violations = spark.read.parquet(
            f"{args.output}/violations"
        ).count()

    v = void_stats(canon).collect()[0]
    worst = (
        dangling_objects(canon)
        .orderBy("dangling_ratio", ascending=False)
        .limit(1)
        .collect()
    )
    raw.unpersist()
    canon.unpersist()
    metrics = {
        "job": "wiki_kg",
        "n_raw_triples": n_raw,
        "n_canonical_triples": n_canon,
        "void": {
            "n_triples": v.n_triples,
            "n_subjects": v.n_subjects,
            "n_objects": v.n_objects,
            "n_properties": v.n_properties,
            "n_classes": v.n_classes,
        },
        "worst_dangling_pred": (
            {
                "pred": worst[0].pred,
                "ratio": worst[0].dangling_ratio,
            }
            if worst
            else None
        ),
        "n_violations": n_violations,
        "wall_s": round(time.time() - t0, 2),
    }
    print(json.dumps(metrics))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
