#!/usr/bin/env python
"""spark-submit entrypoint: one-shot KG quality gate over a materialized
triple table (the kg_export_job / annotate_job --triples output, or any
(subj, pred, obj) parquet).

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/kg_quality_job.py \
        --triples /kg/triples_parquet \
        --output /out/quality \
        [--disjoint ClassA=ClassB --disjoint C=D] \
        [--outlier-k 3.0] [--max-dangling-ratio 0.5] [--fail-on-violations]

Writes four tables under --output and prints ONE JSON metrics line:

  report/     (check, n)            — the scalar gate table
  dangling/   per-predicate referential-integrity profile
              (kglayout.dangling_objects)
  outliers/   (pred, subj, value, lo, hi) Tukey far-out numeric facts
              (kglayout.numeric_literal_outliers)
  disjoint/   (inst, class_a, class_b) owl:disjointWith violations
              (kgquery.disjointness_violations; only when --disjoint
              pairs are given)

With --fail-on-violations the process exits 1 when disjoint violations
exist or any predicate's dangling_ratio exceeds --max-dangling-ratio —
the CI-gate contract (the reference asserts its model-table invariants
at build time in index/.../CreateSpotlightModel.scala; this is that
gate for RDF exports).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--triples", required=True)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--disjoint", action="append", default=[],
        metavar="A=B", help="declared-disjoint class pair (repeatable)",
    )
    p.add_argument("--outlier-k", type=float, default=3.0)
    p.add_argument("--max-dangling-ratio", type=float, default=1.0)
    p.add_argument("--fail-on-violations", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("spotlight-kg-quality").getOrCreate()

    from dbpedia_spotlight_spark.operators.kglayout import (
        dangling_objects,
        numeric_literal_outliers,
    )
    from dbpedia_spotlight_spark.operators.kgquery import (
        disjointness_violations,
    )

    t0 = time.time()
    triples = spark.read.parquet(args.triples).persist()

    dang = dangling_objects(triples)
    dang.write.mode("overwrite").parquet(f"{args.output}/dangling")
    out = numeric_literal_outliers(triples, k=args.outlier_k)
    out.write.mode("overwrite").parquet(f"{args.output}/outliers")

    n_viol = 0
    if args.disjoint:
        pairs = spark.createDataFrame(
            [tuple(s.split("=", 1)) for s in args.disjoint],
            "a string, b string",
        )
        viol = disjointness_violations(triples, pairs)
        viol.write.mode("overwrite").parquet(f"{args.output}/disjoint")
        n_viol = spark.read.parquet(f"{args.output}/disjoint").count()

    dang_back = spark.read.parquet(f"{args.output}/dangling")
    totals = dang_back.agg(
        F.coalesce(F.sum("n_dangling"), F.lit(0)).alias("nd"),
        F.coalesce(F.max("dangling_ratio"), F.lit(0.0)).alias("worst"),
    ).first()
    n_outliers = spark.read.parquet(f"{args.output}/outliers").count()
    n_triples = triples.count()

    report = spark.createDataFrame(
        [
            ("n_triples", n_triples),
            ("dangling_objects", int(totals["nd"])),
            ("disjoint_violations", n_viol),
            ("numeric_outliers", n_outliers),
        ],
        "check string, n long",
    )
    report.coalesce(1).write.mode("overwrite").parquet(
        f"{args.output}/report"
    )

    gate_failed = bool(
        args.fail_on_violations
        and (n_viol > 0 or totals["worst"] > args.max_dangling_ratio)
    )
    print(
        json.dumps(
            {
                "job": "kg_quality",
                "seconds": round(time.time() - t0, 2),
                "n_triples": n_triples,
                "dangling_objects": int(totals["nd"]),
                "worst_dangling_ratio": float(totals["worst"]),
                "disjoint_violations": n_viol,
                "numeric_outliers": n_outliers,
                "gate_failed": gate_failed,
            }
        )
    )
    return 1 if gate_failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
