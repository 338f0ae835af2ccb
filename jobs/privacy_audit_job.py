#!/usr/bin/env python
"""spark-submit entrypoint: privacy release gate for a tabular export —
k-anonymity / l-diversity audit plus optional suppression and PII text
scrubbing, the checks a user-derived training table passes before it
leaves the pipeline.

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/privacy_audit_job.py \
        --input /tables/customers_parquet \
        --output /out/privacy \
        --quasi c_nationkey --quasi c_mktsegment \
        --sensitive c_acctbal \
        [-k 5] [--suppress] [--text-col note] [--fail-on-violations]

Writes under --output and prints ONE JSON metrics line:

  report/      per-equivalence-class audit rows
               (pii.k_anonymity_report: class size, k verdict,
               l-diversity)
  suppressed/  the k-anonymized table (only with --suppress): rows in
               under-k classes get their quasi columns masked
  pii_stats/   per-row PII match counts of --text-col (only when given;
               pii.pii_stats — the scrub itself is a column the caller
               applies)

With --fail-on-violations the process exits 1 when any class is below
k — the CI-gate contract, same shape as jobs/kg_quality_job.py.
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
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--quasi", action="append", required=True,
        help="quasi-identifier column (repeatable)",
    )
    p.add_argument("--sensitive", required=True)
    p.add_argument("-k", type=int, default=5)
    p.add_argument("--suppress", action="store_true")
    p.add_argument("--text-col", default=None)
    p.add_argument(
        "--id-col", default="doc_id",
        help="row-id column for pii_stats (with --text-col)",
    )
    p.add_argument("--fail-on-violations", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName(
        "spotlight-privacy-audit"
    ).getOrCreate()

    from dbpedia_spotlight_spark.datapipe.pii import (
        k_anonymity_report,
        k_suppress,
        pii_stats,
    )

    t0 = time.time()
    df = spark.read.parquet(args.input).persist()
    n_rows = df.count()

    report = k_anonymity_report(df, args.quasi, args.sensitive, k=args.k)
    report.write.mode("overwrite").parquet(f"{args.output}/report")
    rep_back = spark.read.parquet(f"{args.output}/report")
    agg = rep_back.agg(
        F.count("*").alias("n_classes"),
        F.coalesce(
            F.sum(F.when(~F.col("k_anonymous"), 1).otherwise(0)), F.lit(0)
        ).alias("n_under_k"),
        F.coalesce(
            F.sum(F.when(~F.col("k_anonymous"), F.col("class_size"))
                  .otherwise(0)),
            F.lit(0),
        ).alias("n_rows_under_k"),
        F.coalesce(
            F.sum(F.when(~F.col("l_diverse"), 1).otherwise(0)), F.lit(0)
        ).alias("n_homogeneous"),
    ).first()

    n_suppressed = 0
    if args.suppress:
        sup = k_suppress(df, args.quasi, k=args.k)
        sup.write.mode("overwrite").parquet(f"{args.output}/suppressed")
        n_suppressed = int(agg["n_rows_under_k"])

    n_pii_rows = 0
    if args.text_col:
        stats = pii_stats(df, args.text_col, id_col=args.id_col)
        stats.write.mode("overwrite").parquet(f"{args.output}/pii_stats")
        back = spark.read.parquet(f"{args.output}/pii_stats")
        match_cols = [c for c in back.columns if c.startswith("n_")]
        any_hit = None
        for c in match_cols:
            cond = F.col(c) > 0
            any_hit = cond if any_hit is None else (any_hit | cond)
        if any_hit is not None:
            n_pii_rows = back.filter(any_hit).count()

    gate_failed = bool(
        args.fail_on_violations and int(agg["n_under_k"]) > 0
    )
    print(
        json.dumps(
            {
                "job": "privacy_audit",
                "n_rows": n_rows,
                "n_classes": int(agg["n_classes"]),
                "n_under_k_classes": int(agg["n_under_k"]),
                "n_rows_under_k": int(agg["n_rows_under_k"]),
                "n_homogeneous_classes": int(agg["n_homogeneous"]),
                "n_rows_suppressed": n_suppressed,
                "n_rows_with_pii": n_pii_rows,
                "gate_failed": gate_failed,
                "wall_sec": round(time.time() - t0, 2),
                "output": args.output,
            }
        )
    )
    return 1 if gate_failed else 0


if __name__ == "__main__":
    sys.exit(main())
