#!/usr/bin/env python
"""spark-submit entrypoint: DSIR data selection — pick the k raw-corpus
documents whose hashed-n-gram distribution best matches a target corpus
(Xie et al. 2023), deterministically (Gumbel noise replayed from
md5(doc_id), so reruns and cluster-size changes select the same docs).

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/dsir_select_job.py \
        --raw /data/raw_docs_parquet --target /data/target_docs_parquet \
        --output /out/selected -k 100000 [--buckets 4096]

Writes the selected documents (full rows, plus their logw/key scores)
and prints ONE JSON metrics line.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--raw", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("-k", type=int, required=True)
    p.add_argument("--buckets", type=int, default=4096)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("dsir-select").getOrCreate()

    from dbpedia_spotlight_spark.datapipe.dsir import dsir_select

    raw = spark.read.parquet(args.raw)
    target = spark.read.parquet(args.target)
    picked = dsir_select(
        raw,
        target,
        k=args.k,
        text_col=args.text_col,
        id_col=args.id_col,
        buckets=args.buckets,
    )
    out = raw.join(
        F.broadcast(picked.select(args.id_col, "logw", "key")), args.id_col
    )
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "job": "dsir_select",
                "k": args.k,
                "rows_written": n,
                "buckets": args.buckets,
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
