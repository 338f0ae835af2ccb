#!/usr/bin/env python
"""spark-submit entrypoint: salient-span masking over an annotated
corpus — the REALM-style pretraining transform (Guu et al., ICML 2020)
wired as a job: take the annotate pipeline's entity offsets, mask every
entity span, and write the masked corpus next to per-doc mask counts.

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/corpus_mask_job.py \
        --documents   /data/documents_parquet   \
        --annotations /data/annotations_parquet \
        --output      /out/masked               \
        [--mask-token "[MASK]"] [--min-masks 1] [--buckets 32]

Inputs: documents (doc_id, text, ...); annotations (doc_id, offset,
surface_form, ...) — the annotate/_occs output shape: span = [offset,
offset + length(surface_form)).

Output: parquet (doc_id, masked_text, n_masked) bucket-partitioned on
the doc hash for downstream co-located joins, plus ONE JSON metrics
line: docs in/out, masked-doc count, total masks. --min-masks N keeps
only docs with >= N masked spans (the REALM recipe trains on passages
that actually contain entities; 0 keeps everything).

Scale shape: mask_spans is pure segment algebra (interval_coalesce +
one lag window + one sorted collect per doc, zero UDF); the only
shuffles are the per-doc windows/groupBy keyed on doc_id and the
bucketed write.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession, functions as F


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--annotations", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--mask-token", default="[MASK]")
    p.add_argument("--min-masks", type=int, default=0)
    p.add_argument("--buckets", type=int, default=32)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("corpus-mask").getOrCreate()
    t0 = time.time()

    from dbpedia_spotlight_spark.datapipe.interleaved import mask_spans

    docs = spark.read.parquet(args.documents)
    ann = spark.read.parquet(args.annotations)
    spans = ann.select(
        "doc_id",
        F.col("offset").cast("long").alias("begin"),
        (F.col("offset") + F.length("surface_form")).cast("long").alias("end"),
    )
    masked = mask_spans(
        docs, spans, mask_token=args.mask_token
    )
    if args.min_masks > 0:
        masked = masked.filter(F.col("n_masked") >= args.min_masks)
    out = masked.repartition(
        args.buckets, F.col("doc_id")
    )
    out.write.mode("overwrite").parquet(args.output)

    written = spark.read.parquet(args.output)
    stats = written.agg(
        F.count("*").alias("docs_out"),
        F.sum((F.col("n_masked") > 0).cast("long")).alias("docs_masked"),
        F.sum("n_masked").alias("total_masks"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "job": "corpus-mask",
                "seconds": round(time.time() - t0, 2),
                "docs_in": docs.count(),
                "docs_out": stats["docs_out"],
                "docs_masked": stats["docs_masked"],
                "total_masks": int(stats["total_masks"] or 0),
                "mask_token": args.mask_token,
            }
        )
    )


if __name__ == "__main__":
    main()
