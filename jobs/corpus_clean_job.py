#!/usr/bin/env python
"""spark-submit entrypoint: end-to-end training-corpus cleaning — the
datapipe operators chained the way a 100 TB pretraining pipeline runs
them, with per-stage drop accounting.

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/corpus_clean_job.py \
        --input  /data/documents_parquet \
        --output /out/clean \
        [--langs en,es] [--near-dup] [--skip-quality] [--buckets 32]

Stages (each optional ones gated by a flag):
  1. exact dedup        — normalized-text hash groupBy, keep min doc_id
  2. near-dup dedup     — MinHash-LSH pairs -> connected components ->
                          keep the min-id representative   (--near-dup)
  3. language filter    — n-gram/script language_id ∈ --langs
  4. quality gate       — Gopher-style composite filter (keep + reasons)
  5. PII scrub          — email/URL/IP/phone masking (codegen regex)

Output: cleaned parquet (doc_id, text, lang, source, n_chars) written
bucket-partitioned for downstream co-located joins, plus ONE JSON line
with per-stage surviving counts — the auditability contract: every
dropped document is attributable to exactly one stage.

Scale shape: stages 1-2 are the only shuffles (hash groupBy / LSH band
join); 3-5 are narrow codegen maps fused into the write scan. Nothing
collects to the driver but scalar counts.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession, functions as F


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--langs", default=None, help="comma list, e.g. en,es")
    p.add_argument("--near-dup", action="store_true")
    p.add_argument("--skip-quality", action="store_true")
    p.add_argument("--min-words", type=int, default=50)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument(
        "--nfc",
        action="store_true",
        help="Unicode-NFC-normalize text first (decomposed accent "
        "sequences otherwise defeat the dedup hashing below)",
    )
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("corpus-clean").getOrCreate()

    from dbpedia_spotlight_spark.datapipe.dedup import (
        dedup_clusters,
        dedup_exact,
    )
    from dbpedia_spotlight_spark.datapipe.pii import scrub_pii
    from dbpedia_spotlight_spark.datapipe.textstats import (
        language_id,
        normalize_nfc,
        quality_filter,
    )

    docs = spark.read.parquet(args.input)
    stages: dict[str, int] = {"input": docs.count()}

    # 0. Unicode NFC normalization (optional) — BEFORE dedup, so that
    # composed/decomposed variants of the same text hash identically;
    # a narrow map, drops nothing
    if args.nfc:
        extra = [c for c in docs.columns if c not in ("doc_id", "text")]
        norm = normalize_nfc(docs).drop("changed")
        if extra:
            norm = norm.join(docs.select("doc_id", *extra), "doc_id")
        docs = norm

    # 1. exact dedup: keep the min-id representative per normalized text
    docs = dedup_exact(docs)
    stages["exact_dedup"] = docs.count()

    # 2. near-dup dedup (optional; LSH band join is the expensive stage)
    if args.near_dup:
        keep = dedup_clusters(docs).where("keep").select("doc_id")
        docs = docs.join(keep, "doc_id", "left_semi")
        stages["near_dedup"] = docs.count()

    # 3. language filter (recomputed from text — input lang col may lie)
    if args.langs:
        wanted = [s.strip() for s in args.langs.split(",") if s.strip()]
        docs = docs.where(language_id(F.col("text")).isin(wanted))
        stages["lang_filter"] = docs.count()

    # 4. Gopher-style quality gate
    if not args.skip_quality:
        qf = quality_filter(docs, min_words=args.min_words)
        docs = docs.join(
            qf.where("keep").select("doc_id"), "doc_id", "left_semi"
        )
        stages["quality"] = docs.count()

    # 5. PII scrub is a narrow map — no drops, fused into the write
    cleaned = docs.withColumn("text", scrub_pii(F.col("text")))

    (
        cleaned.withColumn(
            "bucket", F.pmod(F.hash("doc_id"), F.lit(args.buckets))
        )
        .repartition(args.buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(args.output)
    )
    # read back WITH the known schema: a run whose filters drop every
    # document writes a schema-less empty directory, and the audit line
    # must still report rows_written: 0 instead of crashing on inference
    out_rows = (
        spark.read.schema(cleaned.schema).parquet(args.output).count()
    )

    print(
        json.dumps(
            {
                "job": "corpus_clean",
                "stages": stages,
                "rows_written": out_rows,
                "output": args.output,
            }
        )
    )
    if out_rows != stages[list(stages)[-1]]:
        sys.exit(2)


if __name__ == "__main__":
    main()
