#!/usr/bin/env python
"""spark-submit entrypoint: WARC web-archive ingestion — raw WARC files
to a clean documents table ready for corpus_clean_job / annotate_job.

    spark-submit --py-files dbpedia_spotlight_spark.zip jobs/warc_ingest_job.py \
        --input  /data/crawl/*.warc \
        --output /out/documents \
        [--min-chars 200] [--buckets 32] [--keep-status 200]

Stages:
  1. record split      — Hadoop delimited-text read on the WARC version
                         line: a 100 GB archive partitions at record
                         boundaries across executors (io/warc.py)
  2. parse + filter    — header/HTTP-envelope parsing (pure column
                         expressions); keep response records with the
                         wanted HTTP status and an HTML content type
  3. text extraction   — html_to_text / html_title / link_density
                         (functions/html.py, codegen regex chains)
  4. URL canonicalize  — url_normalize / url_host / registrable_domain
                         (functions/urls.py); url-level exact dedup on
                         the normalized URL (first record wins,
                         deterministic by record order key)
  5. length gate       — drop boilerplate-only shells under --min-chars

Output: parquet (doc_id, url, host, domain, title, text, link_density,
n_chars) where doc_id = xxhash64 of the normalized URL — stable across
runs and cluster sizes — written bucket-partitioned on doc_id for
downstream co-located joins. Prints ONE JSON line with per-stage counts
(same auditability contract as corpus_clean_job).

Scale shape: the only shuffle is the URL-dedup groupBy (and the bucketed
write's repartition); parsing and extraction are narrow codegen maps
fused into the scan. Nothing collects to the driver but scalar counts.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--min-chars", type=int, default=200)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--keep-status", default="200")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("warc-ingest").getOrCreate()

    from dbpedia_spotlight_spark.functions.html import (
        html_title,
        html_to_text,
        link_density,
    )
    from dbpedia_spotlight_spark.functions.urls import (
        registrable_domain,
        url_host,
        url_normalize,
    )
    from dbpedia_spotlight_spark.io.warc import read_warc

    counts: dict[str, int] = {}

    recs = read_warc(spark, args.input)
    counts["records"] = recs.count()

    keep = set(s.strip() for s in args.keep_status.split(","))
    pages = recs.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").isin(*keep)
        & F.lower(F.coalesce(F.col("content_type"), F.lit(""))).rlike(
            "http|html"
        )
    ).select("target_uri", "payload")
    counts["html_responses"] = pages.count()

    docs = pages.select(
        url_normalize(F.col("target_uri")).alias("url"),
        html_title(F.col("payload")).alias("title"),
        html_to_text(F.col("payload")).alias("text"),
        F.round(link_density(F.col("payload")), 6).alias("link_density"),
    )

    # URL-level dedup: one row per normalized URL, smallest (title, text)
    # tuple wins — deterministic without assuming a record-order column.
    deduped = (
        docs.groupBy("url")
        .agg(F.min(F.struct("title", "text", "link_density")).alias("r"))
        .select("url", "r.title", "r.text", "r.link_density")
    )
    counts["unique_urls"] = deduped.count()

    out = (
        deduped.filter(F.length("text") >= args.min_chars)
        .select(
            F.xxhash64("url").alias("doc_id"),
            "url",
            url_host(F.col("url")).alias("host"),
            registrable_domain(F.col("url")).alias("domain"),
            "title",
            "text",
            "link_density",
            F.length("text").alias("n_chars"),
        )
        .withColumn(
            "bucket", F.pmod(F.col("doc_id"), F.lit(args.buckets))
        )
    )
    out.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(args.output)

    written = spark.read.parquet(args.output)
    counts["written"] = written.count()
    print(
        json.dumps(
            {"job": "warc_ingest", "output": args.output, **counts}
        )
    )


if __name__ == "__main__":
    main()
