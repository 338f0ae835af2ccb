#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   plus scaling evidence: docs/sec at N=8 and 4N=32 local cores and the
   throughput scaling efficiency T_N / (4 * T_4N)}

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. The scaling job is the flagship annotate
pipeline (model pre-built and cached — the reference's own protocol,
eval/.../EvaluateSpotlightModel.scala:41-56, times annotate with the model
loaded) over an 8x-replicated corpus so the parallel fraction dominates.

Env knobs: BENCH_REPLICATE (default 8), BENCH_SKIP_SCALING=1 to skip the
two-parallelism measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("BENCH_REPLICATE", "8"))
SKIP_SCALING = os.environ.get("BENCH_SKIP_SCALING") == "1"

HEADLINE = [
    "annotate_e2e",
    "nif_triples",
    "m2_sf_total_counts",
    "m6_cooccurrence",
    "s13_lexicalizations",
    "minhash_near_dups",
    "simhash_buckets",
    "knn_cosine",
    "text_stats",
    "dedup_exact",
    "lang_id",
]


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from dbpedia_spotlight_spark.session import get_spark

    spark = get_spark(f"bench-{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _replicated_docs(spark, sf_dir: str, repl: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = None
    for i in range(repl):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        out = p if out is None else out.unionByName(p)
    return out


def _annotate_throughput(spark, sf_dir: str, repl: int):
    """(n_docs, seconds) for the annotate job with a pre-built cached model."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from dbpedia_spotlight_spark.operators.modelbuild import (
        build_model_from_occurrences,
    )
    from dbpedia_spotlight_spark.operators.tokenizer import (
        flat_to_interleaved_media,
        tokenize_documents,
    )
    from dbpedia_spotlight_spark.pipeline.annotate import annotate

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    iv_base = flat_to_interleaved_media(base)
    occ = E._occs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "surface_form", "uri"
    )
    model = build_model_from_occurrences(iv_base, occ, tokenize_documents(iv_base))
    for t in [
        model.surface_forms,
        model.resources,
        model.candidates,
        model.token_types,
        model.context_counts,
    ]:
        t.cache().count()

    docs = _replicated_docs(spark, sf_dir, repl)
    n_docs = docs.count()
    iv = flat_to_interleaved_media(docs)
    t0 = time.time()
    _noop(annotate(iv, model, use_context=True))
    return n_docs, time.time() - t0


def main() -> None:
    import __spark_entry__ as E

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    result: dict = {"sf": sf}

    # --- scaling evidence (north rule): same job at N and 4N cores ---------
    if not SKIP_SCALING:
        n_cores, n4_cores = max(CPUS // 4, 1), CPUS
        spark = _fresh_spark(n_cores)
        nd, t_n = _annotate_throughput(spark, SF_DIR, REPL)
        spark = _fresh_spark(n4_cores)
        _, t_4n = _annotate_throughput(spark, SF_DIR, REPL)
        result.update(
            {
                "scaling": {
                    "job": "annotate (model cached)",
                    "n_docs": nd,
                    "cores_n": n_cores,
                    "cores_4n": n4_cores,
                    "sec_n": round(t_n, 2),
                    "sec_4n": round(t_4n, 2),
                    "docs_per_sec_n": round(nd / t_n, 1),
                    "docs_per_sec_4n": round(nd / t_4n, 1),
                    "efficiency": round(t_n / (4 * t_4n), 3),
                }
            }
        )

    # --- headline queries at local[CPUS] -----------------------------------
    spark = _fresh_spark(CPUS)
    queries = E.queries()
    times: dict = {}
    for name in HEADLINE:
        t0 = time.time()
        _noop(queries[name](spark, SF_DIR))
        times[name] = round(time.time() - t0, 2)

    result.update(
        {
            "metric": "headline_total_sec",
            "value": round(sum(times.values()), 2),
            "unit": "sec",
            "queries": times,
        }
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
