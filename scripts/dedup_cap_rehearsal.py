#!/usr/bin/env python
"""Round-5 rehearsal (VERDICT r4 item #6): prove the dedup/ANN caps hold
EMPIRICALLY on an amplified corpus with adversarial clumps, not just by
argument.

For each capped operator the script measures, at two corpus scales
(1x and 4x):
  - the post-cap bucket/cell size distribution (the c_i the caps act on),
  - implied candidate pairs  sum(c_i * (c_i - 1) / 2)  — the exact number
    of within-bucket pairs the self-join emits,
  - the documented linear bound  cap * sum(c_i)  (for semantic_dedup the
    star-pair degradation bound  sum(c_i<=cap: c_i^2) + sum(clumps: c_i)),
  - operator wall time and output rows.

Adversarial content: the sf0.1 documents amplified with id-shifted
copies PLUS a 3,000-doc byte-identical text clump (the minhash/prefix
mega-bucket); the sf0.1 embeddings amplified PLUS 3,000 all-zero vectors
(the classic LSH mega-bucket) and 2,000 byte-identical vectors (the
SemDeDup sign-identical clump).

Prints one JSON object; the numbers land in BENCH.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CLUMP_TEXT = "clump " * 40  # 40 identical tokens -> identical shingles


def corpus(spark, mult):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text"
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    clump = spark.range(3000).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        F.lit(CLUMP_TEXT).alias("text"),
    )
    return out.unionByName(clump)


def vectors(spark, mult):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    parts = [
        base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    dim = len(base.first()["embedding"])
    zeros = spark.range(3000).select(
        (F.col("id") + 900_000_000).alias("vec_id"),
        F.array(*[F.lit(0.0).cast("float") for _ in range(dim)]).alias(
            "embedding"
        ),
    )
    ident = spark.range(2000).select(
        (F.col("id") + 950_000_000).alias("vec_id"),
        F.array(
            *[F.lit(float(j % 3) - 1.0).cast("float") for j in range(dim)]
        ).alias("embedding"),
    )
    return out.unionByName(zeros).unionByName(ident), dim


def bucket_stats(sized, cap):
    """sized: DataFrame with one row per bucket, column n. Returns the
    measured candidate-pair count and the linear bound."""
    row = (
        sized.select(
            F.count("*").alias("n_buckets"),
            F.sum("n").alias("rows"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
            F.max("n").alias("max_c"),
        ).first()
    )
    return {
        "n_buckets": row["n_buckets"],
        "bucketed_rows": int(row["rows"] or 0),
        "candidate_pairs": int(row["pairs"] or 0),
        "linear_bound_cap_x_rows": int(cap * (row["rows"] or 0)),
        "max_bucket": int(row["max_c"] or 0),
    }


def run(mult):
    from dbpedia_spotlight_spark.datapipe.dedup import (
        embedding_near_duplicates,
        lsh_candidate_pairs,
        minhash_signatures,
        prefix_filter_jaccard_join,
        semantic_dedup,
    )
    from dbpedia_spotlight_spark.datapipe.similarity import (
        hyperplane_signatures_multi,
        train_ivf_centroids,
    )

    spark = get_spark("dedup-cap-rehearsal")
    docs = corpus(spark, mult).persist()
    n_docs = docs.count()
    emb, dim = vectors(spark, mult)
    emb = emb.persist()
    n_emb = emb.count()
    out = {"mult": mult, "n_docs": n_docs, "n_emb": n_emb, "ops": {}}

    # ---- minhash LSH ----
    cap = 1000
    sigs = minhash_signatures(docs).persist()
    t0 = time.time()
    pairs = lsh_candidate_pairs(sigs, bands=16, max_bucket_size=cap)
    n_pairs = pairs.count()
    dt = time.time() - t0
    nb = 64 // 16
    exploded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda i: F.xxhash64(F.slice("sig", i * nb + 1, nb)),
            )
        ).alias("band", "key"),
    )
    sized = (
        exploded.groupBy("band", "key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .filter(F.col("n") <= cap)
    )
    st = bucket_stats(sized, cap)
    st.update({"output_pairs": n_pairs, "sec": round(dt, 2)})
    out["ops"]["lsh_candidate_pairs"] = st

    # ---- prefix-filter jaccard join ----
    cap = 1000
    t0 = time.time()
    pj = prefix_filter_jaccard_join(docs, threshold=0.8, max_bucket=cap)
    n_pj = pj.count()
    dt = time.time() - t0
    from dbpedia_spotlight_spark.datapipe.dedup import shingle_hash_sets

    sets_df = shingle_hash_sets(docs).filter(F.size("sh") > 0)
    ex = sets_df.select("doc_id", F.explode("sh").alias("s"))
    freq = ex.groupBy("s").agg(F.count("*").alias("c"))
    ranked = (
        ex.join(freq, "s")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("c", "s"))).alias("arr"))
        .withColumn("n", F.size("arr"))
        .withColumn(
            "plen",
            (F.col("n") - F.ceil(F.lit(0.8) * F.col("n")) + 1).cast("int"),
        )
    )
    prefix = ranked.select(
        "doc_id", F.explode(F.slice("arr", 1, F.col("plen"))).alias("ps")
    ).select("doc_id", F.col("ps.s").alias("s"))
    sized = (
        prefix.groupBy("s")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .filter(F.col("n") <= cap)
    )
    st = bucket_stats(sized, cap)
    st.update({"output_pairs": n_pj, "sec": round(dt, 2)})
    out["ops"]["prefix_filter_jaccard_join"] = st

    # ---- embedding LSH near-dup ----
    cap = 2000
    t0 = time.time()
    ed = embedding_near_duplicates(emb, dim=dim, max_bucket_size=cap)
    n_ed = ed.count()
    dt = time.time() - t0
    sig = hyperplane_signatures_multi(
        emb.select(F.col("vec_id"), F.col("embedding").alias("v")),
        dim, 12, 4, seed_base=42,
    )
    sized = (
        sig.groupBy("t", "bucket")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .filter(F.col("n") <= cap)
    )
    st = bucket_stats(sized, cap)
    st.update({"output_pairs": n_ed, "sec": round(dt, 2)})
    out["ops"]["embedding_near_duplicates"] = st

    # ---- SemDeDup ----
    cap = 2000  # force the splitter to engage at this corpus size
    cents = train_ivf_centroids(emb, num_cells=16, dim=dim, seed=7)
    t0 = time.time()
    sd = semantic_dedup(
        emb, cents, max_cluster_size=cap
    )
    n_rows = sd.count()
    n_dups = sd.filter(~F.col("keep")).count()
    dt = time.time() - t0
    cells = sd.groupBy("cell").agg(F.count("*").alias("n"))
    stats = cells.select(
        F.sum(
            F.when(F.col("n") <= cap, F.col("n") * F.col("n")).otherwise(
                F.col("n")
            )
        ).alias("bound"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("naive_pairs"),
        F.max("n").alias("max_cell"),
        F.count("*").alias("n_cells"),
    ).first()
    out["ops"]["semantic_dedup"] = {
        "rows": n_rows,
        "marked_dups": n_dups,
        "sec": round(dt, 2),
        "n_cells": stats["n_cells"],
        "max_cell": int(stats["max_cell"]),
        "star_degraded_bound": int(stats["bound"]),
        "uncapped_naive_pairs": int(stats["naive_pairs"]),
    }

    docs.unpersist()
    emb.unpersist()
    sigs.unpersist()
    return out


if __name__ == "__main__":
    results = [run(int(m)) for m in (os.environ.get(
        "REHEARSAL_MULTS", "1,4").split(","))]
    print(json.dumps(results, indent=1))
