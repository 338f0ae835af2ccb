"""Similarity search over embedding columns (array<float>).

  - brute_force_topk: exact cosine top-k — the correctness baseline.
  - lsh_topk: random-hyperplane LSH bucketing; candidates only form inside a
    bucket, then exact re-rank. The scale path: at 100 TB the bucket join
    replaces the all-pairs cross join; multiple hash tables trade recall for
    cost.

All per-row vector math (hyperplane signatures, cosine re-rank) runs as
Arrow-batched numpy matmuls inside mapInPandas. Spark's array higher-order
functions (F.aggregate / F.zip_with lambdas) evaluate INTERPRETED — measured
~130x slower than codegen on simhash (BENCH.md) — so a 12-plane signature
over an embedding table would spend its entire budget in the expression
interpreter. One `(batch x dim) @ planes.T` BLAS call per Arrow batch
replaces num_planes interpreted folds per row.

Vectors ride through the plan only where consumed: lsh_topk forms and
dedupes candidates as bare (query_id, cand_id) pairs and joins the vectors
back exactly once for the re-rank — at 100 TB the dedupe shuffle moves ids,
not embeddings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from typing import Iterator


def _stack(col: pd.Series, dim: int) -> np.ndarray:
    """(batch x dim) float64 matrix from an Arrow list column. float32
    inputs are upcast BEFORE any reduction so accumulation happens in
    float64 — matching both Spark's fold-in-double and the DuckDB oracle's
    DOUBLE[] cast."""
    if len(col) == 0:
        return np.zeros((0, dim), dtype=np.float64)
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    """Append cosine(a, b) computed as a vectorized numpy batch op.
    Zero-norm vectors get cosine 0.0 (same contract as the SQL oracle's
    list_cosine_similarity guarded by denom > 0)."""
    # copy, don't .add(): StructType.add mutates the DataFrame's cached
    # schema object in place, which corrupts df.columns
    fields = list(df.schema.fields)
    schema = StructType(fields + [StructField(out, DoubleType())])
    cols = [f.name for f in fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out] = np.zeros(0, dtype=np.float64)
                yield pdf[cols + [out]]
                continue
            A = _stack(pdf[a], 1)
            B = _stack(pdf[b], 1)
            dots = np.einsum("ij,ij->i", A, B)
            denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            safe = np.where(denom > 0, denom, 1.0)
            pdf[out] = np.where(denom > 0, dots / safe, 0.0)
            yield pdf[cols + [out]]

    return df.mapInPandas(gen, schema)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: queries × embeddings cosine, window rank.
    queries: (query_id, embedding). Broadcast the query side (queries are
    few; the corpus is the big side)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    scored = with_cosine(
        q.crossJoin(c).filter(F.col("query_id") != F.col("cand_id")),
        "q_vec",
        "c_vec",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def hyperplane_signature(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    out: str = "bucket",
) -> DataFrame:
    """Sign pattern over random hyperplanes -> integer bucket id. One numpy
    `(batch x dim) @ planes.T` matmul per Arrow batch; the plane matrix is
    closed over (tiny — num_planes x dim floats), so no broadcast needed."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))
    weights = (1 << np.arange(num_planes, dtype=np.int64))
    fields = list(df.schema.fields)
    schema = StructType(fields + [StructField(out, LongType())])
    cols = [f.name for f in fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out] = np.zeros(0, dtype=np.int64)
                yield pdf[cols + [out]]
                continue
            M = _stack(pdf[vec_col], dim)
            bits = (M @ planes.T) > 0
            pdf[out] = bits.astype(np.int64) @ weights
            yield pdf[cols + [out]]

    return df.mapInPandas(gen, schema)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 12,
    num_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: union of num_tables hyperplane bucketings; exact
    cosine re-rank within the deduped candidate union.

    Scale shape: the per-table bucket join and the dropDuplicates shuffle
    both carry ONLY (query_id, cand_id[, bucket]) — embeddings are joined
    back exactly once, after dedupe, for the re-rank. The query side is
    broadcast in both places (queries are few by construction)."""
    q_ids = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c_ids = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    cands = None
    for t in range(num_tables):
        qb = hyperplane_signature(
            q_ids, dim, num_planes, "q_vec", seed=42 + t
        ).select("query_id", "bucket")
        cb = hyperplane_signature(
            c_ids, dim, num_planes, "c_vec", seed=42 + t
        ).select("cand_id", "bucket")
        pairs = (
            F.broadcast(qb)
            .join(cb, "bucket")
            .filter(F.col("query_id") != F.col("cand_id"))
            .select("query_id", "cand_id")
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.dropDuplicates(["query_id", "cand_id"])
    enriched = cands.join(F.broadcast(q_ids), "query_id").join(c_ids, "cand_id")
    scored = with_cosine(enriched, "q_vec", "c_vec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )
