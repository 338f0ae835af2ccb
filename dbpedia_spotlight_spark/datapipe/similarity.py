"""Similarity search over embedding columns (array<float>).

  - brute_force_topk: exact cosine top-k, built-in functions only
    (F.aggregate/zip_with dot products) — the correctness baseline.
  - lsh_topk: random-hyperplane LSH bucketing; candidates only form inside a
    bucket, then exact re-rank. The scale path: at 100 TB the bucket join
    replaces the all-pairs cross join; multiple hash tables trade recall for
    cost.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    denom = _norm(F.col(a)) * _norm(F.col(b))
    return df.withColumn(
        out, F.when(denom > 0, _dot(F.col(a), F.col(b)) / denom).otherwise(0.0)
    )


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
    """Sign pattern over random hyperplanes -> integer bucket id. Pure column
    math: the plane matrix enters the plan as literals (no UDF)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(num_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return df.withColumn(out, bucket)


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
    cosine re-rank within candidate union."""
    cands = None
    for t in range(num_tables):
        qb = hyperplane_signature(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
            dim, num_planes, "q_vec", seed=42 + t,
        )
        cb = hyperplane_signature(
            embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")),
            dim, num_planes, "c_vec", seed=42 + t,
        )
        pairs = qb.join(cb, "bucket").filter(F.col("query_id") != F.col("cand_id"))
        pairs = pairs.select("query_id", "q_vec", "cand_id", "c_vec")
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.dropDuplicates(["query_id", "cand_id"])
    scored = with_cosine(cands, "q_vec", "c_vec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )
