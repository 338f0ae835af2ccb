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


def hyperplane_signatures_multi(
    df: DataFrame,
    dim: int,
    num_planes: int,
    num_tables: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
    seed_base: int = 42,
) -> DataFrame:
    """All hash tables' signatures in ONE Arrow pass over the vectors:
    -> (id_col, t, bucket), one row per (vector, table).

    Table t's bucket is the sign pattern of the vector against the
    `RandomState(seed_base + t).normal(size=(num_planes, dim))` planes,
    bit j weighted 2^j — exactly the per-seed formulation the SQL oracles
    replay plane constants for. The input is scanned once instead of
    num_tables times and the downstream bucket-cap window / self-join runs
    once over (t, bucket) instead of per table — one einsum against the
    stacked (T x P x dim) plane tensor replaces T matmul passes. Output
    carries bare ids only."""
    planes = np.stack(
        [
            np.random.RandomState(seed_base + t).normal(size=(num_planes, dim))
            for t in range(num_tables)
        ]
    )
    weights = 1 << np.arange(num_planes, dtype=np.int64)
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = StructType(
        [
            id_field,
            StructField("t", LongType()),
            StructField("bucket", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            M = _stack(pdf[vec_col], dim)
            bits = np.einsum("tpd,nd->tnp", planes, M) > 0
            buckets = bits.astype(np.int64) @ weights  # (T, n)
            yield pd.DataFrame(
                {
                    id_col: np.tile(pdf[id_col].to_numpy(), len(planes)),
                    "t": np.repeat(
                        np.arange(len(planes), dtype=np.int64), n
                    ),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def train_ivf_centroids(
    embeddings: DataFrame,
    num_cells: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 5,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means centroids over (a sample of) the
    corpus. Deterministic given the seed, so the centroid matrix can be
    replayed into an oracle as constants. Uses pyspark.ml KMeans (the
    distributed trainer — at 100 TB train on a sample, e.g.
    `.sample(0.001)`); returns a (num_cells x dim) float64 matrix."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = embeddings.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    km = KMeans(k=num_cells, seed=seed, maxIter=max_iter, initMode="random")
    model = km.fit(train)
    return np.array(
        [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
    )


def assign_ivf_cells(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str,
    out: str = "cell",
    nprobe: int = 1,
) -> DataFrame:
    """Attach the nprobe nearest-centroid cell ids (array<int> exploded to
    one row per probed cell). Distance ranking uses the |c|² - 2·x·c form
    (|x|² is constant per row), computed as one numpy matmul per Arrow
    batch; ties break to the lowest cell id (argsort is stable)."""
    cnorm = (centroids * centroids).sum(axis=1)  # |c_k|²
    fields = list(df.schema.fields)
    schema = StructType(fields + [StructField(out, LongType())])
    cols = [f.name for f in fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = _stack(pdf[vec_col], centroids.shape[1])
            scores = cnorm[None, :] - 2.0 * (M @ centroids.T)
            order = np.argsort(scores, axis=1, kind="stable")[:, :nprobe]
            for j in range(order.shape[1]):
                # assign() copies: each yielded batch must own its column
                yield pdf.assign(**{out: order[:, j]})[cols + [out]]

    return df.mapInPandas(gen, schema)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed by nearest
    centroid (the inverted file); each query probes its nprobe nearest
    cells and re-ranks the union exactly by cosine.

    Scale shape: the corpus-side assignment is one matmul pass and the
    probe join is an equi-join on cell id — at 100 TB the inverted file is
    the partitioning (write the corpus bucketed BY cell); recall is tuned
    by nprobe, cost by num_cells. Pairs travel as bare ids; vectors join
    back once for the re-rank."""
    q_ids = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c_ids = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    cells = assign_ivf_cells(c_ids, centroids, "c_vec", nprobe=1).select(
        "cand_id", "cell"
    )
    probes = assign_ivf_cells(q_ids, centroids, "q_vec", nprobe=nprobe).select(
        "query_id", "cell"
    )
    pairs = (
        F.broadcast(probes)
        .join(cells, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .dropDuplicates(["query_id", "cand_id"])
    )
    enriched = pairs.join(F.broadcast(q_ids), "query_id").join(c_ids, "cand_id")
    scored = with_cosine(enriched, "q_vec", "c_vec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


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
    # all tables' signatures in one Arrow pass per side (one scan each, not
    # num_tables), one (t, bucket) equi-join instead of per-table
    # join+union — buckets bit-identical to the per-seed formulation
    qb = hyperplane_signatures_multi(
        q_ids, dim, num_planes, num_tables, id_col="query_id",
        vec_col="q_vec",
    )
    cb = hyperplane_signatures_multi(
        c_ids, dim, num_planes, num_tables, id_col="cand_id",
        vec_col="c_vec",
    )
    cands = (
        F.broadcast(qb)
        .join(cb, ["t", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .dropDuplicates(["query_id", "cand_id"])
    )
    enriched = cands.join(F.broadcast(q_ids), "query_id").join(c_ids, "cand_id")
    scored = with_cosine(enriched, "q_vec", "c_vec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
) -> DataFrame:
    """Recall@k of an approximate top-k against the exact top-k — the
    number that justifies (or indicts) every bucketed ANN config: "the
    LSH path keeps 97% of true neighbors at a tenth of the cost".
    Both inputs use the engine's top-k contract (query_id, cand_id,
    rank) from brute_force_topk / lsh_topk / ivf_topk.

    -> one row per query: (query_id, n_exact, n_hit, recall round 6),
    n_exact = min(k, exact candidates), n_hit = |approx ∩ exact| at
    rank <= k. Queries the approximate index returned NOTHING for
    still appear (recall 0) — silent-miss queries are the failure mode
    this exists to expose.

    Scale shape: two rank filters + ONE equi-join on (query_id,
    cand_id) + one groupBy — all keyed on the query; no windows, no
    collect.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    ex = exact.filter(F.col("rank") <= k).select("query_id", "cand_id")
    ap = approx.filter(F.col("rank") <= k).select(
        "query_id", F.col("cand_id").alias("_ac")
    )
    hits = (
        ex.join(
            ap,
            (ex["query_id"] == ap["query_id"]) & (ex["cand_id"] == ap["_ac"]),
            "left",
        )
        .select(ex["query_id"], F.col("_ac").isNotNull().cast("long").alias("_h"))
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.sum("_h").cast("long").alias("n_hit"),
        )
    )
    return hits.select(
        "query_id",
        "n_exact",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_exact"), 6).alias("recall"),
    )


def mmr_rerank(
    embeddings: DataFrame,
    query_vec_id: int,
    pool_size: int = 20,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein 1998)
    -> (round_idx, cand_id, relevance, mmr_score): from the exact
    top-`pool_size` candidates of one query, greedily pick k documents
    maximizing  lam·rel(c) − (1−lam)·max_{s∈S} sim(c, s)  — the
    diversity-aware rerank every retrieval pipeline runs between ANN
    and the context window. Round 0's mmr_score is the bare relevance
    (S is empty); ties break by ascending cand_id.

    Scale shape: the DISTRIBUTED parts are the corpus-sized top-pool
    retrieval (brute_force_topk — swap in the IVF/LSH variants at
    scale) and the pool×pool cosine matrix (pool_size², a few hundred
    rows). Only that bounded matrix is collected; the k-round selection
    is driver-side arithmetic over ≤ pool_size² floats by construction
    — the same bounded-driver-state argument as the FSA dictionary
    broadcast. Cosines come from the identical `with_cosine` numpy op
    the hash-checked knn_cosine query uses, so the DuckDB twin replays
    the whole cascade."""
    if not 1 <= k <= pool_size:
        raise ValueError(f"need 1 <= k <= pool_size, got k={k}")
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(id_col), F.col(vec_col)
    )
    pool = brute_force_topk(
        embeddings, q, k=pool_size, id_col=id_col, vec_col=vec_col
    ).select("cand_id", F.col("cosine").alias("relevance"))
    vecs = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("_v")
    )
    pool_vecs = pool.join(vecs, "cand_id")
    a = pool_vecs.select(
        F.col("cand_id").alias("a_id"),
        F.col("relevance"),
        F.col("_v").alias("a_vec"),
    )
    b = pool_vecs.select(
        F.col("cand_id").alias("b_id"), F.col("_v").alias("b_vec")
    )
    sims = with_cosine(
        a.crossJoin(F.broadcast(b)).filter(F.col("a_id") != F.col("b_id")),
        "a_vec",
        "b_vec",
        out="sim",
    ).select("a_id", "relevance", "b_id", "sim")

    # relevance comes from the POOL rows (so a single-candidate pool —
    # tiny corpus, pool_size=1 — still reranks; r4 advisory: sims is
    # empty when no a_id != b_id pair exists), sims only feeds the
    # diversity term with a 0.0 default.
    pool_rows = pool.collect()  # bounded: pool_size rows
    rows = sims.collect()  # bounded: pool_size * (pool_size - 1) rows
    # pre-round to 9 decimals before ANY comparison: the greedy cascade
    # amplifies last-ulp engine differences into different selections;
    # at 1e-9 granularity both engines see identical scores (the same
    # drift-elimination-at-the-root discipline as the fixed-point ops)
    rel = {r["cand_id"]: round(r["relevance"], 9) for r in pool_rows}
    sim = {}
    for r in rows:
        sim[(r["a_id"], r["b_id"])] = round(r["sim"], 9)
    selected: list = []
    chosen: list = []
    remaining = sorted(rel)  # ascending id = deterministic tie order
    for round_idx in range(k):
        best = None
        for c in remaining:
            if not selected:
                score = rel[c]
            else:
                score = lam * rel[c] - (1.0 - lam) * max(
                    sim.get((c, s), 0.0) for s in selected
                )
            if best is None or score > best[1]:
                best = (c, score)
        if best is None:
            break
        selected.append(best[0])
        remaining.remove(best[0])
        chosen.append((round_idx, best[0], rel[best[0]], best[1]))
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        chosen,
        "round_idx int, cand_id long, relevance double, mmr_score double",
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009) ->
    (id_col, rrf_score, fused_rank): combine any number of ranked lists
    by score(d) = Σ_lists 1/(k0 + rank_list(d)), the standard
    hybrid-retrieval merge (BM25 + dense, multi-query expansion) that
    needs no score calibration between systems — only ranks.

    Determinism discipline: the per-list terms are accumulated by a
    FIXED left-to-right chain of full outer joins (coalesce(t1,0) +
    coalesce(t2,0) + ...), not a groupBy sum whose float addition order
    would be partition-dependent — with >2 lists IEEE addition is not
    associative. Each list contributes at most one row per id, the
    join keys are the ids, and the fused rank breaks score ties by
    ascending id."""
    if not rankings:
        raise ValueError("rankings must be a non-empty list")
    acc = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(id_col).alias("_id"),
            (F.lit(1.0) / (F.lit(k0) + F.col(rank_col))).alias(f"_t{i}"),
        )
        acc = t if acc is None else acc.join(t, "_id", "full_outer")
    score = None
    for i in range(len(rankings)):
        term = F.coalesce(F.col(f"_t{i}"), F.lit(0.0))
        score = term if score is None else score + term
    # global rank window is deliberate: the input is a union of top-k
    # lists, so the relation is bounded by sum(list lengths), not corpus
    # size (same boundedness argument as kg_samples.entity_ranks)
    w = Window.orderBy(F.desc("rrf_score"), F.asc("_id"))
    return (
        acc.select(F.col("_id"), score.alias("rrf_score"))
        .withColumn("fused_rank", F.row_number().over(w))
        .select(
            F.col("_id").alias(id_col),
            F.round("rrf_score", 9).alias("rrf_score"),
            "fused_rank",
        )
    )
