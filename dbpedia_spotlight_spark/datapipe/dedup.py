"""Deduplication operators for large-scale training-data pipelines.

All variants avoid the O(n²) pairwise trap: candidate pairs only form inside
hash buckets (exact), LSH bands (MinHash), or hamming chunks (SimHash), so
the shuffles stay proportional to data size, not its square.

  - exact_duplicates / dedup_exact: hash-groupBy on a normalized text hash.
  - minhash_signatures + lsh_candidate_pairs + minhash_near_duplicates:
    shingle -> minhash (vectorized pandas UDF, numpy universal hashing) ->
    band -> bucket join -> verified Jaccard.
  - simhash_buckets: 64-bit simhash over token hashes; near-dup candidates
    share a 16-bit chunk (Hamming <= 3 over 4 chunks by pigeonhole).
  - ngram_jaccard_pairs: exact n-gram Jaccard verification for a candidate
    pair set (used as the verifier behind both LSH variants).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash (Python's hash() is process-salted — it
    would differ across executors)."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _norm_text_col(col):
    return F.lower(F.regexp_replace(col, r"\s+", " "))


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of exact duplicates (normalized whitespace+case).
    -> (text_hash, n_dups, doc_ids, keep_id)."""
    h = F.sha2(_norm_text_col(F.col(text_col)), 256).alias("text_hash")
    return (
        df.select(F.col(id_col).alias("doc_id"), h)
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized text."""
    h = F.sha2(_norm_text_col(F.col(text_col)), 256)
    w = F.row_number().over(Window.partitionBy(h).orderBy(F.col(id_col)))
    return df.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn")


def shingles(text: str, k: int = 5) -> set:
    toks = text.lower().split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """-> (doc_id, sig array<long>).

    Fully vectorized signature pass: per batch, each DISTINCT token is
    hashed once (memoized blake2b), shingle hashes are a k-step numpy
    rolling polynomial over the token-hash array (no shingle strings are
    ever built, no per-shingle Python hashing), and the minhash itself is
    the usual (num_hashes, n_shingles) multiply-shift min. The signature
    hash only drives LSH candidate generation — verification uses exact
    shingle Jaccard independently — so it need not match the verifier's
    shingle identity."""
    rng = np.random.RandomState(seed)
    # odd multipliers + offsets, uint64 wraparound multiply-shift hashing
    a = (rng.randint(1, 1 << 62, size=num_hashes).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_hashes).astype(np.uint64)
    B = np.uint64(0x9E3779B97F4A7C15)  # odd rolling-combine multiplier

    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok_memo: dict = {}

        def th(tok: str) -> int:
            h = tok_memo.get(tok)
            if h is None:
                h = stable_hash64(tok)
                tok_memo[tok] = h
            return h

        for pdf in batches:
            sigs = []
            with np.errstate(over="ignore"):
                for text in pdf[text_col]:
                    toks = (text or "").lower().split()
                    n = len(toks)
                    if n == 0:
                        sigs.append([0] * num_hashes)
                        continue
                    t = np.fromiter((th(w) for w in toks), np.uint64, count=n)
                    k = min(shingle_k, n)
                    m = n - k + 1
                    x = np.zeros(m, dtype=np.uint64)
                    for j in range(k):  # k numpy ops, not m*k Python ops
                        x = x * B + t[j : j + m]
                    x = np.unique(x)  # set semantics (distinct shingles)
                    hv = a[:, None] * x[None, :] + b[:, None]
                    sigs.append(
                        (hv.min(axis=1) >> np.uint64(1)).astype(np.int64).tolist()
                    )
            yield pd.DataFrame({"doc_id": pdf[id_col], "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(run, schema)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    max_bucket_size: int | None = 1000,
    log_dropped: bool = False,
) -> DataFrame:
    """Band the signatures, bucket-join within (band, band_hash).
    -> (a, b) candidate pairs, a < b.

    Mega-bucket guard: on a real web corpus, every empty/boilerplate
    document collapses to the same signature, so one (band, band_hash)
    bucket holds millions of rows and the self-join emits O(b²) pairs —
    the standard failure of LSH dedup at 100 TB. Buckets larger than
    max_bucket_size are dropped wholesale BEFORE the self-join (a window
    count over the same partitioning the join needs anyway — no extra
    shuffle). Dropping is deterministic (whole bucket or nothing), so an
    oracle can model it exactly; at the default cap a dropped bucket can
    only arise from >max_bucket_size mutually-near-identical docs, which
    exact-dedup upstream should have removed first. With log_dropped=True
    the dropped bucket/row counts are counted eagerly (one extra job) and
    logged at WARNING."""
    n = len(signatures.select("sig").first()["sig"])
    rows_per_band = n // bands
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice("sig", i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "band_hash"),
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "band_hash")
        sized = banded.withColumn("_bn", F.count("*").over(w))
        if log_dropped:
            import logging

            dropped = (
                sized.filter(F.col("_bn") > max_bucket_size)
                .agg(
                    F.countDistinct("band", "band_hash").alias("buckets"),
                    F.count("*").alias("rows"),
                )
                .first()
            )
            if dropped["rows"]:
                logging.getLogger(__name__).warning(
                    "lsh_candidate_pairs: dropped %d over-cap buckets "
                    "(%d rows > max_bucket_size=%d)",
                    dropped["buckets"], dropped["rows"], max_bucket_size,
                )
        banded = sized.filter(F.col("_bn") <= max_bucket_size).drop("_bn")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )


def shingles_col(text, k: int = 5):
    """Native (codegen) twin of `shingles()`: distinct k-token shingle array
    via transform(sequence, slice) — no per-row Python."""
    toks = F.filter(F.split(F.trim(F.lower(text)), r"\s+"), lambda w: w != "")
    n = F.size(toks)
    many = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, F.lit(k))),
        )
    )
    return (
        F.when(n == 0, F.array().cast("array<string>"))
        .when(n < k, F.array(F.concat_ws(" ", toks)))
        .otherwise(many)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify candidate pairs with exact shingle Jaccard.
    -> (a, b, jaccard) for pairs >= threshold.

    Scale: only docs that appear in a candidate pair are shingled (left-semi
    restriction — candidates are a tiny fraction of the corpus); shingle
    sets are built in one vectorized Arrow pass (shingle_hash_sets — the
    codegen-looking shingles_col is interpreted and ~20x slower), so the
    verify join shuffles array<long> instead of full shingle strings;
    hash-set Jaccard equals string-set Jaccard absent 64-bit collisions."""
    pair_ids = (
        pairs.select(F.col("a").alias("doc_id"))
        .unionByName(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sets_df = shingle_hash_sets(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .join(pair_ids, "doc_id", "left_semi"),
        text_col="_t",
        id_col="doc_id",
        shingle_k=shingle_k,
    )
    joined = (
        pairs.join(sets_df.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sets_df.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "sh_b"), "b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(0.0))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures -> bands -> candidate
    pairs (mega-buckets capped) -> exact-Jaccard verification."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    pairs = lsh_candidate_pairs(sigs, bands, max_bucket_size=max_bucket_size)
    return ngram_jaccard_pairs(df, pairs, text_col, id_col, shingle_k, threshold)


def connected_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Union near-dup pairs (a, b) into clusters: (doc_id, component) where
    component = min doc_id reachable. Min-label propagation with pointer
    doubling (each round also adopts the label *of* the current label, so
    chains collapse in O(log diameter) rounds, not O(diameter));
    localCheckpoint truncates lineage. The canonical keep decision (min id
    per component) then falls out of a groupBy. Raises RuntimeError if the
    loop exhausts max_iterations without converging — a silent early exit
    would split one cluster across several keep=true representatives."""
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
    )
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.min("src")).alias("component"))
        .withColumnRenamed("src", "doc_id")
    )
    converged = False
    for _ in range(max_iterations):
        # propagate: my new label = min(my label, labels of my neighbors,
        # label of my label) — the last term is the pointer-doubling hop
        neigh = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("component").alias("_n_comp"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_n_comp").alias("_min_neigh"))
            .withColumnRenamed("src", "doc_id")
        )
        hop = labels.select(
            F.col("doc_id").alias("component"),
            F.col("component").alias("_comp_of_comp"),
        )
        new_labels = (
            labels.join(neigh, "doc_id", "left")
            .join(hop, "component", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_min_neigh"), F.col("component")),
                    F.coalesce(F.col("_comp_of_comp"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; raise max_iterations"
        )
    return labels


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **minhash_kwargs,
) -> DataFrame:
    """Full near-dup dedup: MinHash-LSH pairs -> connected components ->
    keep the min-id representative per cluster.
    -> (doc_id, component, keep) with keep=false for rows to drop."""
    pairs = minhash_near_duplicates(df, text_col, id_col, **minhash_kwargs)
    comp = connected_components(pairs.select("a", "b"))
    keep_flag = F.col("doc_id") == F.col("component")
    clustered = comp.withColumn("keep", keep_flag)
    singletons = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comp.select("doc_id"), "doc_id", "left_anti")
        .withColumn("component", F.col("doc_id"))
        .withColumn("keep", F.lit(True))
    )
    return clustered.unionByName(singletons)


def simhash_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash per doc + pigeonhole chunk keys for near-dup bucketing.
    -> (doc_id, simhash_hex, chunk, chunk_val) — docs within Hamming
    distance < 4 share at least one of the 4 16-bit chunks.

    Pure column math, zero Python: per token, the 64-bit hash is the low
    16 hex chars of md5 (two 32-bit halves via conv). Tokens are exploded
    and the per-bit majority vote is one groupBy(doc_id) with 64 flat sum
    aggregates over bit tests — every expression stays inside whole-stage
    codegen (array higher-order functions would fall back to interpreted
    evaluation, measured ~100x slower), with map-side partial aggregation
    so the shuffle carries 64 longs per doc, not per token. Exactly
    reproducible in ANSI SQL."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda w: w != ""
    )
    # explode_outer keeps zero-token docs (their counters sum to 0)
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode_outer(toks).alias("_w")
    )
    m = F.md5("_w")
    tok = tok.select(
        "doc_id",
        F.conv(F.substring(m, 17, 8), 16, 10).cast("long").alias("_hi"),
        F.conv(F.substring(m, 25, 8), 16, 10).cast("long").alias("_lo"),
    )

    def vote(i: int):
        half = F.col("_lo") if i < 32 else F.col("_hi")
        bit = F.shiftright(half, i % 32).bitwiseAND(F.lit(1))
        return F.sum(
            F.when(F.col("_lo").isNull(), 0).otherwise(bit * 2 - 1)
        ).alias(f"_b{i}")

    acc = tok.groupBy("doc_id").agg(*[vote(i) for i in range(64)])

    def chunk_val(c: int):
        total = F.lit(0).cast("long")
        for j in range(16):
            total = total + F.when(
                F.col(f"_b{c * 16 + j}") > 0, F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return total

    cvs = F.array(*[chunk_val(c) for c in range(4)])
    hex_chunk = lambda arr, i: F.lpad(  # noqa: E731
        F.lower(F.hex(F.element_at(arr, i))), 4, "0"
    )
    out = acc.select("doc_id", cvs.alias("_cvs"))
    return out.select(
        "doc_id",
        F.concat(
            hex_chunk(F.col("_cvs"), 4),
            hex_chunk(F.col("_cvs"), 3),
            hex_chunk(F.col("_cvs"), 2),
            hex_chunk(F.col("_cvs"), 1),
        ).alias("simhash_hex"),
        F.posexplode("_cvs").alias("chunk", "chunk_val"),
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    num_planes: int = 12,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 2_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH buckets
    (num_tables independent tables), candidate pairs only inside a bucket,
    exact numpy-cosine verification at `threshold`.
    -> (a, b, cosine), a < b.

    Scale shape mirrors minhash LSH: the bucket self-join and the pair
    dedupe carry bare ids; vectors are joined back exactly once for the
    verify; buckets above max_bucket_size are dropped whole (the all-zeros
    embedding of empty docs is the classic mega-bucket). Recall is the
    standard LSH trade: P(candidate) = 1-(1-(1-θ/π)^planes)^tables for
    angle θ — tune planes/tables to the threshold."""
    from dbpedia_spotlight_spark.datapipe.similarity import (
        hyperplane_signatures_multi,
        with_cosine,
    )

    ids = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    # every table's signature in one Arrow pass (one scan, not num_tables),
    # then ONE (t, bucket) window for the cap and ONE self-join — per-table
    # buckets are bit-identical to the per-seed formulation the oracle
    # replays
    sig = hyperplane_signatures_multi(
        ids, dim, num_planes, num_tables, seed_base=42
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("t", "bucket")
        sig = (
            sig.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    # both sides of the self-join read the Arrow signature pass — persist
    # so the numpy matmul runs once, not twice
    sig = sig.persist()
    x, y = sig.alias("x"), sig.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.t") == F.col("y.t"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    enriched = pairs.join(
        ids.select(F.col("vec_id").alias("a"), F.col("v").alias("va")), "a"
    ).join(ids.select(F.col("vec_id").alias("b"), F.col("v").alias("vb")), "b")
    return (
        with_cosine(enriched, "va", "vb")
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("a", "b", "cosine")
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 10_000,
    split_bits: int = 16,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540): cluster
    embeddings with a coarse k-means quantizer, then inside each cluster
    mark any item whose cosine similarity to a LOWER-id cluster-mate meets
    `threshold` as a semantic duplicate. The paper keeps one exemplar per
    near-dup group; we pin the deterministic keep rule "lowest id wins"
    (the paper's choices — random / farthest-from-centroid — are
    order-dependent) so the result is bit-stable and oracle-checkable.

    centroids: (k x dim) float64 numpy matrix — a FIXED quantizer (train
    one with similarity.train_ivf_centroids, or replay constants so an
    oracle can recompute cell assignment).
    -> (vec_id, cell, keep: boolean) — one row per input embedding.

    100-TB shape: cell assignment is one numpy matmul pass (mapInPandas);
    candidate pairs only form inside a cell (the cross product is per
    cluster, never global) and travel as bare ids; vectors join back once
    for the cosine verify. k controls the cluster size distribution — the
    paper uses k~50k at web scale, so each cluster is ~corpus/k.

    Over-cap cells (dead-centroid pathologies, all-zero embedding clumps)
    are NOT exempted (the round-3 finding: exempting silently skips dedup
    for exactly the densest regions) — they are recursively SPLIT with a
    within-cell hyperplane-LSH sub-quantizer: a cell of size c gets
    d = ceil(log2(c / cap)) deterministic sign bits (seeded planes, one
    Arrow pass shared by every cell), so similar vectors stay together
    and expected sub-cell size <= cap. Sub-cells still over cap after
    split_bits bits are sign-identical clumps (in practice byte-identical
    vectors — no similarity-preserving scheme can separate them); for
    those, candidates degrade to (group-min-id, member) star pairs — O(c)
    not O(c²), which still catches the identical-clump pathology exactly
    (every member IS a dup of the min id). Total candidate pairs are
    therefore <= sum(c_i <= cap: c_i²) + sum(over-cap clumps: c_i):
    linear in the corpus for fixed cap. Sub-splitting costs recall only
    across sub-cell boundaries inside over-cap cells — under-cap cells
    (every cell at the paper's sizing) are bit-identical to the unsplit
    form, which is what the sf-scale oracle replays."""
    from dbpedia_spotlight_spark.datapipe.similarity import (
        assign_ivf_cells,
        hyperplane_signatures_multi,
        with_cosine,
    )

    ids = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    cells = assign_ivf_cells(ids, centroids, "v", nprobe=1).select(
        "vec_id", "cell"
    )
    if max_cluster_size is not None:
        dim = int(np.asarray(centroids).shape[1])
        sig = hyperplane_signatures_multi(
            ids, dim, split_bits, 1, seed_base=1042
        ).select("vec_id", F.col("bucket").alias("_sig"))
        wc = Window.partitionBy("cell")
        sized = cells.join(sig, "vec_id").withColumn(
            "_cn", F.count("*").over(wc)
        )
        depth = F.when(
            F.col("_cn") > max_cluster_size,
            F.least(
                F.lit(split_bits),
                F.ceil(F.log2(F.col("_cn") / F.lit(max_cluster_size))),
            ),
        ).otherwise(F.lit(0)).cast("int")
        sub = (
            sized.withColumn("_d", depth)
            .withColumn(
                "sub",
                F.expr(
                    f"shiftrightunsigned(_sig, {split_bits} - _d)"
                ),
            )
            .select("vec_id", "cell", "sub")
        )
        wg = Window.partitionBy("cell", "sub")
        grouped = sub.withColumn("_gn", F.count("*").over(wg))
        under = grouped.filter(
            F.col("_gn") <= max_cluster_size
        ).select("vec_id", "cell", "sub")
        over = grouped.filter(F.col("_gn") > max_cluster_size)
        x, y = under.alias("x"), under.alias("y")
        pairs = x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.sub") == F.col("y.sub"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        ).select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        star = (
            over.withColumn("_min", F.min("vec_id").over(wg))
            .filter(F.col("vec_id") != F.col("_min"))
            .select(
                F.col("_min").alias("a"), F.col("vec_id").alias("b")
            )
        )
        pairs = pairs.unionByName(star)
    else:
        x, y = cells.alias("x"), cells.alias("y")
        pairs = x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        ).select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
    enriched = pairs.join(
        ids.select(F.col("vec_id").alias("a"), F.col("v").alias("va")), "a"
    ).join(ids.select(F.col("vec_id").alias("b"), F.col("v").alias("vb")), "b")
    dropped = (
        with_cosine(enriched, "va", "vb")
        .filter(F.col("cosine") >= F.lit(threshold))
        .select(F.col("b").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return cells.join(dropped, "vec_id", "left").select(
        "vec_id", "cell", F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep")
    )


def simhash_candidate_pairs(
    buckets: DataFrame, max_bucket_size: int | None = 1000
) -> DataFrame:
    """Near-dup candidate pairs from simhash_buckets output: docs sharing
    any (chunk, chunk_val) 16-bit bucket (pigeonhole: covers all pairs at
    Hamming distance < 4). -> (a, b) pairs, a < b, with the Hamming
    distance between the two 64-bit simhashes attached.

    Same mega-bucket guard as lsh_candidate_pairs: every empty document
    simhashes to 0, so chunk buckets skew pathologically on web corpora —
    buckets over max_bucket_size are dropped (deterministically, whole
    bucket) before the self-join."""
    b = buckets.select("doc_id", "simhash_hex", "chunk", "chunk_val")
    if max_bucket_size is not None:
        w = Window.partitionBy("chunk", "chunk_val")
        b = (
            b.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.chunk_val") == F.col("y.chunk_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.simhash_hex").alias("_ha"),
            F.col("y.simhash_hex").alias("_hb"),
        )
        .distinct()
    )
    # Hamming distance = popcount of XOR of the two 64-bit values: split hex
    # into two 32-bit halves (conv of 16 hex chars overflows long), XOR, and
    # count bits via the bin() string — all codegen, no UDF.
    def half(col, start):
        return F.conv(F.substring(col, start, 8), 16, 10).cast("long")

    xor_hi = half(F.col("_ha"), 1).bitwiseXOR(half(F.col("_hb"), 1))
    xor_lo = half(F.col("_ha"), 9).bitwiseXOR(half(F.col("_hb"), 9))
    popcnt = lambda c: F.length(F.regexp_replace(F.bin(c), "0", ""))  # noqa: E731
    return pairs.select(
        "a", "b", (popcnt(xor_hi) + popcnt(xor_lo)).alias("hamming")
    )


def shingle_hash_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
) -> DataFrame:
    """-> (doc_id, sh array<long>): each doc's DISTINCT k-token shingle set
    as 64-bit hashes, via the same vectorized pass as minhash_signatures
    (memoized token hash + k-step numpy rolling polynomial — no shingle
    strings, no per-shingle Python hashing). The codegen-looking
    shingles_col alternative is in fact ~20x slower: nested array
    higher-order functions (transform over sequence+slice+concat_ws)
    evaluate INTERPRETED, the same trap BENCH.md measured on simhash.
    Hash-set Jaccard equals string-set Jaccard absent 64-bit collisions."""
    B = np.uint64(0x9E3779B97F4A7C15)
    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("sh", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok_memo: dict = {}

        def th(tok: str) -> int:
            h = tok_memo.get(tok)
            if h is None:
                h = stable_hash64(tok)
                tok_memo[tok] = h
            return h

        for pdf in batches:
            out = []
            with np.errstate(over="ignore"):
                for text in pdf[text_col]:
                    toks = (text or "").lower().split()
                    n = len(toks)
                    if n == 0:
                        out.append([])
                        continue
                    t = np.fromiter((th(w) for w in toks), np.uint64, count=n)
                    k = min(shingle_k, n)
                    m = n - k + 1
                    x = np.zeros(m, dtype=np.uint64)
                    for j in range(k):
                        x = x * B + t[j : j + m]
                    out.append(np.unique(x).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "sh": out})

    return df.select(id_col, text_col).mapInPandas(run, schema)


def prefix_filter_jaccard_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
    max_bucket: int | None = 1000,
    log_dropped: bool = False,
) -> DataFrame:
    """Exact n-gram-Jaccard self-join via prefix filtering (the classic
    set-similarity join of Bayardo/Vernica) -> (a, b, jaccard) for all
    pairs with shingle Jaccard >= threshold. Unlike MinHash+LSH this is
    LOSSLESS: output == brute-force all-pairs, but candidates form only on
    shared *prefix* shingles.

    Shape for 100 TB: one vectorized Arrow pass hashes each doc's shingle
    set (shingle_hash_sets); shingles are ranked globally rare-first
    (explode -> count -> join), each doc keeps the |S| - ceil(t*|S|) + 1
    rarest as its prefix, and the candidate self-join keys on prefix
    shingles — common shingles never create buckets by construction, and a
    size filter (t <= |A|/|B| <= 1/t) prunes cross-size pairs. The exact
    verify then joins the already-built hash sets back (no re-shingling)
    and intersects natively. Degenerate corpora (thousands of
    byte-identical docs) still share rare prefixes, and their real
    O(n^2) pair OUTPUT is the problem, not the join — so max_bucket
    defaults to a finite cap (prefix keys with more docs than the cap
    are dropped whole, deterministically; set log_dropped=True to count
    them). Below the cap the join is exactly lossless; a corpus that
    trips the cap should run exact_duplicates first. max_bucket=None
    restores the unguarded lossless form."""
    sets_df = shingle_hash_sets(
        df, text_col=text_col, id_col=id_col, shingle_k=shingle_k
    ).filter(F.size("sh") > 0)
    # Four downstream subtrees consume the Arrow shingle pass (frequency
    # rank, prefix build, and both sides of the verify join); without a
    # materialization Spark recomputes the Python pass for each. persist,
    # not localCheckpoint: lazy, spills to disk, and evicts under pressure.
    sets_df = sets_df.persist()
    ex = sets_df.select("doc_id", F.explode("sh").alias("s"))
    freq = ex.groupBy("s").agg(F.count("*").alias("c"))
    ranked = (
        ex.join(freq, "s")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("c", "s"))).alias("arr"))
        .withColumn("n", F.size("arr"))
        .withColumn(
            "plen",
            (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int"),
        )
    )
    prefix = ranked.select(
        "doc_id", "n", F.explode(F.slice("arr", 1, F.col("plen"))).alias("ps")
    ).select("doc_id", "n", F.col("ps.s").alias("s"))
    if max_bucket is not None:
        sizes = prefix.groupBy("s").agg(F.count("*").alias("_bn"))
        if log_dropped:
            import logging

            dropped = sizes.filter(F.col("_bn") > max_bucket).count()
            if dropped:
                logging.getLogger(__name__).warning(
                    "prefix_filter_jaccard_join: dropping %d prefix keys "
                    "over max_bucket=%d", dropped, max_bucket,
                )
        prefix = (
            prefix.join(sizes, "s").filter(F.col("_bn") <= max_bucket).drop("_bn")
        )
    x, y = prefix.alias("x"), prefix.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.s") == F.col("y.s"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & (F.col("x.n") * threshold <= F.col("y.n"))
            & (F.col("y.n") * threshold <= F.col("x.n")),
        )
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    joined = (
        cands.join(
            sets_df.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")),
            "a",
        ).join(
            sets_df.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")),
            "b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(0.0))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def shingle_hash_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
) -> DataFrame:
    """-> (doc_id, pos, h): EVERY k-token shingle with its 0-based start
    token index — NOT deduplicated, because position identity is the whole
    point (exact-substring dedup needs to know *where* a duplicated run
    sits, not just that it exists). Same vectorized rolling-polynomial
    pass as shingle_hash_sets (memoized token hashes, one numpy fold per
    doc, no shingle strings); docs shorter than k emit nothing — a run
    shorter than the window cannot certify a duplicated substring."""
    B = np.uint64(0x9E3779B97F4A7C15)
    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("pos", T.IntegerType()),
            T.StructField("h", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok_memo: dict = {}

        def th(tok: str) -> int:
            h = tok_memo.get(tok)
            if h is None:
                h = stable_hash64(tok)
                tok_memo[tok] = h
            return h

        for pdf in batches:
            ids, poss, hs = [], [], []
            with np.errstate(over="ignore"):
                for did, text in zip(pdf[id_col], pdf[text_col]):
                    toks = (text or "").lower().split()
                    n = len(toks)
                    if n < shingle_k:
                        continue
                    t = np.fromiter((th(w) for w in toks), np.uint64, count=n)
                    m = n - shingle_k + 1
                    x = np.zeros(m, dtype=np.uint64)
                    for j in range(shingle_k):
                        x = x * B + t[j : j + m]
                    ids.append(np.full(m, did))
                    poss.append(np.arange(m, dtype=np.int32))
                    hs.append(x.astype(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "h": np.concatenate(hs),
                    }
                )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def duplicate_spans(
    df: DataFrame,
    shingle_k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-substring detection (the span-level member of the
    dedup family — whole-doc exact/minhash/simhash miss a boilerplate
    paragraph pasted into otherwise-unique pages). A token position is
    covered when some k-gram through it occurs >= min_count times in the
    WHOLE corpus (within-doc repeats count too); overlapping or contiguous
    covered windows merge into maximal spans.

    -> (doc_id, span_start, span_end, span_tokens): 0-based inclusive
    token-index spans of duplicated text per document.

    Shape at 100 TB: the corpus is scanned once (one Arrow pass emits
    (doc_id, pos, hash64) — longs, never shingle strings); the duplicate
    set is a groupBy on the hash (uniform by construction, map-side
    partial agg) and comes back as a shuffle semi-join on the same key —
    no broadcast assumption, the dup set at corpus scale is itself huge.
    The island merge is a per-document window (documents are bounded), and
    the k-gram certificate means a duplicated run of length L >= k is
    found in full while runs < k are ignored — exactly the suffix-array
    exact-substring dedup contract (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") at 1/k-th
    the index size. Hash-equality == substring-equality absent 64-bit
    collisions (same caveat as every shingle operator here)."""
    grams = shingle_hash_positions(df, text_col, id_col, shingle_k)
    dup = (
        grams.groupBy("h")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("h")
    )
    hits = grams.join(dup, "h", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "_new",
        F.when(F.col("pos") - F.lag("pos").over(w) > shingle_k, 1).otherwise(0),
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("doc_id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(shingle_k - 1)).alias("span_end"),
        )
        .withColumn(
            "span_tokens", F.col("span_end") - F.col("span_start") + F.lit(1)
        )
        .select("doc_id", "span_start", "span_end", "span_tokens")
    )


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "clean_text",
) -> DataFrame:
    """Cut the duplicate_spans() token ranges out of each document
    -> (id_col, out_col, removed_tokens). Documents with no spans pass
    through untouched (removed_tokens = 0).

    One Arrow pass over docs ⋈ collected-spans (left join — span lists are
    per-doc small, the join carries (start, end) int pairs); token split is
    byte-identical to shingle_hash_positions' so indices line up."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = df.select(id_col, text_col).join(per_doc, id_col, "left")
    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField(out_col, T.StringType()),
            T.StructField("removed_tokens", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, removed = [], []
            for text, sp in zip(pdf[text_col], pdf["_spans"]):
                toks = (text or "").lower().split()
                if sp is None or (hasattr(sp, "__len__") and len(sp) == 0):
                    outs.append(" ".join(toks))
                    removed.append(0)
                    continue
                drop = np.zeros(len(toks), dtype=bool)
                for rng in sp:
                    s, e = rng["span_start"], rng["span_end"]
                    drop[s : e + 1] = True
                outs.append(" ".join(t for t, d in zip(toks, drop) if not d))
                removed.append(int(drop.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    out_col: outs,
                    "removed_tokens": np.asarray(removed, dtype=np.int32),
                }
            )

    return joined.mapInPandas(run, schema)


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    shingle_k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination -> (id_col, n_hit): every training
    document that shares at least one k-token shingle with the eval
    corpus, with the count of its distinct shingles that hit. The
    standard pre-training hygiene pass (eval n-grams must not leak into
    the training set).

    Shape at 100 TB: both sides shingle through the same vectorized
    rolling-polynomial pass as minhash (shingle_hash_sets — hashes, not
    strings, so the probe join carries longs); the eval n-gram set is
    tiny relative to the corpus (benchmarks are millions of n-grams, not
    billions) and is broadcast, so the training side is scanned once
    with a map-side hash probe — no shuffle of the corpus at all.
    Hash-set membership equals string-set membership absent 64-bit
    collisions (the same equivalence the Jaccard oracle relies on)."""
    tr = shingle_hash_sets(train, text_col, id_col, shingle_k)
    ev = shingle_hash_sets(eval_df, text_col, id_col, shingle_k)
    ev_h = ev.select(F.explode("sh").alias("_h")).distinct()
    tr_h = tr.select(F.col("doc_id").alias(id_col), F.explode("sh").alias("_h"))
    return (
        tr_h.join(F.broadcast(ev_h), "_h")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hit"))
    )


def exact_hash_index(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Compact (text_hash) index of a corpus snapshot — at 100 TB this is
    persisted as its own table at ingest time (32 bytes/doc) so each new
    batch joins the index instead of re-hashing the whole corpus."""
    return df.select(
        F.sha2(_norm_text_col(F.col(text_col)), 256).alias("text_hash")
    ).distinct()


def incremental_exact_dedup(
    new: DataFrame,
    base_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingest-time dedup of a NEW batch against an existing corpus
    snapshot -> (doc_id, keep, reason): reason 'base' when the normalized
    text already exists in the base index (the base copy is canonical),
    'batch' for non-first duplicates inside the batch (min id kept),
    null (keep=true) otherwise.

    Scale shape: the batch is hashed once; the base join is an equi-join
    on the 256-bit hash (uniform key — no skew by construction) against
    the compact index, broadcast when it fits; the batch-internal
    canonical pick is one window per hash. The base corpus itself is
    never re-read."""
    h = F.sha2(_norm_text_col(F.col(text_col)), 256)
    nh = new.select(F.col(id_col).alias("doc_id"), h.alias("text_hash"))
    first = Window.partitionBy("text_hash")
    nh = nh.withColumn("first_id", F.min("doc_id").over(first))
    joined = nh.join(
        base_index.select("text_hash").distinct().withColumn(
            "_in_base", F.lit(True)
        ),
        "text_hash",
        "left",
    )
    reason = F.when(F.col("_in_base"), F.lit("base")).when(
        F.col("doc_id") != F.col("first_id"), F.lit("batch")
    )
    return joined.select(
        "doc_id", reason.isNull().alias("keep"), reason.alias("reason")
    )


def dedup_audit(
    approx_pairs: DataFrame,
    exact_pairs: DataFrame,
) -> DataFrame:
    """Pair-level audit of an approximate dedup path against exact
    ground truth (the ann_recall methodology applied to near-dup
    detection): how many true duplicate pairs did the banded/capped
    path find (recall), and how many of its reported pairs are real
    (precision)? At test scale LSH-with-verification should hit
    1.0/1.0; at 100 TB the bucket caps trade recall for boundedness —
    this is the operator that MEASURES that trade instead of assuming
    it.

    Both inputs are (a, b, ...) pair tables; orientation is
    canonicalized internally. -> one row: (n_exact, n_approx, n_hit,
    recall round 6, precision round 6); empty sides yield NULL rates
    rather than dividing by zero.

    Scale shape: two distinct canonicalizations + ONE equi-join on
    the pair key + scalar aggregates. Nothing quadratic.
    """

    def canon(df):
        return df.select(
            F.least(F.col("a"), F.col("b")).alias("a"),
            F.greatest(F.col("a"), F.col("b")).alias("b"),
        ).distinct()

    ap, ex = canon(approx_pairs), canon(exact_pairs)
    hit = ex.join(ap, ["a", "b"], "left_semi")
    n_ex = ex.agg(F.count("*").alias("n_exact"))
    n_ap = ap.agg(F.count("*").alias("n_approx"))
    n_hit = hit.agg(F.count("*").alias("n_hit"))
    row = n_ex.crossJoin(n_ap).crossJoin(n_hit)
    return row.select(
        "n_exact",
        "n_approx",
        "n_hit",
        F.round(
            F.when(F.col("n_exact") > 0, F.col("n_hit") / F.col("n_exact")),
            6,
        ).alias("recall"),
        F.round(
            F.when(F.col("n_approx") > 0, F.col("n_hit") / F.col("n_approx")),
            6,
        ).alias("precision"),
    )
