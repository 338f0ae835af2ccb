"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
distribution looks like a target corpus.

Pipeline (all JVM codegen, no Python in the hot path):

1. `hashed_ngram_features` — each document's unigrams + bigrams hashed
   into a fixed number of buckets (the paper's hashed n-gram features);
   pre-aggregated to one (doc, bucket, count) row per distinct bucket.
2. `bucket_log_ratio` — bag-of-buckets LMs for the target (p) and raw
   (q) corpora with add-one smoothing over the FIXED bucket vocabulary
   B (absent buckets still carry probability 1/(N+B)), joined into one
   (bucket, logr = ln p - ln q) dim table.
3. `importance_weights` — per-doc log importance weight
   logw = Σ_buckets c · logr (the doc's log-likelihood ratio).
4. `gumbel_topk` — sampling WITHOUT replacement via the Gumbel-top-k
   trick: key = logw + Gumbel noise, take the k largest. The noise is
   deterministic (md5(doc_id) → uniform → -ln(-ln(u))), so the whole
   selection is reproducible across runs, cluster sizes, and engines —
   the same md5-replay recipe as `packing.stratified_sample`.

Scale shape at 100 TB: featurize is explode + map-side-combined groupBy
(no shuffle before the partial agg); both LMs are bucket-keyed aggs of
at most B rows (B ~ 10⁴, broadcastable); the weight join probes a tiny
broadcast dim; top-k is TakeOrderedAndProject (per-partition heaps, no
global sort). Nothing collects to the driver.

No counterpart in the reference repo (it has no training-data selection
stage); the feature/weight math follows the published DSIR recipe.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .textstats import words_col

# md5-tail → 32-bit uint, the repo's cross-engine deterministic hash
# (identical bits in DuckDB: ('0x' || substr(md5(x), 25, 8))::BIGINT).
def _md5_tail(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 25, 8), 16, 10).cast("long")


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
) -> DataFrame:
    """(id, bucket, c): unigram + bigram counts hashed into `buckets`.

    Bigrams come from posexplode + element_at on the carried words array
    — pure codegen, no interpreted zip_with lambda and no self-join."""
    ex = df.select(
        F.col(id_col), words_col(F.col(text_col)).alias("ws")
    ).select(id_col, "ws", F.posexplode("ws").alias("pos", "tok"))
    uni = ex.select(F.col(id_col), F.col("tok").alias("gram"))
    bi = ex.where(F.col("pos") < F.size("ws") - 1).select(
        F.col(id_col),
        F.concat_ws(" ", F.col("tok"), F.expr("ws[pos + 1]")).alias("gram"),
    )
    return (
        uni.unionByName(bi)
        .select(
            F.col(id_col),
            F.pmod(_md5_tail(F.col("gram")), F.lit(buckets)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("c"))
    )


def bucket_log_ratio(
    raw_feats: DataFrame, target_feats: DataFrame, buckets: int
) -> DataFrame:
    """(bucket, logr): ln p_target(bucket) − ln p_raw(bucket), add-one
    smoothed over the fixed bucket vocabulary. Keyed on every bucket the
    raw corpus observes (a doc weight only ever probes those); target
    buckets unseen in raw would multiply no document and are dropped."""
    qn = raw_feats.groupBy("bucket").agg(F.sum("c").alias("nq"))
    pn = target_feats.groupBy("bucket").agg(F.sum("c").alias("np"))
    qt = qn.agg(F.sum("nq").cast("double").alias("_Nq"))
    pt = pn.agg(F.coalesce(F.sum("np"), F.lit(0)).cast("double").alias("_Np"))
    b = float(buckets)
    return (
        qn.join(pn, "bucket", "left")
        .crossJoin(F.broadcast(qt))
        .crossJoin(F.broadcast(pt))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("np"), F.lit(0)) + 1.0) / (F.col("_Np") + b))
                - F.log((F.col("nq") + 1.0) / (F.col("_Nq") + b))
            ).alias("logr"),
        )
    )


def importance_weights(
    raw_feats: DataFrame, log_ratio: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_grams, logw): per-document log importance weight — the sum
    over the doc's hashed-gram counts of the bucket log-ratio. The ratio
    dim is ≤ `buckets` rows → broadcast join, no shuffle of the corpus."""
    return (
        raw_feats.join(F.broadcast(log_ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("logr")).alias("logw"),
        )
    )


def gumbel_key(logw: Column, id_col: Column) -> Column:
    """logw + Gumbel(0,1) noise, noise replayed from md5(id): u =
    (md5_tail(id)+1) / (2³²+1) ∈ (0,1), g = −ln(−ln u). Gumbel-top-k on
    these keys == sampling k docs without replacement with probability
    ∝ exp(logw) (Gumbel-max trick)."""
    u = (_md5_tail(id_col.cast("string")) + 1.0) / 4294967297.0
    return logw + (-F.log(-F.log(u)))


def gumbel_topk(
    weights: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Top-k docs by gumbel key (id, n_grams, logw, key) — orderBy+limit
    compiles to TakeOrderedAndProject: per-partition heaps of size k,
    never a global sort."""
    keyed = weights.select(
        id_col,
        "n_grams",
        "logw",
        gumbel_key(F.col("logw"), F.col(id_col)).alias("key"),
    )
    return keyed.orderBy(F.desc("key"), F.col(id_col)).limit(k)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
) -> DataFrame:
    """End-to-end DSIR: featurize both corpora, build the log-ratio dim,
    weight every raw doc, Gumbel-top-k sample. Returns (id, n_grams,
    logw, key) for the k selected docs."""
    raw_feats = hashed_ngram_features(raw, text_col, id_col, buckets)
    tgt_feats = hashed_ngram_features(target, text_col, id_col, buckets)
    ratio = bucket_log_ratio(raw_feats, tgt_feats, buckets)
    return gumbel_topk(importance_weights(raw_feats, ratio, id_col), k, id_col)
