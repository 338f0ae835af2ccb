"""DSIR importance resampling: hashed-n-gram featurization, log-ratio
weights, deterministic Gumbel-top-k selection (datapipe/dsir.py)."""

import math

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.datapipe.dsir import (
    bucket_log_ratio,
    dsir_select,
    gumbel_topk,
    hashed_ngram_features,
    importance_weights,
)


@pytest.fixture(scope="module")
def corpora(spark):
    # target talks about physics, raw mixes physics-ish and cooking docs
    target = spark.createDataFrame(
        [
            (100, "quantum field theory and particle physics"),
            (101, "particle physics experiments probe quantum fields"),
        ],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quantum physics and particle experiments"),
            (2, "slow roasted garlic chicken recipe with butter"),
            (3, "particle physics quantum theory notes"),
            (4, "bake the cake with sugar butter and flour"),
            (5, "chop the garlic then add butter to the pan"),
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_featurize_counts_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    feats = hashed_ngram_features(df, buckets=1 << 20)
    # grams: a, b, a, "a b", "b a" -> 4 distinct buckets (a twice)
    rows = feats.collect()
    assert sum(r.c for r in rows) == 5
    assert sorted(r.c for r in rows) == [1, 1, 1, 2]
    assert all(0 <= r.bucket < (1 << 20) for r in rows)


def test_log_ratio_fixed_vocab_smoothing(spark, corpora):
    raw, target = corpora
    rf = hashed_ngram_features(raw, buckets=4096)
    tf = hashed_ngram_features(target, buckets=4096)
    ratio = bucket_log_ratio(rf, tf, 4096).collect()
    # every raw-observed bucket present exactly once
    assert len(ratio) == rf.select("bucket").distinct().count()
    # buckets absent from target all share the same smoothed floor term:
    # logr = ln(1/(Np+B)) - ln((nq+1)/(Nq+B)); check one by hand
    nq_tot = rf.agg(F.sum("c")).collect()[0][0]
    np_tot = tf.agg(F.sum("c")).collect()[0][0]
    raw_only = {
        r.bucket: r.nq
        for r in rf.groupBy("bucket").agg(F.sum("c").alias("nq")).collect()
    }
    tgt_buckets = {r.bucket for r in tf.select("bucket").distinct().collect()}
    for r in ratio:
        if r.bucket not in tgt_buckets:
            expect = math.log(1.0 / (np_tot + 4096)) - math.log(
                (raw_only[r.bucket] + 1.0) / (nq_tot + 4096)
            )
            assert r.logr == pytest.approx(expect, abs=1e-12)


def test_weights_rank_target_like_docs_higher(spark, corpora):
    raw, target = corpora
    rf = hashed_ngram_features(raw, buckets=4096)
    tf = hashed_ngram_features(target, buckets=4096)
    w = {
        r.doc_id: r.logw
        for r in importance_weights(
            rf, bucket_log_ratio(rf, tf, 4096)
        ).collect()
    }
    assert set(w) == {1, 2, 3, 4, 5}
    # physics docs (1, 3) must outweigh every cooking doc (2, 4, 5)
    assert min(w[1], w[3]) > max(w[2], w[4], w[5])


def test_gumbel_topk_deterministic_and_sized(spark, corpora):
    raw, target = corpora
    out1 = dsir_select(raw, target, k=3, buckets=4096).collect()
    out2 = dsir_select(raw, target, k=3, buckets=4096).collect()
    assert len(out1) == 3
    assert [r.doc_id for r in out1] == [r.doc_id for r in out2]
    assert [r.key for r in out1] == sorted(
        (r.key for r in out1), reverse=True
    )


def test_gumbel_noise_matches_formula(spark):
    w = spark.createDataFrame(
        [(7, 3, 0.0)], "doc_id long, n_grams long, logw double"
    )
    row = gumbel_topk(w, k=1).collect()[0]
    import hashlib

    tail = int(hashlib.md5(b"7").hexdigest()[24:32], 16)
    u = (tail + 1.0) / 4294967297.0
    assert row.key == pytest.approx(-math.log(-math.log(u)), abs=1e-12)


def test_topk_plan_shape(spark, corpora):
    raw, target = corpora
    plan = dsir_select(raw, target, k=3, buckets=4096)._jdf.queryExecution(
    ).executedPlan().toString()
    # orderBy+limit must compile to per-partition heaps, not a global sort
    assert "TakeOrderedAndProject" in plan
    # the ratio dim joins broadcast — the corpus side never shuffles for it
    assert "BroadcastHashJoin" in plan
