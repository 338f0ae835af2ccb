"""Evaluation — SURVEY.md §3.3: spotter P/R, linking P/R, accuracy/MRR.

Reference formulas:
  - spotter P/R over exact (sf, offset) matches:
      eval/.../evaluation/EvalSpotter.scala:113-133
  - disambiguation accuracy / MRR / not-found:
      eval/.../evaluation/EvaluateParagraphDisambiguator.scala:93-101,
      rank semantics eval/.../model/DisambiguationResult.scala:12-34
  - gold-side canonicalization before comparing:
      index/.../filter/occurrences/RedirectResolveFilter.scala:27-48

All metrics are three aggregates over a predicted ⟕ gold join — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.closure import redirect_closure, resolve_uris


def resolve_gold(gold: DataFrame, redirects: DataFrame | None) -> DataFrame:
    if redirects is None:
        return gold
    closure = redirect_closure(redirects)
    return resolve_uris(gold, closure, "uri")


def spotter_metrics(spots: DataFrame, gold: DataFrame) -> dict:
    """Exact (doc_id, offset, surface_form) match (EvalSpotter.scala:122-133)."""
    p = spots.select("doc_id", "offset", "surface_form").distinct()
    g = gold.select("doc_id", "offset", "surface_form").distinct()
    tp = p.join(g, ["doc_id", "offset", "surface_form"], "inner").count()
    np_, ng = p.count(), g.count()
    return {
        "precision": tp / np_ if np_ else 0.0,
        "recall": tp / ng if ng else 0.0,
        "tp": tp,
        "predicted": np_,
        "gold": ng,
    }


def linking_metrics(
    annotations: DataFrame, gold: DataFrame, redirects: DataFrame | None = None
) -> dict:
    """Triple-level P/R: exact (doc_id, offset, surface_form, uri) match after
    canonicalizing gold URIs. This is the BASELINE.json P/R>=0.95 gate."""
    g = resolve_gold(gold, redirects).select(
        "doc_id", "offset", "surface_form", "uri"
    ).distinct()
    p = annotations.select("doc_id", "offset", "surface_form", "uri").distinct()
    tp = p.join(g, ["doc_id", "offset", "surface_form", "uri"], "inner").count()
    np_, ng = p.count(), g.count()
    prec = tp / np_ if np_ else 0.0
    rec = tp / ng if ng else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1, "tp": tp,
            "predicted": np_, "gold": ng}


def linking_metrics_df(
    annotations: DataFrame, gold: DataFrame, redirects: DataFrame | None = None
) -> DataFrame:
    """Lazy one-row DataFrame twin of linking_metrics (same formulas,
    EvaluateParagraphDisambiguator.scala:93-101) — usable as a driver query
    / pipeline stage without driver-side collects."""
    g = (
        resolve_gold(gold, redirects)
        .select("doc_id", "offset", "surface_form", "uri")
        .distinct()
    )
    p = annotations.select("doc_id", "offset", "surface_form", "uri").distinct()
    keys = ["doc_id", "offset", "surface_form", "uri"]
    tp = p.join(g, keys, "inner").agg(F.count("*").alias("tp"))
    np_ = p.agg(F.count("*").alias("predicted"))
    ng = g.agg(F.count("*").alias("gold"))
    row = tp.crossJoin(np_).crossJoin(ng)
    prec = F.col("tp") / F.greatest(F.col("predicted"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("gold"), F.lit(1))
    return row.select(
        "tp",
        "predicted",
        "gold",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0),
            6,
        ).alias("f1"),
    )


def disambiguation_metrics(
    ranked: DataFrame, gold: DataFrame, redirects: DataFrame | None = None
) -> dict:
    """Accuracy / MRR / not-found over ranked candidate lists (k>1 output of
    pipeline.annotate with k>1). rank==0 means gold uri absent from the list
    (EvaluateParagraphDisambiguator.scala:93-101)."""
    g = resolve_gold(gold, redirects).select("doc_id", "offset", "uri")
    joined = g.join(
        ranked.select("doc_id", "offset", "uri", "rank"),
        ["doc_id", "offset", "uri"],
        "left",
    ).select("doc_id", "offset", F.coalesce(F.col("rank"), F.lit(0)).alias("rank"))
    per_gold = joined.groupBy("doc_id", "offset").agg(F.min(
        F.when(F.col("rank") > 0, F.col("rank"))
    ).alias("rank"))
    agg = per_gold.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("rank") == 1, 1).otherwise(0)).alias("correct"),
        F.sum(F.when(F.col("rank").isNull(), 1).otherwise(0)).alias("not_found"),
        F.sum(
            F.when(F.col("rank").isNotNull(), 1.0 / F.col("rank")).otherwise(0.0)
        ).alias("rr_sum"),
    ).collect()[0]
    n = agg["n"] or 1
    return {
        "accuracy": agg["correct"] / n,
        "not_found_rate": agg["not_found"] / n,
        "mrr": agg["rr_sum"] / n,
        "n": agg["n"],
    }


def calibration_table(
    scored: DataFrame,
    gold: DataFrame,
    num_bins: int = 10,
) -> DataFrame:
    """Reliability diagram data for annotation confidences (Guo et al.
    ICML 2017 binned calibration, with equal-COUNT bins so sparse score
    regions don't produce empty rows): does a 0.9-confidence link
    actually hold 90% of the time? The post-eval step that turns
    linking_metrics' single P/R into a usable confidence threshold.

    ``scored``: (doc_id, offset, uri, score); ``gold``: (doc_id,
    offset, uri). A prediction is correct when the gold table has the
    same uri at the same (doc_id, offset).

    -> (bin 1..num_bins, n, mean_score round 6, precision round 6,
    gap round 6 = mean_score - precision, the per-bin ECE
    contribution before weighting).

    Scale shape: ONE left join onto gold (equi-keyed on the
    annotation position), one ntile window ordered by (score, doc_id,
    offset, uri) — total order, so bin assignment is deterministic —
    then one groupBy. The windows' single global partition is real but
    operates on ANNOTATIONS of the eval corpus (bounded), not the
    training corpus; shard by eval slice upstream if that ever grows.
    """
    from pyspark.sql import Window

    g = gold.select("doc_id", "offset", F.col("uri").alias("_gold_uri"))
    j = scored.join(g, ["doc_id", "offset"], "left").withColumn(
        "_ok", (F.col("uri") == F.col("_gold_uri")).cast("int")
    ).withColumn("_ok", F.coalesce(F.col("_ok"), F.lit(0)))
    w = Window.orderBy("score", "doc_id", "offset", "uri")
    return (
        j.withColumn("bin", F.ntile(num_bins).over(w))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg("_ok"), 6).alias("precision"),
            F.round(F.avg("score") - F.avg("_ok"), 6).alias("gap"),
        )
    )


def label_noise_estimate(
    scored: DataFrame,
    scale: int = 6,
) -> DataFrame:
    """Confident-learning label-noise counts (Northcutt et al., JAIR
    2021, reduced to the top-1 form silver-label pipelines actually
    have): per predicted class j, the confidence threshold t_j is the
    mean score of examples PREDICTED j; an example with given label i,
    predicted label j != i, and score >= t_j is a SUSPECTED label
    error, counted into the (i, j) off-diagonal — the triage matrix
    for cleaning annotation_vote / distant_supervision silver data.

    ``scored``: (id, given_label, pred_label, score). -> one row per
    observed (given_label, pred_label) pair with pred != given:
    (given_label, pred_label, n_pairs, n_suspect, threshold).

    Thresholds are computed in EXACT fixed-point (scores quantized to
    10^-scale units as BIGINTs, mean = half-up integer division) so
    the >= comparison is bit-deterministic across engines and
    partitionings — a float mean would put borderline rows on
    different sides of the threshold per summation order (the
    neighborhood_aggregate scale= rationale).

    Scale shape: one groupBy for the per-class thresholds (a tiny
    class dim, broadcast back), one filter + one groupBy for the
    counts — all map-side combinable; no windows, no collect.
    """
    mult = 10 ** scale
    q = scored.withColumn(
        "_si", F.round(F.col("score") * mult, 0).cast("long")
    )
    th = (
        q.groupBy("pred_label")
        .agg(
            F.expr("(2 * sum(_si) + count(_si)) div (2 * count(_si))")
            .alias("_ti")
        )
    )
    joined = q.join(F.broadcast(th), "pred_label")
    pairs = (
        joined.filter(F.col("given_label") != F.col("pred_label"))
        .groupBy("given_label", "pred_label")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum((F.col("_si") >= F.col("_ti")).cast("long"))
            .alias("n_suspect"),
            (F.max("_ti").cast("double") / mult).alias("threshold"),
        )
    )
    return pairs.select(
        "given_label", "pred_label",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_suspect").cast("long").alias("n_suspect"),
        F.round("threshold", scale).alias("threshold"),
    )


def conformal_thresholds(
    calibration: DataFrame,
    alpha: float = 0.1,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Split-conformal NIL thresholds (Vovk et al.; the
    distribution-free guarantee modern selective-prediction stacks
    use): given a CALIBRATION set of correctly-linked examples'
    confidence scores, the per-class threshold is the
    max(1, floor(alpha * (n + 1)))-th smallest score — rejecting
    (NIL-ing) future examples below it mis-rejects true links with
    probability <= alpha, assuming exchangeability, with NO
    distributional assumption. The principled replacement for the
    reference's hand-tuned confidence cutoffs (D10's filter chain).

    -> (label, n, threshold): one row per class; classes whose
    calibration set is too small for the alpha (floor = 0) return the
    minimum score (never reject — the conservative degenerate case).

    Scale shape: one per-class rank window over the calibration set
    (eval-sized, not corpus-sized) + one filter; exact rank
    arithmetic, engine-deterministic like event_quantiles.
    """
    from pyspark.sql import Window

    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    w = Window.partitionBy(label_col).orderBy(F.col(score_col).asc())
    ranked = (
        calibration.select(label_col, score_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy(label_col)))
    )
    pick = F.greatest(
        F.lit(1), F.floor(F.lit(alpha) * (F.col("_n") + 1)).cast("long")
    )
    return ranked.filter(F.col("_rn") == pick).select(
        label_col,
        F.col("_n").cast("long").alias("n"),
        F.col(score_col).alias("threshold"),
    )
