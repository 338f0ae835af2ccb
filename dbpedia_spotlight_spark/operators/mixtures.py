"""Score mixtures — D8/D9/D15 in SURVEY.md §2.4: how per-candidate features
combine into the final score. Each mixture is a Column factory over the
scored-candidates DataFrame (columns p_e, p_s_given_e, p_c_given_e,
contextual_score, support + model totals).

Reference (core/src/main/scala/org/dbpedia/spotlight/disambiguate/mixtures/):
  - UnweightedMixture.scala:14-17 — Σ of selected log features (−inf
    absorbing); the db-backed default (wired SpotlightModel.scala:105-113).
  - LinearRegressionFeatureMixture.scala — Σ w_i·feature_i + offset.
  - LinearRegressionMixture.scala — hardcoded priorWeight·prior +
    contextWeight·score + c (344.597 / 1.1247 / −0.0055 variant).
  - Fader2Mixture.scala — cw·contextScore + (1−cw)·(1 + log(1 + prior·α)).
  - FaderMixture.scala — contextScore · (cw/surrogates + (1−cw)·(1 +
    log(1 + prior·α))).
  - OnlySimScoreMixture.scala — context score alone.
Baselines (D15): prior-only (eval/.../DBBaselineDisambiguator.scala) and
random (core/src/main/java/org/dbpedia/spotlight/spot/RandomSelector.java
spirit, disambiguate/RandomDisambiguator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def unweighted_mixture(*features: Column) -> Column:
    """Σ of log features (ref UnweightedMixture.scala:14-17). Null/NaN in any
    feature propagates — the reference's NaN absorption."""
    out = features[0]
    for f in features[1:]:
        out = out + f
    return out


def linear_regression_feature_mixture(
    weighted: list[tuple[Column, float]], offset: float = 0.0
) -> Column:
    """Σ w_i·feature_i + offset (ref LinearRegressionFeatureMixture.scala)."""
    out = F.lit(offset)
    for col, w in weighted:
        out = out + col * F.lit(w)
    return out


def linear_regression_mixture(
    prior: Column,
    context_score: Column,
    prior_weight: float = 344.597,
    context_weight: float = 1.1247,
    c: float = -0.0055,
) -> Column:
    """Hardcoded LR variant (ref LinearRegressionMixture.scala comments)."""
    return prior * F.lit(prior_weight) + context_score * F.lit(context_weight) + F.lit(c)


def fader2_mixture(
    context_score: Column, prior: Column, context_weight: float, alpha: float
) -> Column:
    """ref Fader2Mixture.scala: cw·ctx + (1−cw)·(1 + log(1 + prior·α))."""
    prominence = F.lit(1.0) + F.log(F.lit(1.0) + prior * F.lit(alpha))
    return context_score * F.lit(context_weight) + prominence * F.lit(
        1.0 - context_weight
    )


def fader_mixture(
    context_score: Column,
    prior: Column,
    context_weight: float,
    alpha: float,
    surrogates_count: int,
) -> Column:
    """ref FaderMixture.scala: ctx · (cw/surrogates + (1−cw)·prominence)."""
    prominence = F.lit(1.0) + F.log(F.lit(1.0) + prior * F.lit(alpha))
    lam = F.lit(context_weight / surrogates_count) + prominence * F.lit(
        1.0 - context_weight
    )
    return context_score * lam


def only_sim_score_mixture(context_score: Column) -> Column:
    return context_score


SPOT_KEY = ["doc_id", "span_pos", "offset"]


def prior_baseline(spot_cands: DataFrame) -> DataFrame:
    """D15 prior-only baseline: best candidate by P(e|s) =
    pair_count/annotated_count (ref eval/.../DBBaselineDisambiguator.scala)."""
    w = Window.partitionBy(*SPOT_KEY).orderBy(
        F.desc(F.col("pair_count") / F.col("annotated_count")), F.asc("res_id")
    )
    return (
        spot_cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
    )


def random_baseline(spot_cands: DataFrame, seed: int = 42) -> DataFrame:
    """D15 random baseline (ref RandomDisambiguator): deterministic
    pseudo-random pick per spot."""
    w = Window.partitionBy(*SPOT_KEY).orderBy(
        F.xxhash64("res_id", F.lit(seed)), F.asc("res_id")
    )
    return (
        spot_cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
    )
