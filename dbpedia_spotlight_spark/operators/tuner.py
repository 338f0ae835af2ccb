"""Spotter weight tuning — M12 in SURVEY.md §2.6.

Reference (index/src/main/scala/org/dbpedia/spotlight/db/SpotterTuner.scala):
spot a gold-annotated corpus, label each spot by whether its surface form
appears in the paragraph's gold surface-form set (Wikipedia only links the
first mention, so membership is by sf string, not offset), build the spot
feature matrix [annot_prob, is_abbreviation, is_number, bias]
(core/.../db/DBSpotter.scala:184-197), fit a linear regression, write the
four weights (the shipped default is "1.0 0.2 -0.2 0.1",
CreateSpotlightModel.scala:230-233).

Spark mapping: label via a per-doc semi-join on surface_form; features as
column expressions; pyspark.ml LinearRegression with fitIntercept=False
(the bias is an explicit feature, like the reference's design matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spot_feature_columns(df: DataFrame) -> DataFrame:
    """Attach f_annot_prob / f_abbrev / f_number / f_bias columns. Expects
    annotated_count + total_count (join surface_forms first)."""
    sf = F.col("surface_form")
    annot_prob = F.when(
        F.col("total_count") <= 0, F.lit(1.0)
    ).otherwise(
        F.least(F.lit(1.0), F.col("annotated_count") / F.col("total_count"))
    )
    is_num = sf.rlike(r"^[0-9]+$")
    is_abbrev = (F.upper(sf) == sf) & (F.length(sf) < 5) & ~is_num
    return (
        df.withColumn("f_annot_prob", annot_prob)
        .withColumn("f_abbrev", is_abbrev.cast("double"))
        .withColumn("f_number", is_num.cast("double"))
        .withColumn("f_bias", F.lit(1.0))
    )


def tune_spot_weights(
    spots: DataFrame,
    gold: DataFrame,
    surface_forms: DataFrame,
    reg_param: float = 0.0,
) -> tuple:
    """-> (w_annot_prob, w_abbrev, w_number, w_bias).

    spots: spotter output over the tuning corpus (doc_id, surface_form).
    gold: gold occurrences (doc_id, surface_form).
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    stats = F.broadcast(
        surface_forms.select("surface_form", "annotated_count", "total_count")
    )
    labeled = (
        spots.select("doc_id", "surface_form")
        .join(stats, "surface_form", "left")
        .fillna({"annotated_count": 0, "total_count": -1})
        .join(
            gold.select("doc_id", "surface_form")
            .distinct()
            .withColumn("_gold", F.lit(1.0)),
            ["doc_id", "surface_form"],
            "left",
        )
        .withColumn("label", F.coalesce(F.col("_gold"), F.lit(0.0)))
    )
    feats = spot_feature_columns(labeled)
    assembled = VectorAssembler(
        inputCols=["f_annot_prob", "f_abbrev", "f_number", "f_bias"],
        outputCol="features",
    ).transform(feats)
    model = LinearRegression(
        featuresCol="features",
        labelCol="label",
        fitIntercept=False,
        regParam=reg_param,
    ).fit(assembled)
    return tuple(float(c) for c in model.coefficients)


def write_spot_weights(weights: tuple, path: str) -> None:
    """spotter_thresholds.txt format (space-separated, ref
    CreateSpotlightModel.scala:230-233)."""
    with open(path, "w") as f:
        f.write(" ".join(str(w) for w in weights))
