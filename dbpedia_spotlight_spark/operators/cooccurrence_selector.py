"""P13 (final piece) — CoOccurrenceBasedSelector as a retrainable
pyspark.ml twin.

Reference: core/src/main/java/org/dbpedia/spotlight/spot/
CoOccurrenceBasedSelector.java:76-130 — every spot runs through pre-filters
(FilterTermsize, FilterPOS, FilterPattern) and then a WEKA classifier
(unigram or ngram instance, cooccurrence/weka/InstanceBuilderUnigram.java:
40-90) deciding valid vs common; the classifier ships as a trained model
file. The training flow is index/.../spot/cooccurrence/training/
AnnotatedDatasetEnricher*.java: gold-annotated spots become labeled
instances.

That model file is not redistributable, so — like the spotter tuner (M12,
operators/tuner.py) — the classifier is *retrained* from gold membership:
spots that appear in the gold occurrence set are `valid`, the rest
`common`. Features are the relational subset of the reference's instance
attributes (corpus count, annotation probability, term size, case
category, number-ness); the co-occurrence-DB counts (Google ngrams /
UKWaC) are external data the sandbox doesn't ship — their slots are
documented, not faked. Training is one pyspark.ml LogisticRegression fit
(drivers a few dims; the feature build is pure column math over the spot
table, scale-safe)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_COLS = [
    "log_corpus_count",   # ~ unigram_count_corpus (InstanceBuilderUnigram:21)
    "annot_prob",         # annotated/total (SurfaceForm.scala:51-61)
    "term_size",          # FilterTermsize unigram/ngram split
    "case_lower",         # candidateCase attribute (:39)
    "case_upper_initial",
    "case_all_upper",
    "is_number",
]


def spot_selector_features(
    spots: DataFrame, surface_forms: DataFrame
) -> DataFrame:
    """Attach the classifier features to each spot row (column math only)."""
    sf_dim = F.broadcast(
        surface_forms.select(
            F.col("surface_form").alias("_sf"),
            "annotated_count",
            "total_count",
        )
    )
    df = spots.join(sf_dim, spots["surface_form"] == sf_dim["_sf"], "left").drop(
        "_sf"
    )
    sf = F.col("surface_form")
    total = F.coalesce(F.col("total_count"), F.lit(0)).cast("double")
    annotated = F.coalesce(F.col("annotated_count"), F.lit(0)).cast("double")
    return (
        df.withColumn("log_corpus_count", F.log1p(F.greatest(total, F.lit(0.0))))
        .withColumn(
            "annot_prob",
            F.when(total <= 0, F.lit(1.0)).otherwise(
                F.least(annotated / total, F.lit(1.0))
            ),
        )
        .withColumn("term_size", F.size(F.split(sf, " ")).cast("double"))
        .withColumn(
            "case_lower", (sf == F.lower(sf)).cast("double")
        )
        .withColumn(
            "case_all_upper",
            ((sf == F.upper(sf)) & (sf != F.lower(sf))).cast("double"),
        )
        .withColumn(
            "case_upper_initial",
            (
                (F.substring(sf, 1, 1) == F.upper(F.substring(sf, 1, 1)))
                & (sf != F.upper(sf))
            ).cast("double"),
        )
        .withColumn("is_number", sf.rlike("^[0-9]+$").cast("double"))
    )


def label_spots_from_gold(spots: DataFrame, gold: DataFrame) -> DataFrame:
    """AnnotatedDatasetEnricher twin: label = 1.0 (valid) when the spot's
    (doc_id, offset, surface_form) is in the gold set, else 0.0 (common)."""
    g = gold.select("doc_id", "offset", "surface_form").withColumn(
        "_lbl", F.lit(1.0)
    )
    return (
        spots.join(g, ["doc_id", "offset", "surface_form"], "left")
        .withColumn("label", F.coalesce(F.col("_lbl"), F.lit(0.0)))
        .drop("_lbl")
    )


def train_cooccurrence_selector(
    spots: DataFrame,
    gold: DataFrame,
    surface_forms: DataFrame,
    max_iter: int = 50,
):
    """Fit the valid-vs-common classifier. Returns a pyspark.ml
    PipelineModel (assembler + logistic regression)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    train = label_spots_from_gold(
        spot_selector_features(spots, surface_forms), gold
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="features"),
            LogisticRegression(maxIter=max_iter, labelCol="label"),
        ]
    )
    return pipe.fit(train)


def cooccurrence_selector(
    spots: DataFrame,
    surface_forms: DataFrame,
    model,
    min_term_size: int = 1,
) -> DataFrame:
    """Apply the trained classifier as a spot selector: keep spots
    classified valid (ref CoOccurrenceBasedSelector.select:76-130). The
    FilterTermsize pre-filter keeps spots with >= min_term_size tokens."""
    feats = spot_selector_features(spots, surface_forms)
    scored = model.transform(feats.filter(F.col("term_size") >= min_term_size))
    keep = scored.filter(F.col("prediction") == 1.0)
    return keep.select(*spots.columns)
