"""Topical classification — the reference's topical module re-expressed on
pyspark.ml (SURVEY.md §2.7 "Topical module").

Reference: topical/src/main/scala/org/dbpedia/spotlight/topical/
NaiveBayesTopicalClassifier.scala:28-234 — tokens matching [a-z]{3,},
TF-IDF weighting log(1+tf)·log(N/df) with L2 length normalization (the
code comments call this out as the accuracy-critical part), multinomial
Naive Bayes over topic labels; TopicalMultiLabelClassifier trains one
binary model per topic.

Spark mapping: RegexTokenizer → CountVectorizer → IDF → Normalizer(L2) →
ml.classification.NaiveBayes, assembled as one ml Pipeline so train and
predict are single fit/transform passes (no per-row Python; ml runs
JVM-side).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import NaiveBayes
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    Normalizer,
    RegexTokenizer,
    StringIndexer,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_pipeline(
    text_col: str = "text",
    label_col: str = "topic",
    vocab_size: int = 1 << 18,
    smoothing: float = 1.0,
) -> Pipeline:
    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col,
                outputCol="_tokens",
                pattern="[a-z]{3,}",
                gaps=False,
                toLowercase=True,
            ),
            CountVectorizer(
                inputCol="_tokens", outputCol="_tf", vocabSize=vocab_size
            ),
            IDF(inputCol="_tf", outputCol="_tfidf"),
            Normalizer(inputCol="_tfidf", outputCol="features", p=2.0),
            StringIndexer(inputCol=label_col, outputCol="label"),
            NaiveBayes(smoothing=smoothing, modelType="multinomial"),
        ]
    )


def train_topical_classifier(
    corpus: DataFrame,
    text_col: str = "text",
    label_col: str = "topic",
    **kwargs,
) -> PipelineModel:
    """corpus(text, topic) -> fitted PipelineModel."""
    return build_pipeline(text_col, label_col, **kwargs).fit(corpus)


def predict_topics(model: PipelineModel, df: DataFrame) -> DataFrame:
    """-> input columns + topic_pred (string label) + topic_confidence."""
    from pyspark.ml.functions import vector_to_array

    indexer = next(s for s in model.stages if s.uid.startswith("StringIndexer"))
    labels = indexer.labelsArray[0]
    out = model.transform(df)
    label_arr = F.array(*[F.lit(x) for x in labels])
    return (
        out.withColumn("topic_pred", label_arr[F.col("prediction").cast("int")])
        .withColumn(
            "topic_confidence", F.array_max(vector_to_array("probability"))
        )
        .drop(
            "_tokens", "_tf", "_tfidf", "features", "rawPrediction",
            "probability", "prediction", "label",
        )
    )
