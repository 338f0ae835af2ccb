"""Topical NaiveBayes classifier (pyspark.ml pipeline)."""

from dbpedia_spotlight_spark.topical.classifier import (
    predict_topics,
    train_topical_classifier,
)


def test_topical_classifier_learns_separable_topics(spark):
    rows = []
    for i in range(30):
        rows.append((f"s{i}", "sports goal match team player score stadium win", "sports"))
        rows.append((f"t{i}", "compiler kernel memory thread process binary code", "tech"))
        rows.append((f"c{i}", "recipe butter flour oven bake sugar taste dish", "cooking"))
    corpus = spark.createDataFrame(rows, "doc_id string, text string, topic string")
    model = train_topical_classifier(corpus)

    test = spark.createDataFrame(
        [
            ("a", "the team played a great match and the player scored"),
            ("b", "the kernel scheduler runs each thread and process"),
            ("c", "bake the flour and butter in the oven with sugar"),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in predict_topics(model, test).collect()}
    assert got["a"]["topic_pred"] == "sports"
    assert got["b"]["topic_pred"] == "tech"
    assert got["c"]["topic_pred"] == "cooking"
    assert all(0.0 <= got[k]["topic_confidence"] <= 1.0 for k in got)
    assert set(got["a"].asDict()) >= {"doc_id", "text", "topic_pred", "topic_confidence"}
