"""Skew utilities: salted join and salted distinct count must equal their
plain equivalents."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)


def test_salted_join_equals_plain_join(spark):
    # one hot key (k=0 appears 500x) + tail
    probe = spark.range(600).select(
        F.when(F.col("id") < 500, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    build = spark.createDataFrame(
        [(0, "hot"), (510, "a"), (550, "b")], "k long, tag string"
    )
    plain = {(r["v"], r["tag"]) for r in probe.join(build, "k").collect()}
    salted = {
        (r["v"], r["tag"])
        for r in salted_join(probe, build, ["k"], buckets=4).collect()
    }
    assert salted == plain and len(plain) == 502


def test_salted_distinct_count(spark):
    df = spark.createDataFrame(
        [("g1", x % 7) for x in range(100)] + [("g2", 1), ("g2", 2)],
        "g string, v int",
    )
    got = {
        r["g"]: r["n_distinct"]
        for r in salted_distinct_count(df, ["g"], "v", buckets=4).collect()
    }
    assert got == {"g1": 7, "g2": 2}
