"""Unit tests: normalization + URI cleanup (SURVEY.md §5.1)."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.functions.text import (
    normalize_surface_form_col,
    normalize_surface_form_py,
    normalize_text_col,
    wiki_clean_uri_col,
    wiki_clean_uri_py,
)


def test_normalize_surface_form_py():
    # ref MemorySurfaceFormStore.scala:40-41 examples
    assert normalize_surface_form_py("The Beatles") == "/beatles"
    assert normalize_surface_form_py("Big-Apple") == "/big apple"
    assert normalize_surface_form_py("An apple a day") == "/apple day"
    assert normalize_surface_form_py("U.S.A.") == "/u s"  # 'a' is a stopword


def test_normalize_col_matches_py(spark):
    cases = ["The Beatles", "Big-Apple", "An apple a day", "U.S.A.",
             "apple", "  padded  ", "A", "big  apple"]
    df = spark.createDataFrame([(c,) for c in cases], "sf string")
    got = df.select("sf", normalize_surface_form_col(F.col("sf")).alias("n")).collect()
    for row in got:
        assert row["n"] == normalize_surface_form_py(row["sf"]), row["sf"]


def test_normalize_text(spark):
    df = spark.createDataFrame([("don’t",)], "t string")
    assert df.select(normalize_text_col(F.col("t"))).first()[0] == "don't"


def test_wiki_clean_uri(spark):
    cases = ["Apple#History", "New%20York", "Big Apple"]
    df = spark.createDataFrame([(c,) for c in cases], "u string")
    got = [r[0] for r in df.select(wiki_clean_uri_col(F.col("u"))).collect()]
    assert got == [wiki_clean_uri_py(c) for c in cases]
    assert got == ["Apple", "New_York", "Big_Apple"]
