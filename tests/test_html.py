"""HTML text extraction (functions/html.py)."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.functions.html import (
    html_links,
    html_title,
    html_to_text,
    link_density,
)

_PAGE = (
    "<html><head><title> My\n Page </title>"
    "<script>var x = '<p>not text</p>';</script>"
    "<style>p { color: red }</style></head>"
    "<body><!-- nav starts -->"
    "<p>Hello <b>world</b></p>\n"
    '<a href="https://a.example/x">first link</a> and '
    "<a href='https://b.example/y'>second <i>one</i></a>"
    " tail &amp; entities &lt;kept&gt;</body></html>"
)


def _df(spark):
    return spark.createDataFrame([(_PAGE,), ("",)], "html string")


def test_html_to_text(spark):
    got = _df(spark).select(html_to_text("html").alias("t")).collect()
    assert got[0].t == (
        "Hello world first link and second one tail & entities <kept>"
    )
    assert got[1].t == ""


def test_html_title_dropped_from_text_but_extracted(spark):
    row = _df(spark).select(
        html_title("html").alias("title"), html_to_text("html").alias("t")
    ).first()
    assert row.title == "My Page"
    assert "My Page" not in row.t  # head content excluded from body text


def test_html_links_both_quote_styles(spark):
    row = _df(spark).select(html_links("html").alias("ls")).first()
    assert row.ls == ["https://a.example/x", "https://b.example/y"]


def test_link_density(spark):
    row = _df(spark).select(link_density("html").alias("d")).first()
    # anchors: "first link" (10) + "second one" (10) = 20 visible chars
    text = "Hello world first link and second one tail & entities <kept>"
    assert abs(row.d - 20 / len(text)) < 1e-9
    empty = (
        _df(spark)
        .filter(F.col("html") == "")
        .select(link_density("html").alias("d"))
        .first()
    )
    assert empty.d == 0.0


def test_amp_entity_not_double_decoded(spark):
    df = spark.createDataFrame([("<p>a &amp;lt; b</p>",)], "html string")
    assert df.select(html_to_text("html").alias("t")).first().t == "a &lt; b"
