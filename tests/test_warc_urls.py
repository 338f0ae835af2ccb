"""WARC ingestion + URL canonicalization (io/warc.py, functions/urls.py)."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.io.warc import (
    parse_warc_records,
    read_warc,
    warc_record_lines,
)
from dbpedia_spotlight_spark.functions.urls import (
    registrable_domain,
    url_host,
    url_normalize,
)


def _source_rows(spark):
    return spark.createDataFrame(
        [
            ("https://example.com/a", "hello world"),
            ("https://example.com/b", "line one\nline two"),
            ("http://other.org/", "<html><body>x</body></html>"),
        ],
        "uri string, body string",
    )


def test_warc_file_roundtrip(spark, tmp_path):
    # sink -> one real file -> delimiter-split read: the full path a
    # Common-Crawl-style ingest takes, including record splitting
    lines = warc_record_lines(_source_rows(spark)).collect()
    blob = "".join(r.value for r in lines)
    p = tmp_path / "fixture.warc"
    p.write_text(blob, newline="")  # keep \r\n intact
    out = read_warc(spark, str(p))
    got = {(r.target_uri, r.payload) for r in out.collect()}
    want = {(r.uri, r.body) for r in _source_rows(spark).collect()}
    assert got == want
    assert out.count() == 3


def test_warc_parsed_fields(spark):
    recs = warc_record_lines(_source_rows(spark))
    # strip the version line exactly like the lineSep split does
    chunks = recs.select(
        F.expr("substring(value, 11)").alias("value")
    )
    out = parse_warc_records(chunks)
    row = out.filter(F.col("target_uri") == "https://example.com/a").first()
    assert row.warc_type == "response"
    assert row.http_status == "200"
    assert row.content_type.startswith("application/http")
    assert row.warc_date == "2026-01-01T00:00:00Z"
    assert row.record_id.startswith("<urn:sha1:")
    assert row.payload == "hello world"
    # Content-Length = HTTP envelope (44) + body chars
    assert row.content_length == 44 + len("hello world")


def test_warc_non_http_record_payload_is_body(spark):
    chunk = (
        "WARC-Type: warcinfo\r\n"
        "WARC-Record-ID: <urn:x:1>\r\n"
        "Content-Length: 9\r\n"
        "\r\n"
        "software\n\r\n\r\n"
    )
    out = parse_warc_records(
        spark.createDataFrame([(chunk,)], "value string")
    ).first()
    assert out.warc_type == "warcinfo"
    assert out.http_status is None
    assert out.payload == out.body == "software\n"


def test_warc_multiline_body_survives(spark):
    recs = warc_record_lines(_source_rows(spark))
    chunks = recs.select(F.expr("substring(value, 11)").alias("value"))
    row = (
        parse_warc_records(chunks)
        .filter(F.col("target_uri") == "https://example.com/b")
        .first()
    )
    assert row.payload == "line one\nline two"


def test_url_normalize_cases(spark):
    cases = [
        # (input, expected)
        ("HTTPS://User@WWW.Example.COM:443/Path?Q=1#frag",
         "https://www.example.com/Path?Q=1"),
        ("http://a.b:80/", "http://a.b/"),
        ("http://a.b:8080/x", "http://a.b:8080/x"),
        ("https://host.com", "https://host.com/"),
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "u string")
    got = [r.n for r in df.select(url_normalize("u").alias("n")).collect()]
    assert got == [c[1] for c in cases]


def test_url_host_and_registrable_domain(spark):
    df = spark.createDataFrame(
        [("https://u:p@Sub.News.Example.COM:8443/a?b#c",)], "u string"
    )
    row = df.select(
        url_host("u").alias("h"), registrable_domain("u").alias("d")
    ).first()
    assert row.h == "sub.news.example.com"
    assert row.d == "example.com"
