"""WARC (Web ARChive, ISO 28500) ingestion — the offline web-content
source for a training-data pipeline.

The reference's web occurrence sources are live-network scrapers
(index/src/main/scala/org/dbpedia/spotlight/io/WebOccurrenceSource.scala,
core/src/main/scala/org/dbpedia/spotlight/util/YahooBossSearcher.scala —
scoped out in SURVEY §2.1 because this environment has no network). A
WARC reader provides the same capability offline: Common-Crawl-style
archives ARE the at-rest form of the web content those scrapers fetch,
and the canonical input of every web-scale corpus pipeline.

Scale shape
-----------
``read_warc`` splits records with Hadoop's delimited text reader
(``lineSep="WARC/1.0\\r\\n"``): a 100 GB WARC file splits at record
boundaries across executors exactly like newline-delimited text — no
whole-file reads, no Python in the split path. Parsing is pure column
expressions (``substring_index`` / ``regexp_extract`` — whole-stage
codegen); header extraction never materializes a map.

Caveats (documented, not silent): bodies are handled as text —
``Content-Length`` is a byte count, so for non-ASCII payloads the
trailing-separator strip (not the length) delimits the body; gzipped
.warc.gz members are not splittable by this reader (store WARC
uncompressed or recompress to a splittable codec for Spark ingestion,
as Common Crawl's own Spark examples do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# WARC named fields surfaced as columns: (column, header name)
_WARC_HEADERS = [
    ("warc_type", "WARC-Type"),
    ("record_id", "WARC-Record-ID"),
    ("warc_date", "WARC-Date"),
    ("target_uri", "WARC-Target-URI"),
    ("content_type", "Content-Type"),
    ("content_length", "Content-Length"),
]


def _header(block, name: str):
    # (?m) so ^ anchors per header line; value runs to end-of-line
    return F.regexp_extract(block, r"(?m)^" + name + r":[ \t]*([^\r\n]+)", 1)


def parse_warc_records(df: DataFrame, column: str = "value") -> DataFrame:
    """Parse WARC record chunks (one record per row, WITHOUT the leading
    ``WARC/1.0\\r\\n`` version line — exactly what ``read_warc``'s
    delimiter split yields) into typed columns.

    Returns (warc_type, record_id, warc_date, target_uri, content_type,
    content_length, body, http_status, payload): ``body`` is the raw
    record block after the WARC headers; for ``response`` records with
    an HTTP message body, ``http_status`` and ``payload`` split the
    embedded HTTP envelope, otherwise payload == body. Pure column
    expressions — every row is independent, no UDF, no state."""
    v = F.col(column)
    headers = F.substring_index(v, "\r\n\r\n", 1)
    # everything after the first header/body separator, trailing
    # record-separator CRLFs stripped (see module caveat on byte lengths)
    raw_body = F.expr(
        f"substring({column}, length(substring_index({column},"
        f" '\\r\\n\\r\\n', 1)) + 5)"
    )
    body = F.regexp_replace(raw_body, r"(\r\n)+$", "")
    out = df.select(
        *[_header(headers, h).alias(c) for c, h in _WARC_HEADERS[:-1]],
        _header(headers, "Content-Length").cast("long").alias(
            "content_length"
        ),
        body.alias("body"),
    )
    is_http = F.col("warc_type").isin("response", "request") & F.col(
        "body"
    ).startswith("HTTP/")
    http_head = F.substring_index(F.col("body"), "\r\n\r\n", 1)
    return out.select(
        "*",
        F.when(
            is_http,
            F.regexp_extract(http_head, r"^HTTP/\d\.\d (\d{3})", 1),
        ).otherwise(F.lit(None).cast("string")).alias("http_status"),
        F.when(
            is_http,
            F.expr(
                "substring(body, length(substring_index(body,"
                " '\\r\\n\\r\\n', 1)) + 5)"
            ),
        ).otherwise(F.col("body")).alias("payload"),
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read an (uncompressed) WARC file or directory into parsed record
    rows. Splits on the record version line, so large files partition at
    record boundaries across executors; the leading empty chunk (before
    the first record) and whitespace-only chunks are dropped."""
    raw = spark.read.text(path, lineSep="WARC/1.0\r\n")
    return parse_warc_records(
        raw.filter(F.trim(F.col("value")) != "")
    )


def warc_record_lines(
    df: DataFrame,
    uri_col: str = "uri",
    body_col: str = "body",
    warc_type: str = "response",
    date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """Serialize (uri, body) rows to WARC record strings — the sink twin
    of ``parse_warc_records`` (write with ``df.write.text``). Record IDs
    derive from the URI hash, so output is deterministic; Content-Length
    is the character length of the body (byte-exact for ASCII)."""
    body = F.col(body_col)
    return df.select(
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: " + warc_type + "\r\n"),
            F.lit("WARC-Record-ID: <urn:sha1:"),
            F.sha1(F.col(uri_col).cast("binary")),
            F.lit(">\r\nWARC-Date: " + date + "\r\n"),
            F.lit("WARC-Target-URI: "),
            F.col(uri_col),
            F.lit(
                "\r\nContent-Type: application/http; msgtype=response"
                "\r\nContent-Length: "
            ),
            (F.length(body) + 44).cast("string"),
            F.lit(
                "\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html"
                "\r\n\r\n"
            ),
            body,
            F.lit("\r\n"),
        ).alias("value")
    )
