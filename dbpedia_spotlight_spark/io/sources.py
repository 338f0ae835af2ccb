"""Sources — S1-S9 in SURVEY.md §2.1: readers for the reference's file
formats, as plain spark.read + column expressions.

Formats (with reference consumers):
  - 5-col annotated TSV `id \\t uri \\t surfaceForm \\t text \\t offset`
      core/src/main/scala/org/dbpedia/spotlight/io/AnnotatedTextSource.scala:84-116
  - sfAndTotalCounts `sf \\t annotated \\t total?` (missing -> -1)
      index/.../db/io/SurfaceFormSource.scala:35-57
  - uriCounts `uri \\t count`
      index/.../db/io/DBpediaResourceSource.scala:96-119
  - pairCounts `sf \\t wikiurl \\t count`
      index/.../db/io/CandidateMapSource.scala:41-61
  - tokenCounts `wikiurl \\t {(token,count),...}` (Pig bag literal)
      index/.../db/io/TokenOccurrenceSource.scala:50-58
  - N-Triples (subject, predicate, object)
      core/.../io/NTripleSource.scala
  - redirects/disambiguations from .nt
      index/.../db/WikipediaToDBpediaClosure.scala:33-52
  - wiki markup spots `[[...]]` (P10, core/.../spot/WikiMarkupSpotter.scala)
  - spot XML `<annotation><surfaceForm name offset/>` (P11,
      core/.../spot/SpotXmlParser.scala)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_annotated_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S2: golden 5-col corpus -> (occ_id, uri, surface_form, text, offset);
    paragraph grouping = dense ids over distinct text (== dense_rank over
    identical text, but assigned on the distinct-text dim and joined back —
    no single-partition global window over the fact rows)."""
    from dbpedia_spotlight_spark.operators.skew import dense_sorted_id

    schema = "occ_id string, uri string, surface_form string, text string, offset int"
    df = spark.read.option("sep", "\t").schema(schema).csv(path)
    paras = dense_sorted_id(
        df.select("text").distinct(), ["text"], "paragraph_id", start=1
    ).withColumn("paragraph_id", F.col("paragraph_id").cast("int"))
    return df.join(paras, "text").select(
        "occ_id", "uri", "surface_form", "text", "offset", "paragraph_id"
    )


def read_sf_and_total_counts(spark: SparkSession, path: str) -> DataFrame:
    """S4: sf \\t annotated \\t total? -> summed duplicates, -1 when absent."""
    schema = "surface_form string, annotated_count long, total_count long"
    df = spark.read.option("sep", "\t").schema(schema).csv(path)
    return (
        df.withColumn("total_count", F.coalesce("total_count", F.lit(-1)))
        .groupBy("surface_form")
        .agg(
            F.sum("annotated_count").alias("annotated_count"),
            F.sum("total_count").alias("total_count"),
        )
    )


def read_uri_counts(spark: SparkSession, path: str) -> DataFrame:
    schema = "uri string, support long"
    return (
        spark.read.option("sep", "\t").schema(schema).csv(path)
        .groupBy("uri").agg(F.sum("support").alias("support"))
    )


def read_pair_counts(spark: SparkSession, path: str) -> DataFrame:
    schema = "surface_form string, uri string, pair_count long"
    return (
        spark.read.option("sep", "\t").schema(schema).csv(path)
        .groupBy("surface_form", "uri")
        .agg(F.sum("pair_count").alias("pair_count"))
    )


def parse_token_bags(raw: DataFrame) -> DataFrame:
    """S7 core: (uri, bag `{(t1,c1),(t2,c2)}`) rows -> exploded (uri, token,
    count). Bag parsing is regexp_extract_all + explode — no UDF
    (parser twin: index/.../db/io/util/PigTokenOccurrenceParser.scala)."""
    pairs = F.expr(r"regexp_extract_all(bag, '\\(([^,()]+),([0-9]+)\\)', 0)")
    return (
        raw.select("uri", F.explode(pairs).alias("pair"))
        .select(
            "uri",
            F.regexp_extract("pair", r"\(([^,()]+),([0-9]+)\)", 1).alias("token"),
            F.regexp_extract("pair", r"\(([^,()]+),([0-9]+)\)", 2)
            .cast("long")
            .alias("count"),
        )
    )


def read_token_counts(spark: SparkSession, path: str) -> DataFrame:
    """S7: `wikiurl \\t {(t1,c1),(t2,c2)}` Pig bag file -> exploded
    (uri, token, count)."""
    raw = spark.read.option("sep", "\t").schema("uri string, bag string").csv(path)
    return parse_token_bags(raw)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """S8: N-Triples lines -> (subj, pred, obj); IRIs stripped of <>."""
    line = spark.read.text(path).filter(~F.col("value").startswith("#"))
    pat = r"^<([^>]+)>\s+<([^>]+)>\s+(.+?)\s*\.\s*$"
    return line.select(
        F.regexp_extract("value", pat, 1).alias("subj"),
        F.regexp_extract("value", pat, 2).alias("pred"),
        F.regexp_replace(
            F.regexp_extract("value", pat, 3), r"^<|>$", ""
        ).alias("obj"),
    ).filter(F.col("subj") != "")


def _last_path_segment(col):
    return F.element_at(F.split(col, "/"), -1)


def read_redirects_nt(spark: SparkSession, path: str) -> DataFrame:
    """S9: redirects.nt -> (src_uri, dst_uri) with resource names only."""
    t = read_ntriples(spark, path)
    return t.select(
        _last_path_segment(F.col("subj")).alias("src_uri"),
        _last_path_segment(F.col("obj")).alias("dst_uri"),
    )


def read_disambiguations_nt(spark: SparkSession, path: str) -> DataFrame:
    t = read_ntriples(spark, path)
    return t.select(_last_path_segment(F.col("subj")).alias("uri")).distinct()


def wiki_markup_spots(documents_flat: DataFrame, text_col: str = "text") -> DataFrame:
    """P10: `[[target|anchor]]` / `[[target]]` wiki markup as spots.
    -> (doc_id, offset, surface_form, uri). Pure regexp, offsets computed on
    the markup text."""
    pat = r"\[\[([^\]\|]+)(?:\|([^\]]+))?\]\]"
    hits = documents_flat.select(
        "doc_id",
        F.col(text_col).alias("_t"),
    ).select(
        "doc_id",
        F.expr(
            f"regexp_extract_all(_t, '{pat}', 0)"
        ).alias("raw"),
        F.expr(
            f"regexp_extract_all(_t, '{pat}', 1)"
        ).alias("targets"),
        "_t",
    )
    ex = hits.select(
        "doc_id", "_t", F.posexplode(F.arrays_zip("raw", "targets")).alias("i", "z")
    )
    target = F.col("z.targets")
    anchor_pat = r"\[\[[^\]\|]+\|([^\]]+)\]\]"
    anchor = F.when(
        F.col("z.raw").contains("|"),
        F.regexp_extract(F.col("z.raw"), anchor_pat, 1),
    ).otherwise(target)
    return ex.select(
        "doc_id",
        F.locate("z.raw", "_t").alias("_ignored"),
        (F.instr("_t", F.col("z.raw")) - 1).alias("offset"),
        anchor.alias("surface_form"),
        F.regexp_replace(target, " ", "_").alias("uri"),
    ).drop("_ignored")


def parse_spot_xml(spark: SparkSession, xml: str) -> DataFrame:
    """P11: `<annotation text=...><surfaceForm name=... offset=.../>...` —
    the /disambiguate endpoint input format, parsed with from_xml-style
    regexes into a spots DataFrame."""
    import re as _re

    text_m = _re.search(r'<annotation\s+text="([^"]*)"', xml)
    text = text_m.group(1) if text_m else ""
    rows = [
        ("doc0", 0, int(m.group(2)), m.group(1), 1.0, "m", [])
        for m in _re.finditer(r'<surfaceForm\s+name="([^"]*)"\s+offset="(\d+)"', xml)
    ]
    schema = (
        "doc_id string, span_pos int, offset int, surface_form string, "
        "spot_prob double, spot_type string, token_stems array<string>"
    )
    spots = spark.createDataFrame(rows, schema)
    docs = spark.createDataFrame([("doc0", text)], "doc_id string, text string")
    return spots, docs
