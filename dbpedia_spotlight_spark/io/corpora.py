"""Evaluation-corpus readers — SURVEY.md §5: the reference's gold corpora
as DataFrames (clean documents + gold occurrences).

Reference:
  - MilneWittenCorpus (eval/src/main/scala/org/dbpedia/spotlight/corpus/
    MilneWittenCorpus.scala:48-84): `[[uri|surface form|confidence]]`
    wikilink markup; parsing rebuilds the clean text and clean-text
    offsets by accumulating the markup/clean length difference.
  - WikipediaHeldoutCorpus (index/src/main/scala/org/dbpedia/spotlight/io/
    WikipediaHeldoutCorpus.scala:22-45): wikilinks as gold, redirects
    resolved, only ambiguous surface forms kept (getAmbiguity > 1).
  - AIDA/CSAW/KBP readers share the shape: (doc, gold spans) — the TSV
    5-col path (io/sources.read_annotated_tsv) covers those exports.

The parser is a mapInPandas batch function (one Python pass per document,
no per-row DataFrame Python).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WIKILINK_RE = re.compile(r"\[\[(.*?)\]\]")


def parse_wiki_annotations(markup: str) -> tuple:
    """-> (clean_text, [(uri, surface_form, clean_offset, confidence)]).
    Exact twin of MilneWittenCorpus.parse (offset bookkeeping via
    accumulated length difference)."""
    clean = []
    gold = []
    last = 0
    removed = 0
    for m in _WIKILINK_RE.finditer(markup):
        parts = m.group(1).split("|")
        uri = parts[0].replace(" ", "_")
        sf = parts[1] if len(parts) > 1 else parts[0]
        conf = float(parts[2]) if len(parts) > 2 else 1.0
        clean.append(markup[last:m.start()])
        offset = m.start() - removed
        clean.append(sf)
        gold.append((uri, sf, offset, conf))
        removed += (m.end() - m.start()) - len(sf)
        last = m.end()
    clean.append(markup[last:])
    return "".join(clean), gold


_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "gold",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("uri", T.StringType()),
                        T.StructField("surface_form", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                        T.StructField("confidence", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def read_wikilink_corpus(
    markup_docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, markup text) -> (doc_id, clean text, gold array<struct>)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "text": [], "gold": []}
            for doc_id, markup in zip(pdf[id_col], pdf[text_col]):
                clean, gold = parse_wiki_annotations(markup or "")
                rows["doc_id"].append(str(doc_id))
                rows["text"].append(clean)
                rows["gold"].append(gold)
            yield pd.DataFrame(rows)

    return markup_docs.select(id_col, text_col).mapInPandas(run, _CORPUS_SCHEMA)


def gold_occurrences(corpus: DataFrame) -> DataFrame:
    """Explode the gold spans: (doc_id, offset, surface_form, uri, confidence)."""
    g = corpus.select("doc_id", F.explode("gold").alias("g"))
    return g.select(
        "doc_id",
        F.col("g.offset").alias("offset"),
        F.col("g.surface_form").alias("surface_form"),
        F.col("g.uri").alias("uri"),
        F.col("g.confidence").alias("confidence"),
    )


def heldout_gold(
    corpus: DataFrame,
    closure: DataFrame | None = None,
    surface_forms: DataFrame | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """WikipediaHeldoutCorpus gold filter: resolve redirects, keep only
    surface forms with ambiguity > 1 (ref WikipediaHeldoutCorpus.scala:30-45)."""
    from dbpedia_spotlight_spark.operators.closure import resolve_uris

    g = gold_occurrences(corpus)
    if closure is not None:
        g = resolve_uris(g, closure, "uri")
    if surface_forms is not None and candidates is not None:
        ambiguity = (
            surface_forms.select("sf_id", "surface_form")
            .join(candidates, "sf_id")
            .groupBy("surface_form")
            .agg(F.countDistinct("res_id").alias("_n"))
            .filter(F.col("_n") > 1)
            .select("surface_form")
        )
        g = g.join(F.broadcast(ambiguity), "surface_form", "left_semi")
    return g
