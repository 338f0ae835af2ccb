"""Wikipedia XML dump source — S1 full (SURVEY.md §2.1).

Reference pipeline (index/src/main/scala/org/dbpedia/spotlight/io/
WikiOccurrenceSource.scala:90-170):
    XML dump -> pages (Main namespace only) -> strip markup but keep links
    (core/.../string/WikiMarkupStripper.scala:35-190) -> skip redirect and
    disambiguation pages -> split into paragraphs (splitDocumentRegex :36)
    -> per paragraph, harvest [[target|anchor]] links into
    DBpediaResourceOccurrences with clean-text offsets (:133-170).

Spark design: the dump is read as one row per <page> fragment
(spark.read lineSep="</page>" — an XML dump is splittable on the page
boundary, so a 100 TB dump scans in parallel with no custom InputFormat);
page-field extraction and the whole markup-strip chain are native
regexp_extract / regexp_replace column ops (Java regex — the same engine
the reference's replaceAll uses), so everything up to link harvesting
stays in whole-stage codegen. Only the per-paragraph link walk (clean
text + offset bookkeeping) runs in Python, as one vectorized mapInPandas
pass, mirroring io/corpora.read_wikilink_corpus.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.io.corpora import _CORPUS_SCHEMA

# ref WikiOccurrenceSource.scala:36
SPLIT_PARAGRAPH_REGEX = r"(\n|(<br\s?/?>))(</?\w+?\s?/?>)?(\n|(<br\s?/?>))+"

_STRIP_SECTIONS = ("see also", "references", "further reading", "external links")


def _unescape_xml(col: Column) -> Column:
    """Minimal XML/HTML entity decode (the dump escapes text nodes; the
    reference calls StringEscapeUtils.unescapeHtml —
    WikiMarkupStripper.scala:36). &amp; must decode last."""
    out = col
    for ent, ch in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ]:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def strip_wiki_markup(col: Column) -> Column:
    """WikiMarkupStripper.stripEverything as a native regexp_replace chain
    (ref WikiMarkupStripper.scala:35-50; individual passes cited inline).
    Links ([[...]]) survive — they are harvested downstream."""
    out = _unescape_xml(col)
    # stripSection (:95-115): two passes per section name; the first keeps
    # the terminator group, the second keeps the trailing blank line
    for name in _STRIP_SECTIONS:
        out = F.regexp_replace(
            out, r"(?is)(={2,})\s*" + name + r"\s*\1.*?([^=]\1[^=])", r"$2"
        )
        out = F.regexp_replace(
            out, "(?is)(={2,})\\s*" + name + "\\s*\\1\\W*.*?\n\n", "\n\n"
        )
    # stripMagicWords (:138-140)
    out = F.regexp_replace(out, r"__(\p{Upper}+__)", "")
    # templates/tables: the reference drops TemplateNode/TableNode when the
    # SimpleWikiParser walks the page (WikiOccurrenceSource.scala:140-158
    # keeps only TextNode and InternalLinkNode); regex twin, innermost-out
    # three passes for nesting
    for _ in range(3):
        out = F.regexp_replace(out, r"(?s)\{\{[^{}]*\}\}", "")
    out = F.regexp_replace(out, r"(?s)\{\|.*?\|\}", "")
    # stripFormatting (:147-152)
    out = F.regexp_replace(out, r"'{2,}", "")
    out = F.regexp_replace(out, r"={2,}", "")
    out = F.regexp_replace(out, "\n:+", "\n")
    # stripBullets (:195-197)
    out = F.regexp_replace(out, r"\n\*+[^\w\[]*", "\n")
    # stripHTML (:166-171): comments, refs, then any remaining tag
    out = F.regexp_replace(out, r"(?s)<!--(.*?)-->", "")
    out = F.regexp_replace(out, r"(?s)<ref>(.*?)</ref>", "")
    out = F.regexp_replace(out, r"(?s)<ref\s(.*?)>(.*?)</ref>", "")
    out = F.regexp_replace(out, r"<([^>]*?)>", "")
    # stripExcessNewlines (:181-183)
    out = F.regexp_replace(out, "\n{3,}", "\n\n")
    return out


def parse_pages(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """One row per <page> fragment -> (title, ns, redirect, markup).
    Field extraction is native regexp_extract (column-pruned, codegen)."""
    v = F.col(value_col)
    return (
        raw.select(
            _unescape_xml(
                F.regexp_extract(v, r"<title>([^<]*)</title>", 1)
            ).alias("title"),
            F.coalesce(
                F.nullif(F.regexp_extract(v, r"<ns>(\d+)</ns>", 1), F.lit("")),
                F.lit("0"),
            ).cast("int").alias("ns"),
            F.regexp_extract(v, r"<redirect[^>]*title=\"([^\"]*)\"", 1).alias(
                "redirect"
            ),
            F.regexp_extract(v, r"(?s)<text[^>]*>(.*?)</text>", 1).alias(
                "markup"
            ),
        )
        .filter(F.col("title") != "")
    )


def article_pages(pages: DataFrame) -> DataFrame:
    """Main-namespace articles only; redirect and disambiguation pages are
    excluded (ref WikiOccurrenceSource.scala:107 — !isRedirect &&
    !isDisambiguation; redirects also match '#REDIRECT' markup)."""
    return pages.filter(
        (F.col("ns") == 0)
        & (F.col("redirect") == "")
        & ~F.upper(F.col("markup")).startswith("#REDIRECT")
        & ~F.col("title").endswith("(disambiguation)")
        & ~F.col("markup").rlike(r"\{\{\s*[Dd]isambig")
    )


def split_paragraphs(pages: DataFrame) -> DataFrame:
    """(title, clean markup-with-links) -> one row per paragraph with the
    reference's id scheme '<Title_encoded>-p<N>' (N 1-based;
    ref WikiOccurrenceSource.scala:110-115)."""
    cleaned = pages.select(
        F.regexp_replace("title", " ", "_").alias("_t"),
        F.split(strip_wiki_markup(F.col("markup")), SPLIT_PARAGRAPH_REGEX).alias(
            "_paras"
        ),
    )
    return (
        cleaned.select(
            "_t", F.posexplode("_paras").alias("_i", "para_markup")
        )
        .filter(F.trim("para_markup") != "")
        .select(
            F.concat_ws("", F.col("_t"), F.lit("-p"), (F.col("_i") + 1)).alias(
                "doc_id"
            ),
            "para_markup",
        )
    )


_LINK_RE = re.compile(r"\[\[(.*?)\]\]")
_PAREN_SUFFIX_RE = re.compile(r" \(.+?\)$")
_LEADING_ARTICLE_RE = re.compile(r"^(The|A) ")

# Namespaces whose links carry no occurrence (the reference resolves the
# parsed Namespace and keeps Namespace.Main only). A bare ":" test is NOT a
# namespace check — Main-namespace titles legitimately contain colons
# ("Star Trek: First Contact"), so only a *known* prefix before the colon
# demotes a link. Standard MediaWiki namespaces + their common aliases +
# interwiki/interlanguage codes (2-3 lowercase letters, optionally
# region-qualified, e.g. "fr", "pt-br", "zh-min-nan").
_NON_MAIN_NAMESPACES = frozenset(
    ns.lower()
    for ns in (
        "Media", "Special", "Talk", "User", "User talk", "Wikipedia",
        "Wikipedia talk", "Project", "Project talk", "File", "File talk",
        "Image", "Image talk", "MediaWiki", "MediaWiki talk", "Template",
        "Template talk", "Help", "Help talk", "Category", "Category talk",
        "Portal", "Portal talk", "Book", "Draft", "TimedText", "Module",
        "Wikt", "Wiktionary", "Wikisource", "Wikibooks", "Wikiquote",
        "Wikinews", "Wikiversity", "Wikivoyage", "Wikidata", "Commons",
        "Meta", "Incubator", "Species",
    )
)
_LANG_CODE_RE = re.compile(r"^[a-z]{2,3}(-[a-z-]+)?$")


def _is_main_namespace(dest: str) -> bool:
    head, sep, _ = dest.partition(":")
    if not sep:
        return True
    prefix = head.strip().lower()
    if prefix == "":  # "[[:Category:X]]"-style escaped links
        return False
    return not (
        prefix in _NON_MAIN_NAMESPACES or _LANG_CODE_RE.match(prefix)
    )


def parse_paragraph_links(markup: str) -> tuple:
    """-> (clean_text, [(uri, surface_form, offset, 1.0)]). Exact twin of
    WikiOccurrenceSource.getOccurrences (:133-170): the anchor text takes
    the last pipe part (stripMultiPipe), is trimmed, loses a trailing
    ' (...)' qualifier and a leading 'The |A '; the *cleaned* anchor is what
    enters the paragraph text; links outside the Main namespace contribute
    text but no occurrence; whitespace is normalized to single spaces at the
    end (Text instance :161)."""
    clean = []
    gold = []
    last = 0
    length = 0
    for m in _LINK_RE.finditer(markup):
        pre = markup[last : m.start()]
        clean.append(pre)
        length += len(pre)
        inner = m.group(1)
        dest = inner.split("|", 1)[0]
        sf = inner.rsplit("|", 1)[-1]  # stripMultiPipe (:159-161)
        sf = sf.strip()
        sf = _PAREN_SUFFIX_RE.sub("", sf)
        sf = _LEADING_ARTICLE_RE.sub("", sf)
        offset = length
        clean.append(sf)
        length += len(sf)
        if sf and _is_main_namespace(dest):  # Main namespace only (:155)
            uri = dest.strip().replace(" ", "_")
            gold.append((uri, sf, offset, 1.0))
        last = m.end()
    clean.append(markup[last:])
    text = re.sub(r"\s", " ", "".join(clean))
    return text, gold


def paragraph_occurrences(paragraphs: DataFrame) -> DataFrame:
    """(doc_id, para_markup) -> _CORPUS_SCHEMA (doc_id, text, gold).
    Vectorized mapInPandas; one Python pass per paragraph batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "text": [], "gold": []}
            for doc_id, markup in zip(pdf["doc_id"], pdf["para_markup"]):
                text, gold = parse_paragraph_links(markup or "")
                rows["doc_id"].append(doc_id)
                rows["text"].append(text)
                rows["gold"].append(gold)
            yield pd.DataFrame(rows)

    return paragraphs.mapInPandas(run, _CORPUS_SCHEMA)


def read_xml_dump(spark: SparkSession, path: str) -> DataFrame:
    """XML dump file(s) -> corpus (doc_id, text, gold) — the reference's
    fromXMLDumpFile end to end (WikiOccurrenceSource.scala:40-45)."""
    raw = spark.read.option("lineSep", "</page>").text(path)
    return dump_corpus(raw)


def dump_corpus(raw_fragments: DataFrame, value_col: str = "value") -> DataFrame:
    """<page> fragments -> corpus (doc_id, text, gold)."""
    pages = article_pages(parse_pages(raw_fragments, value_col))
    return paragraph_occurrences(split_paragraphs(pages))
