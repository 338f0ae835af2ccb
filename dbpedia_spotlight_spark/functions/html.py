"""HTML text extraction — the stage between WARC ingestion (io/warc.py)
and the annotate/dedup pipeline for web corpora.

The reference only ever sees pre-extracted text (its live scrapers pull
Yahoo BOSS abstracts: core/.../util/YahooBossSearcher.scala, scoped out
per SURVEY §2.1); a web-scale corpus pipeline must extract text from the
HTML payloads itself. These are deliberately regex-chain extractors —
every function is a pure column-expression chain (regexp_replace /
regexp_extract_all, whole-stage codegen, no UDF), replicable in a SQL
oracle. They are NOT a full HTML5 parser (no malformed-markup recovery,
no CSS visibility, no charset sniffing) — the documented trade for
staying JVM-side at 10^12-document scale; a production pipeline can swap
a trafilatura-style Pandas UDF behind the same column contract where
fidelity beats throughput.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Entity decode table applied AFTER tag stripping. Order matters:
# decoding &amp; LAST means "&amp;lt;" ends as "&lt;" (correct — the
# source author escaped a literal "&lt;"), never double-decoded to "<".
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def html_to_text(html) -> Column:
    """Visible text of an HTML document: drops <head>, <script>, <style>
    and comments wholesale, replaces every remaining tag with a space,
    decodes the common named entities, collapses whitespace. One codegen
    regexp_replace chain."""
    t = _col(html)
    for pat in (
        r"(?is)<head\b.*?</head>",
        r"(?is)<script\b.*?</script>",
        r"(?is)<style\b.*?</style>",
        r"(?s)<!--.*?-->",
        r"<[^>]*>",
    ):
        t = F.regexp_replace(t, pat, " ")
    for ent, rep in _ENTITIES:
        t = F.regexp_replace(t, ent, rep)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_title(html) -> Column:
    """<title> content (first match, whitespace-collapsed)."""
    raw = F.regexp_extract(_col(html), r"(?is)<title[^>]*>(.*?)</title>", 1)
    return F.trim(F.regexp_replace(raw, r"\s+", " "))


def html_links(html) -> Column:
    """href targets of <a> tags (array<string>): double-quoted values in
    document order, then single-quoted ones."""
    h = _col(html)
    dq = F.regexp_extract_all(
        h, F.lit(r"""(?is)<a\b[^>]*\bhref="([^"]*)\""""), 1
    )
    sq = F.regexp_extract_all(
        h, F.lit(r"(?is)<a\b[^>]*\bhref='([^']*)'"), 1
    )
    return F.concat(dq, sq)


def link_density(html) -> Column:
    """Fraction of visible-text characters that live inside <a> anchors —
    the classic boilerplate signal (navigation/footer-heavy pages score
    high). 0.0 when the page has no visible text."""
    h = _col(html)
    total = F.length(html_to_text(h))
    anchors = F.regexp_extract_all(
        h, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), 1
    )
    anchor_chars = F.aggregate(
        anchors,
        F.lit(0),
        lambda acc, a: acc
        + F.length(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(a, r"<[^>]*>", " "), r"\s+", " "
                )
            )
        ),
    )
    return F.when(total == 0, F.lit(0.0)).otherwise(
        anchor_chars.cast("double") / total.cast("double")
    )
