"""String/text scalar functions — all JVM-side column expressions where used
in the hot path, with Python twins for driver-side dictionary building.

Reference semantics:
  - text normalization `’` -> `'`:
      core/src/main/scala/org/dbpedia/spotlight/model/Text.scala:25-27,
      core/.../model/SurfaceForm.scala:36
  - surface-form normalization (lowercase, punct->space, drop the/an/a):
      core/.../db/memory/MemorySurfaceFormStore.scala:40-41
  - URI cleanup (strip anchor, decode, wiki-encode):
      index/.../db/WikipediaToDBpediaClosure.scala:72-86,
      core/.../model/DBpediaResource.scala:33-35
"""

from __future__ import annotations

import re
import string

from pyspark.sql import Column
from pyspark.sql import functions as F

SF_STOPWORDS = ("the", "an", "a")

_PUNCT_RE = re.compile(r"[%s]+" % re.escape(string.punctuation))
_WS_RE = re.compile(r"\s+")


def normalize_text_py(text: str) -> str:
    return text.replace("’", "'")


def normalize_text_col(col: Column) -> Column:
    return F.regexp_replace(col, "’", "'")


def normalize_surface_form_py(sf: str) -> str:
    """Normalized SF key; leading '/' marks the normalized namespace so raw
    and normalized keys share one lookup map (ref MemorySurfaceFormStore.scala:40-41).

    Deviation from the reference (documented): consecutive separators
    collapse to one space (Java's split("") empty-token artifacts are not
    reproduced). Applied identically when building the dim table and when
    probing, so lookups are self-consistent.
    """
    s = _PUNCT_RE.sub(" ", sf).lower()
    words = [w for w in _WS_RE.split(s) if w and w not in SF_STOPWORDS]
    return "/" + " ".join(words)


def normalize_surface_form_col(col: Column) -> Column:
    """Column twin of normalize_surface_form_py (kept in lockstep; tested)."""
    s = F.lower(F.regexp_replace(col, r"[\p{Punct}]+", " "))
    words = F.filter(
        F.split(F.trim(s), r"\s+"),
        lambda w: (w != "") & ~w.isin(*SF_STOPWORDS),
    )
    return F.concat(F.lit("/"), F.array_join(words, " "))


STRIPPED_SECTIONS = ("see also", "references", "further reading", "external links")


def strip_wiki_markup_col(col: Column, sections=STRIPPED_SECTIONS) -> Column:
    """Wiki markup stripping as chained JVM-side regexp passes
    (ref core/.../string/WikiMarkupStripper.scala:30-193 stripEverything:
    sections -> magic words -> formatting -> bullets -> HTML/refs/comments ->
    excess newlines). The reference's two-pass stripSection stateful matcher
    is approximated with one DOTALL pass per section (drop from the heading
    to the next heading or end); applied identically everywhere, so
    downstream counts stay self-consistent."""
    out = col
    for name in sections:
        out = F.regexp_replace(
            out, r"(?is)(={2,})\s*" + name + r"\s*\1.*?(?=\n={2,}[^=]|\z)", "\n"
        )
    out = F.regexp_replace(out, r"__\p{Upper}+__", "")          # magic words
    out = F.regexp_replace(out, r"'{2,}", "")                    # bold/italic
    out = F.regexp_replace(out, r"={2,}", "")                    # headings
    out = F.regexp_replace(out, r"\n:+", "\n")                   # indents
    out = F.regexp_replace(out, r"\n\*+[^\w\[]*", "\n")          # bullets
    out = F.regexp_replace(out, r"(?s)<!--(.*?)-->", "")         # comments
    out = F.regexp_replace(out, r"(?s)<ref>(.*?)</ref>", "")     # refs
    out = F.regexp_replace(out, r"(?s)<ref\s(.*?)>(.*?)</ref>", "")
    out = F.regexp_replace(out, r"<([^>]*?)>", "")               # any tag
    out = F.regexp_replace(out, r"\n{3,}", "\n\n")               # newlines
    return out


def wiki_clean_uri_col(col: Column) -> Column:
    """Canonical URI key: strip fragment anchor, URL-decode, space->underscore
    (ref WikipediaToDBpediaClosure.scala:72-86)."""
    no_anchor = F.regexp_replace(col, "#.*$", "")
    return F.regexp_replace(F.url_decode(no_anchor), " ", "_")


def wiki_clean_uri_py(uri: str) -> str:
    from urllib.parse import unquote

    return unquote(uri.split("#")[0]).replace(" ", "_")
