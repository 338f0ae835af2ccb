"""RDF 1.1 typed-literal term model over the engine's string triple tables.

The triple tables store every term as one string column. Plain strings
and bare ``http(s)://`` IRIs stay as-is (the engine convention,
functions/rdf.py); this module adds the two remaining RDF 1.1 literal
forms in their N-Triples lexical syntax, kept INSIDE the string column
so every existing operator (joins, closure, serializers) works on typed
data unchanged:

    "bonjour"@fr                      language-tagged string
    "42"^^<http://www.w3.org/2001/XMLSchema#integer>   typed literal

Constructors (`lang_literal`, `typed_literal`) escape and tag;
accessors (`term_value`, `term_lang`, `term_datatype`) parse the form
back out with anchored regexes; `lang_matches` implements SPARQL
langMatches basic filtering (RFC 4647 §3.3.1: ``*`` matches any
non-empty tag, otherwise case-insensitive exact or ``range-`` prefix).
The same regexes back the LANG / DATATYPE / STR / LANGMATCHES builtins
in the SPARQL front end (operators/kgquery.py:_filter_expr_sql).

Reference: the reference's output side carries lang-tagged NIF strings
(e.g. nif:anchorOf "..."@en in its linked-data exports) while its
internal stores are untagged strings — same split as here. All pure
column expressions (regexp_extract / replace chains), whole-stage
codegen, no UDF; DuckDB's regexp_extract shares the semantics, so
oracle twins replay term parsing exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.functions.rdf import _col, nt_escape

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"

# Anchored lexical forms (escaped-quote aware: the value part is
# (?:[^"\\]|\\.)* so an escaped \" inside the literal never ends it).
_VALUE_RE = r'^"((?:[^"\\]|\\.)*)"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]+>)?$'
_LANG_RE = r'^"(?:[^"\\]|\\.)*"@([A-Za-z][A-Za-z0-9-]*)$'
_DT_RE = r'^"(?:[^"\\]|\\.)*"\^\^<([^>]+)>$'


def lang_literal(value, lang) -> Column:
    """``"value"@lang`` — SPARQL STRLANG. `value` follows the module
    convention (str = column name); `lang` is a Column or a plain tag
    string (str = literal BCP-47 tag, the common case)."""
    return F.concat(F.lit('"'), nt_escape(value), F.lit('"@'), _lit(lang))


def typed_literal(value, datatype) -> Column:
    """``"value"^^<datatype>`` — SPARQL STRDT. `datatype` is a Column
    or a literal IRI string."""
    return F.concat(
        F.lit('"'), nt_escape(value), F.lit('"^^<'), _lit(datatype),
        F.lit(">"),
    )


def _lit(c) -> Column:
    return c if isinstance(c, Column) else F.lit(c)


def term_value(term) -> Column:
    """Lexical value: quoted literals (tagged or not) lose their quotes
    and tag (escapes unwound); IRIs and plain strings pass through —
    SPARQL STR semantics."""
    t = _col(term)
    raw = F.regexp_extract(t, _VALUE_RE, 1)
    # Escaped backslashes go through a sentinel first, so "\\n" (escaped
    # backslash + n) never gets misread as an escaped newline — the
    # standard single-pass-equivalent unescape with replace chains.
    unescaped = F.replace(raw, F.lit("\\\\"), F.lit("\x00"))
    for esc, plain in (
        ("\\t", "\t"), ("\\r", "\r"), ("\\n", "\n"), ('\\"', '"'),
    ):
        unescaped = F.replace(unescaped, F.lit(esc), F.lit(plain))
    unescaped = F.replace(unescaped, F.lit("\x00"), F.lit("\\"))
    return F.when(t.rlike(_VALUE_RE), unescaped).otherwise(t)


def term_lang(term) -> Column:
    """Language tag of a tagged literal, '' otherwise — SPARQL LANG
    (which returns the empty string, not NULL, for untagged terms)."""
    return F.regexp_extract(_col(term), _LANG_RE, 1)


def term_datatype(term) -> Column:
    """Datatype IRI: the ^^ tag when present, xsd:string for plain
    quoted literals, NULL for IRIs/bare strings (SPARQL DATATYPE is an
    error on IRIs; NULL is this engine's error convention)."""
    t = _col(term)
    dt = F.regexp_extract(t, _DT_RE, 1)
    return (
        F.when(dt != "", dt)
        .when(t.rlike(_LANG_RE),
              F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
        .when(t.rlike(_VALUE_RE), F.lit(XSD_STRING))
    )


def lang_matches(lang, lang_range: str) -> Column:
    """SPARQL langMatches(lang, range) — RFC 4647 basic filtering:
    range '*' matches any non-empty tag; otherwise the tag matches when
    it equals the range case-insensitively or extends it with a '-'
    subtag ('en' matches 'en' and 'en-US', not 'enx')."""
    tag = F.lower(_col(lang))
    if lang_range == "*":
        return tag != ""
    r = lang_range.lower()
    return (tag == r) | tag.startswith(r + "-")


def filter_by_lang(
    triples: DataFrame, lang_range: str, obj: str = "obj"
) -> DataFrame:
    """Keep triples whose object literal's language tag matches the
    range — the one-liner a multilingual KG export runs per locale.
    Pure codegen filter; pushes to the scan."""
    return triples.filter(lang_matches(term_lang(F.col(obj)), lang_range))
