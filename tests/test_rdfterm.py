"""RDF typed-literal term model (functions/rdfterm.py) and the
LANG/DATATYPE/STR/LANGMATCHES SPARQL builtins (operators/kgquery.py).

Vectors follow W3C RDF 1.1 / SPARQL 1.1 §17.4.2-3 and RFC 4647 §3.3.1.
"""

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.functions.rdfterm import (
    XSD_STRING,
    filter_by_lang,
    lang_literal,
    lang_matches,
    term_datatype,
    term_lang,
    term_value,
    typed_literal,
)
from dbpedia_spotlight_spark.operators.kgquery import (
    _filter_expr_sql,
    _SPARQL_RE,
    sparql_select,
)

RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


@pytest.fixture(scope="module")
def terms(spark):
    rows = [
        ('"bonjour"@fr',),
        ('"hello"@en',),
        ('"howdy"@en-US',),
        ('"42"^^<http://www.w3.org/2001/XMLSchema#integer>',),
        ('"plain"',),
        ("http://example.org/iri",),
        ("bare string",),
        ('"esc \\"q\\" and \\\\n"@en',),
    ]
    return spark.createDataFrame(rows, "term string")


def test_accessors(terms):
    got = {
        r["term"]: (r["v"], r["l"], r["dt"])
        for r in terms.select(
            "term",
            term_value("term").alias("v"),
            term_lang("term").alias("l"),
            term_datatype("term").alias("dt"),
        ).collect()
    }
    assert got['"bonjour"@fr'] == ("bonjour", "fr", RDF_LANGSTRING)
    assert got['"howdy"@en-US'][1] == "en-US"
    assert got['"42"^^<http://www.w3.org/2001/XMLSchema#integer>'] == (
        "42", "", "http://www.w3.org/2001/XMLSchema#integer"
    )
    assert got['"plain"'] == ("plain", "", XSD_STRING)
    assert got["http://example.org/iri"] == (
        "http://example.org/iri", "", None
    )
    assert got["bare string"] == ("bare string", "", None)
    # escape unwinding: \" -> ", and \\n (escaped backslash + n) -> \n
    # TWO characters, never a newline
    assert got['"esc \\"q\\" and \\\\n"@en'][0] == 'esc "q" and \\n'


def test_constructors_roundtrip(spark):
    df = spark.createDataFrame(
        [('he said "hi"\n', "en"), ("x\\y", "fr")], "v string, l string"
    )
    built = df.select(
        lang_literal("v", F.col("l")).alias("t"), "v", "l"
    )
    back = built.select(
        (term_value("t") == F.col("v")).alias("v_ok"),
        (term_lang("t") == F.col("l")).alias("l_ok"),
    ).collect()
    assert all(r["v_ok"] and r["l_ok"] for r in back)
    typed = spark.range(1).select(
        typed_literal(
            F.lit("3.14"), "http://www.w3.org/2001/XMLSchema#decimal"
        ).alias("t")
    )
    row = typed.select(
        term_value("t").alias("v"), term_datatype("t").alias("dt")
    ).first()
    assert row["v"] == "3.14"
    assert row["dt"] == "http://www.w3.org/2001/XMLSchema#decimal"


def test_lang_matches_rfc4647(spark):
    df = spark.createDataFrame(
        [("en",), ("en-US",), ("enx",), ("fr",), ("",)], "l string"
    )
    got = {
        r["l"]: (r["en"], r["star"])
        for r in df.select(
            "l",
            lang_matches(F.col("l"), "en").alias("en"),
            lang_matches(F.col("l"), "*").alias("star"),
        ).collect()
    }
    assert got["en"] == (True, True)
    assert got["en-US"] == (True, True)      # range-prefix match
    assert got["enx"] == (False, True)       # NOT a prefix match
    assert got["fr"] == (False, True)
    assert got[""] == (False, False)         # '*' needs a non-empty tag


def test_filter_by_lang(spark):
    tri = spark.createDataFrame(
        [
            ("e1", "p", '"hello"@en'),
            ("e1", "p", '"bonjour"@fr'),
            ("e1", "p", '"howdy"@en-US'),
            ("e1", "p", '"plain"'),
        ],
        "subj string, pred string, obj string",
    )
    got = sorted(r["obj"] for r in filter_by_lang(tri, "en").collect())
    assert got == ['"hello"@en', '"howdy"@en-US']


@pytest.fixture(scope="module")
def tagged_triples(spark):
    return spark.createDataFrame(
        [
            ("e1", "http://x/label", '"bonjour"@fr'),
            ("e1", "http://x/label", '"hello"@en'),
            ("e1", "http://x/label", '"howdy"@en-US'),
            ("e2", "http://x/label",
             '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
            ("e2", "http://x/label", '"plain"'),
            ("e3", "http://x/label", "bare"),
        ],
        "subj string, pred string, obj string",
    )


def test_sparql_langmatches(tagged_triples):
    got = sorted(
        r["o"]
        for r in sparql_select(
            tagged_triples,
            "SELECT ?s ?o WHERE { ?s <http://x/label> ?o . "
            "FILTER(LANGMATCHES(LANG(?o), 'en')) }",
        ).collect()
    )
    assert got == ['"hello"@en', '"howdy"@en-US']


def test_sparql_lang_exact_and_star(tagged_triples):
    q = (
        "SELECT ?o WHERE { ?s <http://x/label> ?o . "
        "FILTER(LANG(?o) = 'fr') }"
    )
    assert [r["o"] for r in sparql_select(tagged_triples, q).collect()] == [
        '"bonjour"@fr'
    ]
    q2 = (
        "SELECT ?o WHERE { ?s <http://x/label> ?o . "
        "FILTER(LANGMATCHES(LANG(?o), '*')) }"
    )
    assert sparql_select(tagged_triples, q2).count() == 3


def test_sparql_datatype_and_str(tagged_triples):
    q = (
        "SELECT ?s WHERE { ?s <http://x/label> ?o . "
        "FILTER(DATATYPE(?o) = "
        "'http://www.w3.org/2001/XMLSchema#integer') }"
    )
    assert [r["s"] for r in sparql_select(tagged_triples, q).collect()] == [
        "e2"
    ]
    q2 = (
        "SELECT ?o WHERE { ?s <http://x/label> ?o . "
        "FILTER(STR(?o) = 'hello') }"
    )
    assert [r["o"] for r in sparql_select(tagged_triples, q2).collect()] == [
        '"hello"@en'
    ]
    # STR on a bare term passes through
    q3 = (
        "SELECT ?o WHERE { ?s <http://x/label> ?o . "
        "FILTER(STR(?o) = 'bare') }"
    )
    assert sparql_select(tagged_triples, q3).count() == 1


def test_translation_nested_and_errors():
    toks = _SPARQL_RE.findall("LANGMATCHES(LANG(?o), 'en')")
    sql = _filter_expr_sql(toks)
    assert "regexp_extract" in sql and "LIKE" in sql
    with pytest.raises(ValueError, match="expects 2"):
        _filter_expr_sql(_SPARQL_RE.findall("LANGMATCHES(?o)"))
    with pytest.raises(ValueError, match="unbalanced"):
        _filter_expr_sql(_SPARQL_RE.findall("LANG(?o"))


def test_lang_builtin_on_optional_variable(spark, tagged_triples):
    # LANG over an optional-only variable must defer past the left join.
    extra = spark.createDataFrame(
        [("e1", "http://x/alt", '"salut"@fr')],
        "subj string, pred string, obj string",
    )
    tri = tagged_triples.unionByName(extra)
    q = (
        "SELECT ?s ?a WHERE { ?s <http://x/label> ?o . "
        "OPTIONAL { ?s <http://x/alt> ?a . } "
        "FILTER(LANG(?a) = 'fr') }"
    )
    got = sparql_select(tri, q).distinct().collect()
    assert [(r["s"], r["a"]) for r in got] == [("e1", '"salut"@fr')]
