"""Wiki-markup KG extraction (io/wikiextract.py): categories, infobox
properties, interlanguage sameAs."""

from dbpedia_spotlight_spark.io.wikiextract import (
    category_triples,
    infobox_triples,
    interlanguage_sameas,
    wiki_kg_triples,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_category_triples_sortkey_dedup_underscore(spark):
    docs = _docs(
        spark,
        [
            ("d1", "x [[Category:Ancient Rome]] y [[Category:Cities|sort]] z"),
            ("d2", "[[Category:Cities]] and again [[Category:Cities]]"),
            ("d3", "no categories here [[Paris]]"),
        ],
    )
    got = {tuple(r) for r in category_triples(docs).collect()}
    assert got == {
        ("page:d1", "dcterms:subject", "Category:Ancient_Rome"),
        ("page:d1", "dcterms:subject", "Category:Cities"),
        ("page:d2", "dcterms:subject", "Category:Cities"),
    }


def test_interlanguage_sameas_only_two_letter_prefixes(spark):
    docs = _docs(
        spark,
        [
            ("d1", "[[de:Paris]] [[fr:Paris]] [[Category:X]] [[Paris]]"),
        ],
    )
    got = {tuple(r) for r in interlanguage_sameas(docs).collect()}
    assert got == {
        ("page:d1", "owl:sameAs", "de:Paris"),
        ("page:d1", "owl:sameAs", "fr:Paris"),
    }


def test_infobox_triples_type_and_properties(spark):
    docs = _docs(
        spark,
        [
            (
                "d1",
                "{{Infobox settlement | name = Paris City | pop = 2100000 "
                "| empty = | motto = Fluctuat nec mergitur}} body text",
            ),
            ("d2", "plain text, no box"),
        ],
    )
    got = {tuple(r) for r in infobox_triples(docs).collect()}
    assert got == {
        ("page:d1", "rdf:type", "Infobox:settlement"),
        ("page:d1", "prop:name", "Paris City"),
        ("page:d1", "prop:pop", "2100000"),
        ("page:d1", "prop:motto", "Fluctuat nec mergitur"),
    }


def test_wiki_kg_triples_union(spark):
    docs = _docs(
        spark,
        [("d1", "{{Infobox person | name = Ada}} [[Category:People]] [[en:Ada]]")],
    )
    preds = {r.pred for r in wiki_kg_triples(docs).collect()}
    assert preds == {"rdf:type", "prop:name", "dcterms:subject", "owl:sameAs"}
