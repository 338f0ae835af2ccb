"""N-Triples / Turtle serializers (functions/rdf.py)."""

from dbpedia_spotlight_spark.functions.rdf import (
    nt_escape,
    to_ntriples,
    to_turtle,
)


def _tri(spark):
    return spark.createDataFrame(
        [
            ("http://ex/s1", "http://ex/p1", "http://ex/o1"),
            ("http://ex/s1", "http://ex/p2", 'lit "q" \\ and\nnewline\ttab'),
            ("http://ex/s2", "http://ex/p1", "plain"),
        ],
        "subj string, pred string, obj string",
    )


def test_nt_escape(spark):
    df = spark.createDataFrame([('a"b\\c\nd\re\tf',)], "obj string")
    got = df.select(nt_escape("obj").alias("e")).first().e
    assert got == 'a\\"b\\\\c\\nd\\re\\tf'


def test_to_ntriples_iri_vs_literal(spark):
    lines = sorted(r.line for r in to_ntriples(_tri(spark)).collect())
    assert "<http://ex/s1> <http://ex/p1> <http://ex/o1> ." in lines
    assert (
        '<http://ex/s1> <http://ex/p2> "lit \\"q\\" \\\\ and\\nnewline\\ttab" .'
        in lines
    )
    assert '<http://ex/s2> <http://ex/p1> "plain" .' in lines
    assert len(lines) == 3


def test_to_turtle_groups_and_orders(spark):
    rows = {r.subj: r.block for r in to_turtle(_tri(spark)).collect()}
    assert rows["http://ex/s2"] == '<http://ex/s2> <http://ex/p1> "plain" .'
    b = rows["http://ex/s1"]
    # both predicates in one block, ';'-joined, deterministic order
    assert b.startswith("<http://ex/s1> <http://ex/p1> <http://ex/o1> ;\n")
    assert b.endswith(' .')
    assert "<http://ex/p2>" in b
    assert b.count(";") == 1
