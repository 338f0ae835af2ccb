"""S12 serializers: JSON/XML/HTML/RDFa response shapes vs the reference's
OutputManager.java field sets (rest/.../OutputManager.java:78-320)."""

import json

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.pipeline.serializers import (
    RESOURCE_FIELDS,
    annotations_to_html,
    annotations_to_json,
    annotations_to_rdfa,
    annotations_to_xml,
)


@pytest.fixture(scope="module")
def ann(spark):
    rows = [
        # doc 1: two mentions, out of offset order on purpose
        ("d1", 14, "Berlin", "Berlin", 120, 0.95, 0.1, ["City", "Capital"]),
        ("d1", 0, "Apache Spark", "Apache_Spark", 57, 0.8, 0.25, []),
        # doc 2: none (absent from ann entirely)
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, offset int, surface_form string, uri string, "
        "support long, similarity_score double, "
        "percentage_second_rank double, types array<string>",
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            ("d1", 'Apache Spark is in "Berlin" & <fast>'),
            ("d2", "no mentions here"),
        ],
        "doc_id string, text string",
    )


def test_json_field_parity_and_order(ann, docs):
    out = {
        r.doc_id: json.loads(r.json)
        for r in annotations_to_json(ann, docs).collect()
    }
    d1 = out["d1"]
    # reference Annotation attributes (makeXML :89-95) as @-keys
    assert list(d1.keys()) == ["@text", "@confidence", "@support", "Resources"]
    assert d1["@text"] == 'Apache Spark is in "Berlin" & <fast>'
    assert d1["@confidence"] == "0.1" and d1["@support"] == "10"
    res = d1["Resources"]
    assert [r["@offset"] for r in res] == ["0", "14"]  # offset-sorted
    # reference Resource attribute set + order (getResourcesXml :126-134)
    assert list(res[0].keys()) == ["@" + f for f in RESOURCE_FIELDS]
    assert res[0]["@URI"] == "Apache_Spark"
    assert res[0]["@support"] == "57"
    assert res[0]["@types"] == ""
    assert res[1]["@types"] == "City,Capital"
    assert res[0]["@similarityScore"] == "0.8"
    assert res[1]["@percentageOfSecondRank"] == "0.1"
    # all values are strings (the reference writes CDATA attributes)
    assert all(isinstance(v, str) for r in res for v in r.values())
    assert out["d2"]["Resources"] == []


def test_xml_structure_and_escaping(ann, docs):
    out = {r.doc_id: r.xml for r in annotations_to_xml(ann, docs).collect()}
    x = out["d1"]
    assert x.startswith(
        '<Annotation text="Apache Spark is in &quot;Berlin&quot; '
        "&amp; &lt;fast&gt;\" confidence=\"0.1\" support=\"10\""
    )
    assert 'sparql="" policy="whitelist">' in x
    assert x.endswith("</Resources></Annotation>")
    # resource attributes in reference order, offset-sorted
    first = x.split("<Resource ")[1].split("/>")[0]
    for a, b in zip(RESOURCE_FIELDS, RESOURCE_FIELDS[1:]):
        assert first.index(f'{a}="') < first.index(f'{b}="')
    assert 'URI="Apache_Spark"' in first
    assert x.index('URI="Apache_Spark"') < x.index('URI="Berlin"')
    # no-mention doc: no Resources element at all (reference emits none)
    assert out["d2"] == (
        '<Annotation text="no mentions here" confidence="0.1" '
        'support="10" types="" sparql="" policy="whitelist"></Annotation>'
    )


def _py_splice(text, mentions, link_fn):
    """Reference makeWebRepresentation splice (:250-268) in plain Python."""
    added = 0
    out = text
    for off, sf, uri, types in sorted(mentions):
        end = off + added + len(sf)
        link = link_fn(uri, sf, types)
        out = out[: off + added] + link + out[end:]
        added += len(link) - len(sf)
    return out.replace("\n", "<br/>")


def test_html_splice_matches_reference_algorithm(spark):
    text = "Apache Spark runs in Berlin\ntoday"
    mentions = [
        (0, "Apache Spark", "Apache_Spark", []),
        (21, "Berlin", "Berlin", ["City"]),
    ]
    ann = spark.createDataFrame(
        [
            ("d", off, sf, uri, 1, 0.5, 0.5, types)
            for off, sf, uri, types in mentions
        ],
        "doc_id string, offset int, surface_form string, uri string, "
        "support long, similarity_score double, "
        "percentage_second_rank double, types array<string>",
    )
    docs = spark.createDataFrame([("d", text)], "doc_id string, text string")
    got = annotations_to_html(ann, docs).collect()[0].html

    def link(uri, sf, types):
        return f'<a href="{uri}" title="{uri}" target="_blank">{sf}</a>'

    body = _py_splice(text, mentions, link)
    assert body in got
    assert got.index("<div>") < got.index(body)


def test_rdfa_typed_vs_plain_links(spark):
    ann = spark.createDataFrame(
        [
            ("d", 0, "Paris", "Paris", 1, 0.5, 0.5, ["Place", "City"]),
            ("d", 9, "Texas", "Texas", 1, 0.5, 0.5, []),
        ],
        "doc_id string, offset int, surface_form string, uri string, "
        "support long, similarity_score double, "
        "percentage_second_rank double, types array<string>",
    )
    docs = spark.createDataFrame(
        [("d", "Paris and Texas")], "doc_id string, text string"
    )
    got = annotations_to_rdfa(ann, docs).collect()[0].html
    # typed mention: typeof= with the MOST SPECIFIC (last) type (:305-311)
    assert '<a about="Paris" typeof="City" href="Paris" title="Paris">' in got
    # untyped mention: plain about/href/title/target form
    assert (
        '<a about="Texas" href="Texas" title="Texas" target="_blank" >' in got
    )


def test_empty_annotation_set_echoes_text(spark, docs):
    empty = spark.createDataFrame(
        [],
        "doc_id string, offset int, surface_form string, uri string, "
        "support long, similarity_score double, "
        "percentage_second_rank double, types array<string>",
    )
    got = {r.doc_id: r.html for r in annotations_to_html(empty, docs).collect()}
    assert "no mentions here" in got["d2"]


def test_triples_to_jsonld_canonical(spark):
    import json

    from dbpedia_spotlight_spark.pipeline.serializers import triples_to_jsonld

    tri = spark.createDataFrame(
        [
            ("http://e/a", "name", 'Al "Quote" \\ B'),
            ("http://e/a", "knows", "http://e/b"),
            ("http://e/a", "name", "Zed"),
            ("_:x", "p", "lit"),
        ],
        "subj string, pred string, obj string",
    )
    rows = {r.subj: r.jsonld for r in triples_to_jsonld(tri).collect()}
    a = json.loads(rows["http://e/a"])  # valid JSON incl. escapes
    assert a["@id"] == "http://e/a"
    assert a["name"] == ['Al "Quote" \\ B', "Zed"]  # sorted values
    assert a["knows"] == [{"@id": "http://e/b"}]    # node reference
    x = json.loads(rows["_:x"])
    assert x == {"@id": "_:x", "p": ["lit"]}
    # keys after @id are sorted
    assert list(a.keys()) == ["@id", "knows", "name"]
