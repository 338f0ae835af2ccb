"""inject_entity_spans (datapipe/interleaved.py): merge annotations into
the interleaved span order, preserving the original span subsequence."""

from dbpedia_spotlight_spark.datapipe.interleaved import inject_entity_spans
from dbpedia_spotlight_spark.operators.tokenizer import (
    flat_to_interleaved_media,
)


def test_inject_entity_spans_order_and_invariant(spark):
    docs = spark.createDataFrame(
        [("1", "alpha beta gamma delta")], "doc_id string, text string"
    )
    iv = flat_to_interleaved_media(docs)
    # entities at token offsets: beta (6), delta (17)
    ann = spark.createDataFrame(
        [("1", 6, "beta", "uri:B"), ("1", 17, "delta", "uri:D")],
        "doc_id string, offset int, surface_form string, uri string",
    )
    rows = sorted(
        inject_entity_spans(iv, ann).collect(), key=lambda r: r.span_idx
    )
    kinds = [r.kind for r in rows]
    assert kinds == ["text", "entity", "media", "text", "entity"]
    # original (kind, text, media_ref, order) subsequence is untouched
    orig = [(r.kind, r.text, r.media_ref) for r in rows if r.kind != "entity"]
    assert orig == [
        ("text", "alpha beta", None),
        ("media", None, "img://1"),
        ("text", "gamma delta", None),
    ]
    ent = [r for r in rows if r.kind == "entity"]
    assert [(e.text, e.media_ref, e.offset) for e in ent] == [
        ("beta", "uri:B", 6),
        ("delta", "uri:D", 17),
    ]


def test_inject_entity_spans_same_offset_ties_by_uri(spark):
    docs = spark.createDataFrame([("1", "x")], "doc_id string, text string")
    iv = flat_to_interleaved_media(docs)
    ann = spark.createDataFrame(
        [("1", 0, "x", "uri:b"), ("1", 0, "x", "uri:a")],
        "doc_id string, offset int, surface_form string, uri string",
    )
    rows = sorted(
        inject_entity_spans(iv, ann).collect(), key=lambda r: r.span_idx
    )
    # original text first (is_ent=0), then entities by uri
    assert [r.media_ref for r in rows] == [None, "uri:a", "uri:b"]
