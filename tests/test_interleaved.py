"""Interleaved-document span-structure operators (datapipe/interleaved.py).

Vectors are hand-computed over tiny corpora; pack_interleaved is
additionally checked against a pure-Python greedy replay of the
concat-and-chunk semantics (media atomic at its start chunk, text splits
exact), and span_diff covers all four statuses on one fixture.
"""

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.datapipe.interleaved import (
    flat_to_interleaved_multi,
    interleaved_stats,
    media_context,
    pack_interleaved,
    span_diff,
)


@pytest.fixture(scope="module")
def iv(spark):
    flat = spark.createDataFrame(
        [
            (0, "a b c d e f"),       # 5 spans: image then audio
            (1, "x y"),               # 3 spans: single image media (1%3=1->audio)
            (2, "solo"),              # 1 text span
            (4, "p q r s t u v w"),   # 5 spans: audio then video
        ],
        "doc_id long, text string",
    )
    return flat_to_interleaved_multi(flat)


def test_synth_span_layout(iv):
    rows = {r["doc_id"]: r["spans"] for r in iv.collect()}
    kinds0 = [s["kind"] for s in rows["0"]]
    assert kinds0 == ["text", "image", "text", "audio", "text"]
    assert [s["text"] for s in rows["0"] if s["kind"] == "text"] == [
        "a b", "c d", "e f"
    ]
    assert rows["0"][1]["media_ref"] == "image://0/0"
    assert rows["0"][3]["media_ref"] == "audio://0/1"
    # offsets: media carries the offset of the following text span
    assert [s["offset"] for s in rows["0"]] == [0, 4, 4, 8, 8]
    assert [s["kind"] for s in rows["1"]] == ["text", "audio", "text"]
    assert [s["kind"] for s in rows["2"]] == ["text"]
    # reassembling text spans reproduces the flat text
    joined = " ".join(s["text"] for s in rows["4"] if s["kind"] == "text")
    assert joined == "p q r s t u v w"


def test_interleaved_stats_vector(iv):
    got = {r["doc_id"]: r for r in interleaved_stats(iv).collect()}
    r0 = got["0"]
    assert (r0["n_spans"], r0["n_text"], r0["n_image"], r0["n_audio"],
            r0["n_video"]) == (5, 3, 1, 1, 0)
    assert r0["text_chars"] == 9 and r0["text_tokens"] == 6
    assert r0["first_media_idx"] == 1
    assert r0["media_ratio"] == pytest.approx(0.4)
    r2 = got["2"]
    assert r2["n_spans"] == 1 and r2["first_media_idx"] is None
    assert r2["media_ratio"] == 0.0


def test_interleaved_stats_zero_shuffle(iv):
    plan = interleaved_stats(iv)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map pass, no shuffle


def test_media_context_nearest_text(iv):
    got = {
        (r["doc_id"], r["span_idx"]): r
        for r in media_context(iv, n_words=2).collect()
    }
    assert got[("0", 1)]["before_text"] == "a b"
    assert got[("0", 1)]["after_text"] == "c d"
    assert got[("4", 3)]["before_text"] == "t u"  # last 2 of "s t u"
    assert got[("4", 3)]["after_text"] == "v w"
    assert ("2", 0) not in got  # text-only doc emits nothing


def test_media_context_leading_trailing_media(spark):
    # Hand-built doc: media first, consecutive media, media last.
    doc = spark.createDataFrame(
        [(
            "d",
            [
                ("image", None, "image://d/0", 0),
                ("text", "alpha beta", None, 0),
                ("audio", None, "audio://d/1", 11),
                ("video", None, "video://d/2", 11),
                ("text", "gamma", None, 11),
                ("image", None, "image://d/3", 17),
            ],
        )],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {r["span_idx"]: r for r in media_context(doc, n_words=8).collect()}
    assert got[0]["before_text"] is None          # leading media: no text before
    assert got[0]["after_text"] == "alpha beta"
    assert got[2]["before_text"] == "alpha beta"  # consecutive media share
    assert got[2]["after_text"] == "gamma"
    assert got[3]["before_text"] == "alpha beta"
    assert got[3]["after_text"] == "gamma"
    assert got[5]["before_text"] == "gamma"
    assert got[5]["after_text"] is None           # trailing media: no text after


def _py_pack(doc_spans, budget, costs):
    """Pure-Python replay: global stream in doc order, media atomic at
    its start chunk, text splits exact."""
    out, g = [], 0
    for doc_id, spans in doc_spans:
        for idx, (kind, n_tok, ref) in enumerate(spans):
            if n_tok == 0:
                continue
            if kind != "text":
                out.append((g // budget, doc_id, idx, kind, ref, 0, n_tok))
            else:
                pos = 0
                while pos < n_tok:
                    chunk = (g + pos) // budget
                    take = min((chunk + 1) * budget - (g + pos), n_tok - pos)
                    out.append((chunk, doc_id, idx, kind, ref, pos, take))
                    pos += take
            g += n_tok
    return sorted(out)


def test_pack_interleaved_matches_python_replay(iv):
    budget = 600
    costs = {"image": 576, "audio": 1500, "video": 7200}
    rows = sorted(iv.collect(), key=lambda r: r["doc_id"])
    doc_spans = [
        (
            r["doc_id"],
            [
                (
                    s["kind"],
                    len(s["text"].split()) if s["kind"] == "text" else costs[s["kind"]],
                    s["media_ref"],
                )
                for s in r["spans"]
            ],
        )
        for r in rows
    ]
    expected = _py_pack(doc_spans, budget, costs)
    got = sorted(
        (
            r["chunk_id"], r["doc_id"], r["span_idx"], r["kind"],
            r["media_ref"], r["tok_start"], r["n_tok_slice"],
        )
        for r in pack_interleaved(iv, budget=budget).collect()
    )
    assert got == expected


def test_pack_interleaved_text_splits_and_media_atomic(spark):
    # One doc: 10 text tokens, then an image (cost 7), then 5 more tokens,
    # budget 8 -> text splits at 8; image starts at 10 (chunk 1) and stays
    # whole even though 10+7 crosses into chunk 2; final text starts at 17.
    doc = flat_to_interleaved_multi(
        spark.createDataFrame([(3, " ".join("w%d" % i for i in range(15)))],
                              "doc_id long, text string")
    )
    got = sorted(
        (r["chunk_id"], r["span_idx"], r["kind"], r["tok_start"], r["n_tok_slice"])
        for r in pack_interleaved(
            doc, budget=8, media_token_costs={"image": 7, "audio": 7, "video": 7}
        ).collect()
    )
    # spans: text(5) media(7) text(5) media(7) text(5); stream offsets
    # 0,5,12,17,24 -> chunks: t0 whole in c0; m1 at 5 (c0, atomic across 8);
    # t2 [12,17) splits at 16; m3 at 17 (c2); t4 [24,29) splits at... 24//8=3.
    # doc_id 3: kind_a = _KINDS[3 % 3] = image, kind_b = _KINDS[4 % 3] = audio
    assert got == [
        (0, 0, "text", 0, 5),
        (0, 1, "image", 0, 7),
        (1, 2, "text", 0, 4),
        (2, 2, "text", 4, 1),
        (2, 3, "audio", 0, 7),
        (3, 4, "text", 0, 5),
    ]


def test_span_diff_all_statuses(spark, iv):
    pert = (
        iv.filter(F.col("doc_id") != "2")  # 2 -> missing_doc
        .withColumn(
            "spans",
            F.when(
                F.col("doc_id") == "0",
                F.slice("spans", 1, F.size("spans") - 1),  # 0 -> length
            )
            .when(
                F.col("doc_id") == "1",
                F.transform(  # 1 -> span (text changed at idx 0)
                    "spans",
                    lambda s: F.struct(
                        s["kind"].alias("kind"),
                        F.concat(F.lit("X "), s["text"]).alias("text"),
                        s["media_ref"].alias("media_ref"),
                        s["offset"].alias("offset"),
                    ),
                ),
            )
            .otherwise(F.col("spans")),
        )
    )
    extra = flat_to_interleaved_multi(
        spark.createDataFrame([(9, "zz")], "doc_id long, text string")
    )
    got = {
        r["doc_id"]: r
        for r in span_diff(iv, pert.unionByName(extra)).collect()
    }
    assert got["0"]["status"] == "length"
    assert (got["0"]["n_expected"], got["0"]["n_actual"]) == (5, 4)
    assert got["0"]["first_diff_idx"] is None
    assert got["1"]["status"] == "span" and got["1"]["first_diff_idx"] == 0
    assert got["2"]["status"] == "missing_doc"
    assert got["9"]["status"] == "extra_doc"
    assert "4" not in got  # untouched doc emits nothing


def test_span_diff_empty_on_equal(iv):
    assert span_diff(iv, iv).count() == 0


def test_span_diff_order_sensitivity(spark):
    # Same spans, swapped order -> 'span' at the first swapped index
    # (order IS part of the invariant).
    a = spark.createDataFrame(
        [("d", [("text", "one", None, 0), ("text", "two", None, 4)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    b = spark.createDataFrame(
        [("d", [("text", "two", None, 0), ("text", "one", None, 4)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    rows = span_diff(a, b).collect()
    assert len(rows) == 1
    assert rows[0]["status"] == "span" and rows[0]["first_diff_idx"] == 0


def test_mask_spans_merges_clips_and_passthrough(spark):
    from dbpedia_spotlight_spark.datapipe.interleaved import mask_spans

    docs = spark.createDataFrame(
        [(1, "hello brave new world"), (2, "untouched")],
        "doc_id int, text string",
    )
    spans = spark.createDataFrame(
        [
            (1, 6, 11),     # overlaps the next -> merged [6,14)
            (1, 9, 14),
            (1, 16, 21),    # trailing span, clipped exactly at len
            (1, 30, 40),    # fully out of range -> dropped
            (1, -3, 2),     # clipped to [0,2)
        ],
        "doc_id int, begin int, end int",
    )
    got = {r.doc_id: (r.masked_text, r.n_masked) for r in mask_spans(docs, spans).collect()}
    assert got[1] == ("[MASK]llo [MASK]w [MASK]", 3)
    assert got[2] == ("untouched", 0)


def test_span_align_relations(spark):
    from dbpedia_spotlight_spark.datapipe.interleaved import span_align

    l = spark.createDataFrame(
        [(1, 0, 5, "PER"), (1, 10, 20, "ORG"), (2, 0, 4, "X")],
        "doc_id int, begin int, end int, label string",
    )
    r = spark.createDataFrame(
        [(1, 0, 5, "per"), (1, 12, 18, "org"), (1, 15, 25, "ov"), (3, 0, 4, "y")],
        "doc_id int, begin int, end int, label string",
    )
    got = {
        (x.l_label, x.r_label): (x.relation, x.jaccard)
        for x in span_align(l, r).collect()
    }
    assert got[("PER", "per")] == ("exact", 1.0)
    assert got[("ORG", "org")] == ("right_within", 0.6)
    assert got[("ORG", "ov")] == ("overlap", round(5 / 15, 6))
    assert len(got) == 3  # cross-doc pairs never form
