"""Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash),
similarity search, text stats, multimodal plumbing, interleave adapter."""

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.datapipe.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from dbpedia_spotlight_spark.datapipe.multimodal import (
    extract_media_features,
    fake_decode,
    frame_sample_plan,
    media_spans,
)
from dbpedia_spotlight_spark.datapipe.similarity import (
    brute_force_topk,
    lsh_topk,
)
from dbpedia_spotlight_spark.datapipe.textstats import text_stats
from dbpedia_spotlight_spark.operators.tokenizer import (
    flat_to_interleaved_media,
    tokenize_documents,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup
        (4, "completely different text about spark dataframes and shuffles ok"),
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_dups"] == 2 and g["keep_id"] == 1 and g["doc_ids"] == [1, 2]


def test_minhash_finds_near_dups(docs):
    pairs = minhash_near_duplicates(
        docs, num_hashes=64, bands=32, shingle_k=3, threshold=0.5
    ).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (1, 2) in found  # exact dup always survives
    assert (1, 3) in found or (2, 3) in found  # near dup caught
    assert all({a, b} != {4, 5} for a, b in found)


def test_ngram_jaccard_exact_pair(docs, spark):
    pairs = spark.createDataFrame([(1, 2), (1, 4)], "a long, b long")
    out = {(r["a"], r["b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, pairs, shingle_k=3, threshold=0.0).collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 4)] == 0.0


def test_simhash_identical_docs_share_all_chunks(docs):
    rows = simhash_buckets(docs).collect()
    by_doc = {}
    hexes = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk"]] = r["chunk_val"]
        hexes[r["doc_id"]] = r["simhash_hex"]
    assert by_doc[1] == by_doc[2]  # identical text -> identical simhash
    assert len(by_doc[1]) == 4
    # hex assembles the chunks high-to-low
    assert hexes[1] == "".join(f"{by_doc[1][c]:04x}" for c in (3, 2, 1, 0))
    # pigeonhole guarantee: hamming < 4 implies >= 1 shared 16-bit chunk
    ham = bin(int(hexes[1], 16) ^ int(hexes[3], 16)).count("1")
    shared = sum(by_doc[1][c] == by_doc[3][c] for c in range(4))
    if ham < 4:
        assert shared >= 1
    else:  # chunks can only agree where all 16 bits agree
        assert all(
            by_doc[1][c] != by_doc[3][c]
            or (int(hexes[1], 16) >> (16 * c)) & 0xFFFF
            == (int(hexes[3], 16) >> (16 * c)) & 0xFFFF
            for c in range(4)
        )


def test_brute_force_topk_agrees_with_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(20, 8)).astype("float64")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") == 0)
    got = brute_force_topk(df, q, k=3).collect()
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    sims[0] = -2  # exclude self
    expect = list(np.argsort(-sims)[:3])
    assert [r["cand_id"] for r in sorted(got, key=lambda r: r["rank"])] == expect


def test_lsh_topk_subset_of_exact(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(50, 8)).astype("float64")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 2)
    approx = lsh_topk(df, q, dim=8, k=5, num_planes=4, num_tables=4).collect()
    assert len(approx) > 0
    # every returned pair's cosine must equal the exact cosine (re-rank exact)
    exact = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in brute_force_topk(df, q, k=49).collect()
    }
    for r in approx:
        assert abs(exact[(r["query_id"], r["cand_id"])] - r["cosine"]) < 1e-9


def test_text_stats_columns(docs):
    row = text_stats(docs).filter(F.col("doc_id") == 1).collect()[0]
    assert row["n_tokens"] == 13
    assert row["fingerprint"] is not None
    assert 0.0 <= row["quality"] <= 1.0
    assert row["lang_pred"] == "en"


def test_interleave_media_roundtrip(docs):
    iv = flat_to_interleaved_media(docs)
    rows = {r["doc_id"]: r["spans"] for r in iv.collect()}
    spans = rows["1"]
    assert [s["kind"] for s in spans] == ["text", "media", "text"]
    assert spans[1]["media_ref"] == "img://1"
    joined = " ".join(s["text"] for s in spans if s["kind"] == "text")
    assert joined == docs.filter("doc_id=1").collect()[0]["text"]
    # single-token doc stays one span
    assert [s["kind"] for s in rows["5"]] == ["text"]
    # offsets are text-stream correct: second text span starts after first+space
    assert spans[2]["offset"] == len(spans[0]["text"]) + 1
    # tokenizer consumes the interleaved schema and respects offsets
    toks = tokenize_documents(iv).filter("doc_id='1'").orderBy("offset").collect()
    assert toks[0]["offset"] == 0
    full = docs.filter("doc_id=1").collect()[0]["text"]
    for t in toks:
        assert full[t["offset"]:t["offset"] + len(t["token"])] == t["token"]


def test_media_features_and_frame_plan(spark):
    media = spark.createDataFrame(
        [("img://1", "image", bytearray(b"\x01" * 100)),
         ("vid://2", "video", bytearray(b"\xff" * 100))],
        "media_ref string, kind string, payload binary",
    )
    feats = extract_media_features(media, decode_fn=fake_decode)
    rows = {r["media_ref"]: r for r in feats.collect()}
    assert rows["img://1"]["n_frames"] == 1
    assert rows["vid://2"]["n_frames"] > 1
    assert len(rows["img://1"]["feature"]) == 8
    plan = frame_sample_plan(feats, every_n=10, max_frames=4).collect()
    for r in plan:
        assert len(r["sample_frames"]) <= 4

    # default decode is an explicit stub
    from dbpedia_spotlight_spark.datapipe.multimodal import default_decode

    with pytest.raises(NotImplementedError):
        default_decode("image", b"")


def test_media_spans_extraction(docs):
    iv = flat_to_interleaved_media(docs)
    ms = media_spans(iv)
    got = {r["doc_id"]: r for r in ms.collect()}
    assert got["1"]["media_ref"] == "img://1" and got["1"]["span_pos"] == 1
    assert "5" not in got  # single-span doc has no media


def test_bucketed_storage_roundtrip(spark, docs, tmp_path):
    from dbpedia_spotlight_spark.io.storage import (
        iceberg_available,
        read_bucketed,
        write_bucketed,
    )

    assert iceberg_available(spark) is False  # sandbox has no iceberg jar
    path = str(tmp_path / "tbl")
    write_bucketed(docs, path, bucket_col="doc_id", num_buckets=4)
    back = read_bucketed(spark, path)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    import os
    parts = [d for d in os.listdir(path) if d.startswith("_bucket=")]
    assert 1 <= len(parts) <= 4


def test_duplicate_spans_and_removal(spark):
    from dbpedia_spotlight_spark.datapipe.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    boiler = "all rights reserved contact the site admin"  # 7 tokens
    rows = [
        (1, f"alpha beta gamma delta {boiler} epsilon zeta"),
        (2, f"one two three four five six {boiler}"),
        (3, "totally unrelated words without any shared runs here at all"),
        # within-doc repeat: the same 5-token run twice in one doc
        (4, "x p q r s t y y p q r s t z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, shingle_k=5, min_count=2)
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in spans.collect()
    }
    # doc1: boiler at tokens 4..10; doc2: at 6..12 — exactly the 7-token run
    assert got[1] == (4, 10, 7)
    assert got[2] == (6, 12, 7)
    assert 3 not in got
    # doc4: "p q r s t" at 1..5 and 8..12 merge through the island window
    # only if within k of each other — gap is 8-1=7 > 5, so TWO spans
    doc4 = sorted(
        (r["span_start"], r["span_end"])
        for r in spans.filter(F.col("doc_id") == 4).collect()
    )
    assert doc4 == [(1, 5), (8, 12)]

    cleaned = {
        r["doc_id"]: (r["clean_text"], r["removed_tokens"])
        for r in remove_duplicate_spans(df, spans).collect()
    }
    assert cleaned[1] == ("alpha beta gamma delta epsilon zeta", 7)
    assert cleaned[2] == ("one two three four five six", 7)
    assert cleaned[3][1] == 0 and "unrelated" in cleaned[3][0]
    assert cleaned[4] == ("x y y z", 10)


def test_duplicate_spans_island_merge(spark):
    """Overlapping and contiguous duplicated windows merge into one maximal
    span: two docs share a 12-token run — every interior 5-gram is
    duplicated and the merged span covers the full run."""
    from dbpedia_spotlight_spark.datapipe.dedup import duplicate_spans

    run = "a b c d e f g h i j k l"  # 12 shared tokens
    df = spark.createDataFrame(
        [(1, f"u1 {run} v1"), (2, f"u2 w2 {run}")],
        "doc_id long, text string",
    )
    spans = duplicate_spans(df, shingle_k=5, min_count=2)
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in spans.collect()
    }
    assert got[1] == (1, 12, 12)
    assert got[2] == (2, 13, 12)


def test_duplicate_spans_plan_shape(spark):
    """Scale contract of duplicate_spans: the duplicate-hash aggregation
    must partial-aggregate map-side (shuffle carries (h, partial count),
    not raw gram rows), the filtered hash set must come back as a semi
    join keyed on h (no broadcast assumption, no cartesian product), and
    the island merge must be a window — one pass, no self-join on docs."""
    from dbpedia_spotlight_spark.datapipe.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(i, "w x y z " * 5) for i in range(10)], "doc_id long, text string"
    )
    plan = (
        duplicate_spans(df, shingle_k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("partial_count") >= 1  # map-side combine on h
    assert "LeftSemi" in plan
    assert "Window" in plan


def test_connected_components_chain(spark):
    from dbpedia_spotlight_spark.datapipe.dedup import connected_components

    # chain 1-2-3-4 plus isolated pair 8-9
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (8, 9)], "a long, b long"
    )
    comp = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[8] == comp[9] == 8


def test_dedup_clusters_end_to_end(spark, docs):
    from dbpedia_spotlight_spark.datapipe.dedup import dedup_clusters

    out = dedup_clusters(docs, num_hashes=64, bands=32, shingle_k=3, threshold=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # docs 1,2,3 form one near-dup cluster; only min id kept
    assert rows[1]["component"] == rows[2]["component"] == 1
    assert rows[1]["keep"] is True and rows[2]["keep"] is False
    # singletons keep themselves
    assert rows[4]["keep"] is True and rows[5]["keep"] is True


def test_language_id_scripts_and_markers(spark):
    from dbpedia_spotlight_spark.datapipe.textstats import language_id

    rows = [
        (1, "the cat and the dog have this thing"),
        (2, "der hund und die katze ist nicht da"),
        (3, "これは日本語のテキストです"),
        (4, "这是一段中文文本没有假名"),
        (5, "это русский текст для теста"),
        (6, "한국어 텍스트 입니다 감사합니다"),
        (7, "xyzzy qwerty plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["p"]
        for r in df.select("doc_id", language_id(F.col("text")).alias("p")).collect()
    }
    assert got[1] == "en" and got[2] == "de"
    assert got[3] == "ja" and got[4] == "zh"
    assert got[5] == "ru" and got[6] == "ko"
    assert got[7] == "und"


def test_real_pnm_and_wav_decoders(spark):
    """default_decode handles raw self-describing formats natively; only
    compressed codecs remain stubbed."""
    import struct

    import numpy as np

    from dbpedia_spotlight_spark.datapipe.multimodal import (
        default_decode,
        extract_media_features,
    )

    # 4x2 P6 PPM, all pixels (200, 100, 0) -> mean intensity 100/255
    ppm = b"P6\n# comment\n4 2\n255\n" + bytes([200, 100, 0] * 8)
    w, h, nf, feat = default_decode("image", ppm)
    assert (w, h, nf) == (4, 2, 1)
    assert abs(feat[0] - 100.0 / 255.0) < 1e-6

    # mono 16-bit WAV, 8 samples of a constant half-amplitude
    data = struct.pack("<8h", *([16384] * 8))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, ch, n, feat = default_decode("audio", wav)
    assert (rate, ch, n) == (8000, 1, 8)
    assert abs(feat[0] - 0.5) < 1e-3

    # end to end through the Spark operator with the REAL default decoder
    media = spark.createDataFrame(
        [("img://p", "image", bytearray(ppm)), ("aud://w", "audio", bytearray(wav))],
        "media_ref string, kind string, payload binary",
    )
    rows = {r["media_ref"]: r for r in extract_media_features(media).collect()}
    assert rows["img://p"]["width"] == 4 and rows["img://p"]["height"] == 2
    assert rows["aud://w"]["n_frames"] == 8


def test_lsh_bucket_cap_keeps_pairs_linear(spark):
    """VERDICT r2 item 4: 500 identical docs collapse to one signature in
    every band — uncapped, the bucket self-join emits O(n²) pairs; with the
    cap the whole mega-bucket is dropped and the pair count stays linear
    (here: zero from the capped bucket, plus the small distinct-doc
    pairs)."""
    from dbpedia_spotlight_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(i, "boiler plate empty page text") for i in range(500)]
    rows += [(1000 + i, f"unique document number {i} talks about topic {i}")
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, num_hashes=16, shingle_k=3)

    uncapped = lsh_candidate_pairs(sigs, bands=4, max_bucket_size=None)
    assert uncapped.count() >= 500 * 499 // 2  # the quadratic trap

    capped = lsh_candidate_pairs(sigs, bands=4, max_bucket_size=100)
    n = capped.count()
    assert n < 500  # linear, not quadratic
    # no capped pair touches the boilerplate cluster
    touching = capped.filter((F.col("a") < 500) | (F.col("b") < 500)).count()
    assert touching == 0


def test_simhash_candidate_pairs_hamming_and_cap(spark):
    from dbpedia_spotlight_spark.datapipe.dedup import (
        simhash_buckets,
        simhash_candidate_pairs,
    )

    rows = [(i, "all the same words here") for i in range(50)]
    rows.append((100, "entirely unrelated content with different vocabulary"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    buckets = simhash_buckets(docs)

    pairs = simhash_candidate_pairs(buckets, max_bucket_size=None)
    identical = pairs.filter((F.col("a") < 100) & (F.col("b") < 100))
    # identical docs share all 4 chunks -> distinct pairs, hamming 0
    assert identical.count() == 50 * 49 // 2
    assert identical.filter(F.col("hamming") != 0).count() == 0

    capped = simhash_candidate_pairs(buckets, max_bucket_size=10)
    assert capped.filter((F.col("a") < 100) & (F.col("b") < 100)).count() == 0


def test_ivf_topk_trained_quantizer(spark):
    """IVF with a real pyspark.ml KMeans coarse quantizer: assignment is
    total (every vector lands in exactly one cell), every returned pair's
    cosine equals the exact cosine (re-rank is exact), and raising nprobe
    to num_cells recovers the exact brute-force top-k."""
    import numpy as np

    from dbpedia_spotlight_spark.datapipe.similarity import (
        assign_ivf_cells,
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(0)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(df, num_cells=4, dim=8, seed=11)
    assert cents.shape == (4, 8)

    ids = df.select(F.col("vec_id").alias("cand_id"),
                    F.col("embedding").alias("c_vec"))
    cells = assign_ivf_cells(ids, cents, "c_vec", nprobe=1)
    assert cells.count() == 60  # total assignment, one cell each
    assert cells.select("cand_id").distinct().count() == 60

    q = df.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["cand_id"]): r["cosine"]
        for r in brute_force_topk(df, q, k=59).collect()
    }
    approx = ivf_topk(df, q, cents, k=5, nprobe=2).collect()
    assert len(approx) > 0
    for r in approx:
        assert abs(exact[(r["query_id"], r["cand_id"])] - r["cosine"]) < 1e-9

    # probing every cell == exact search
    full = ivf_topk(df, q, cents, k=5, nprobe=4).collect()
    want = {
        (r["query_id"], r["cand_id"])
        for r in brute_force_topk(df, q, k=5).collect()
    }
    assert {(r["query_id"], r["cand_id"]) for r in full} == want


def test_fingerprint_plan_is_codegen(spark, docs):
    """The fingerprint must stay out of the expression interpreter and out
    of Python: no array-HOF lambda, no Python eval node; the fold is a
    HashAggregate over a Generate (posexplode)."""
    from dbpedia_spotlight_spark.datapipe.textstats import fingerprint_agg

    plan = fingerprint_agg(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "lambdafunction" not in plan  # no interpreted HOF
    assert "HashAggregate" in plan and "Generate" in plan


def test_lsh_topk_dedupes_ids_before_vectors(spark):
    """VERDICT r2 item 5: the candidate dedupe shuffle must carry bare ids,
    not embeddings — the dropDuplicates aggregate groups exactly on
    (query_id, cand_id) with no vector column in its keys or output."""
    import re

    import numpy as np

    rng = np.random.RandomState(3)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(rng.normal(size=(30, 8)))],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 2)
    plan = (
        lsh_topk(df, q, dim=8, k=5, num_planes=4, num_tables=2)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    dedupes = [
        m for m in re.findall(r"Aggregate \[([^\]]*)\], \[([^\]]*)\]", plan)
        if "query_id" in m[0] and "cand_id" in m[0]
    ]
    assert dedupes, "expected a dedupe Aggregate on (query_id, cand_id)"
    for keys, out in dedupes:
        assert "vec" not in keys and "vec" not in out


def test_resize_images_roundtrip_and_passthrough(spark):
    """resize_images: real nearest-neighbor resize for the native PNM path,
    byte-identical re-encode format; undecodable payloads pass through with
    width/height -1 instead of failing the batch."""
    import numpy as np

    from dbpedia_spotlight_spark.datapipe.multimodal import (
        decode_pnm_pixels,
        encode_pnm,
        resize_images,
        resize_nn,
    )

    # 4x4 checkerboard PPM; NN-downsample to 2x2 picks exact source pixels
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    arr[::2, ::2] = [255, 0, 0]
    arr[1::2, 1::2] = [0, 255, 0]
    ppm = encode_pnm(arr)
    expected = resize_nn(arr, 2, 2)
    media = spark.createDataFrame(
        [("img://a", bytearray(ppm)), ("bad://b", bytearray(b"\x89PNG junk"))],
        "media_ref string, payload binary",
    )
    rows = {r["media_ref"]: r for r in resize_images(media, 2, 2).collect()}
    good = rows["img://a"]
    assert (good["width"], good["height"]) == (2, 2)
    out_arr, maxval = decode_pnm_pixels(bytes(good["payload"]))
    assert maxval == 255
    assert np.array_equal(out_arr, expected)
    bad = rows["bad://b"]
    assert (bad["width"], bad["height"]) == (-1, -1)
    assert bytes(bad["payload"]) == b"\x89PNG junk"


def test_prefix_filter_jaccard_lossless_and_capped(spark):
    """Prefix filtering must equal brute-force all-pairs Jaccard (it is a
    lossless candidate filter); max_bucket drops oversized prefix keys."""
    import pyspark.sql.functions as F

    from dbpedia_spotlight_spark.datapipe.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_join,
    )

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "completely different text about spark shuffles and joins",
        "completely different text about spark shuffles and sorts",
        "short one",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base)], "doc_id long, text string"
    )
    got = sorted(
        (r["a"], r["b"], round(r["jaccard"], 4))
        for r in prefix_filter_jaccard_join(
            docs, shingle_k=3, threshold=0.4
        ).collect()
    )
    ids = docs.select("doc_id")
    allp = (
        ids.alias("x")
        .join(ids.alias("y"), F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    want = sorted(
        (r["a"], r["b"], round(r["jaccard"], 4))
        for r in ngram_jaccard_pairs(
            docs, allp, shingle_k=3, threshold=0.4
        ).collect()
    )
    assert got == want and got, got

    # 50 identical docs: every prefix key holds all 50 -> cap drops them all
    clones = spark.createDataFrame(
        [(i, "same same same same text body here") for i in range(50)],
        "doc_id long, text string",
    )
    capped = prefix_filter_jaccard_join(
        clones, shingle_k=3, threshold=0.8, max_bucket=10
    )
    assert capped.count() == 0


def test_y4m_decode_and_frame_sampling(spark):
    """Native YUV4MPEG2 path: default_decode reports real frame counts and
    luma features; sample_frames extracts every_n-th frame as a standalone
    PGM that the image operators can consume directly."""
    import numpy as np

    from dbpedia_spotlight_spark.datapipe.multimodal import (
        decode_pnm_pixels,
        default_decode,
        encode_y4m,
        sample_frames,
    )

    frames = [np.full((4, 6), 10 * i, dtype=np.uint8) for i in range(12)]
    y4m = encode_y4m(frames)
    w, h, nf, feat = default_decode("video", y4m)
    assert (w, h, nf) == (6, 4, 12)
    assert abs(feat[0] - np.mean([0, 10]) / 255.0) < 1e-6

    media = spark.createDataFrame(
        [("vid://a", bytearray(y4m)), ("bad://b", bytearray(b"nope"))],
        "media_ref string, payload binary",
    )
    rows = sample_frames(media, every_n=5, max_frames=2).collect()
    got = sorted((r["media_ref"], r["frame_idx"]) for r in rows)
    assert got == [("vid://a", 0), ("vid://a", 5)]
    fr = next(r for r in rows if r["frame_idx"] == 5)
    arr, maxval = decode_pnm_pixels(bytes(fr["payload"]))
    assert arr.shape == (4, 6, 1) and int(arr[0, 0, 0]) == 50


def test_pii_scrub_order_and_counts(spark):
    """Replacement order is the contract: an email inside a URL is URL, a
    dotted quad is IP (not phone digits), and masking is idempotent."""
    from dbpedia_spotlight_spark.datapipe.pii import pii_stats, scrub_pii

    rows = [
        (1, "mail me at bob.smith+x@corp.example.com today"),
        (2, "see https://ex.org/u?mail=a@b.io&x=1 now"),
        (3, "server 192.168.1.250 and backup 10.0.0.7"),
        (4, "call +44 20 7946-0958 or +1 555-0142"),
        (5, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_stats(df).collect()}

    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["scrubbed"]
    # the email-shaped string inside the URL was consumed by <URL>
    assert out[2]["n_url"] == 1 and out[2]["n_email"] == 0
    assert out[2]["scrubbed"] == "see <URL> now"
    assert out[3]["n_ipv4"] == 2 and out[3]["n_phone"] == 0
    assert out[4]["n_phone"] == 2
    assert out[5]["scrubbed"] == rows[4][1]

    # idempotent: scrubbing a scrubbed text changes nothing
    twice = df.select(
        (scrub_pii(scrub_pii(F.col("text"))) == scrub_pii(F.col("text"))).alias("ok")
    )
    assert all(r["ok"] for r in twice.collect())


def test_repetition_stats_known_values(spark):
    from dbpedia_spotlight_spark.datapipe.textstats import repetition_stats

    rows = [
        (1, "a a a a"),                     # 4 words, 1 distinct, 3 bigrams all "a a"
        (2, "w x y z"),                     # no repetition at all
        (3, "spam ham spam ham spam"),      # top word 3/5, bigrams alternate
        (4, ""),                            # empty -> zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}

    assert out[1]["n_words"] == 4
    assert out[1]["dup_word_frac"] == pytest.approx(0.75)
    assert out[1]["top_word_frac"] == pytest.approx(1.0)
    assert out[1]["dup_2gram_frac"] == pytest.approx(2 / 3)

    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["top_word_frac"] == pytest.approx(0.25)
    assert out[2]["dup_2gram_frac"] == 0.0

    assert out[3]["top_word_frac"] == pytest.approx(3 / 5)
    # bigrams: sh hs sh hs -> 4 bigrams 2 distinct
    assert out[3]["dup_2gram_frac"] == pytest.approx(0.5)

    assert out[4]["n_words"] == 0
    assert out[4]["dup_word_frac"] == 0.0
    assert out[4]["top_word_frac"] == 0.0
    assert out[4]["dup_2gram_frac"] == 0.0


# --- sequence packing + stratified sampling -------------------------------


def test_sequence_pack_partitions_exactly(spark):
    from dbpedia_spotlight_spark.datapipe.packing import sequence_pack

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(7 + i % 5))) for i in range(40)],
        "doc_id long, text string",
    )
    out = sequence_pack(docs, budget=16).collect()
    total = sum(r.n_tok_slice for r in out)
    n_toks = sum(7 + i % 5 for i in range(40))
    assert total == n_toks  # every token lands in exactly one chunk
    # each chunk holds exactly `budget` tokens except the last
    from collections import defaultdict

    per_chunk = defaultdict(int)
    for r in out:
        per_chunk[r.chunk_id] += r.n_tok_slice
    last = max(per_chunk)
    for cid, n in per_chunk.items():
        assert n == 16 or (cid == last and n <= 16)
    # spans are contiguous within each doc and the sliced text matches
    for r in out:
        words = r.chunk_text.split(" ") if r.chunk_text else []
        assert len(words) == r.n_tok_slice
        assert words[0] == f"w{r.doc_id}_{r.tok_start}"


def test_sequence_pack_doc_longer_than_budget(spark):
    from dbpedia_spotlight_spark.datapipe.packing import sequence_pack

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{j}" for j in range(50)))], "doc_id long, text string"
    )
    out = sorted(sequence_pack(docs, budget=16).collect(), key=lambda r: r.chunk_id)
    assert [r.n_tok_slice for r in out] == [16, 16, 16, 2]
    assert [r.tok_start for r in out] == [0, 16, 32, 48]


def test_stratified_sample_rates_and_determinism(spark):
    from dbpedia_spotlight_spark.datapipe.packing import stratified_sample

    docs = spark.createDataFrame(
        [(i, "x", "a" if i % 2 == 0 else "b") for i in range(2000)],
        "doc_id long, text string, source string",
    )
    kept = stratified_sample(docs, {"a": 1.0, "b": 0.25}, default_rate=0.0)
    rows = kept.collect()
    a = [r for r in rows if r.source == "a"]
    b = [r for r in rows if r.source == "b"]
    assert len(a) == 1000  # rate 1.0 keeps everything
    assert 150 <= len(b) <= 350  # ~25% of 1000, hash-binomial spread
    # deterministic: same rows on a second run
    again = {r.doc_id for r in kept.collect()}
    assert again == {r.doc_id for r in rows}


def test_quality_filter_reasons(spark):
    from dbpedia_spotlight_spark.datapipe.textstats import quality_filter

    docs = spark.createDataFrame(
        [
            # passes every check: all-distinct words incl. a few stopwords
            (1, "the and of " + " ".join(f"w{i}" for i in range(50))),
            # too short + heavily repetitive
            (2, "spam spam spam spam spam"),
            # punctuation-heavy and no stopwords
            (3, "!!! ??? ### $$$ %%%"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_filter(docs, min_words=40).collect()}
    assert rows[1].keep and rows[1].reasons == ""
    assert not rows[2].keep
    assert "too_short" in rows[2].reasons
    assert "dup_words" in rows[2].reasons
    assert "top_word" in rows[2].reasons
    assert not rows[3].keep
    assert "punct_heavy" in rows[3].reasons
    assert "no_stopwords" in rows[3].reasons
    # reasons are ordered and comma-joined (deterministic audit string)
    assert rows[2].reasons == ",".join(sorted(rows[2].reasons.split(",")))


def test_unigram_logprob_math(spark):
    import math

    from dbpedia_spotlight_spark.datapipe.textstats import (
        unigram_doc_logprob,
        unigram_model,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # counts: a=2 b=2 c=1, N=5, V=3 -> p(a)=3/8, p(b)=3/8, p(c)=2/8
    lm = {r.token: r.logp for r in unigram_model(docs).collect()}
    assert abs(lm["a"] - math.log(3 / 8)) < 1e-12
    assert abs(lm["c"] - math.log(2 / 8)) < 1e-12
    out = {
        r.doc_id: r
        for r in unigram_doc_logprob(docs, unigram_model(docs)).collect()
    }
    assert out[1].n_words == 3
    expected = (2 * math.log(3 / 8) + math.log(3 / 8)) / 3
    assert abs(out[1].logprob - expected) < 1e-12


def test_ngram_contamination_hits(spark):
    from dbpedia_spotlight_spark.datapipe.dedup import ngram_contamination

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # contains eval 3-gram
            (2, "totally unrelated words here now"),
            (3, "beta gamma delta repeated beta gamma delta"),  # distinct hit once
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "xx beta gamma delta yy")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_hit for r in ngram_contamination(train, ev, shingle_k=3).collect()}
    assert out == {1: 1, 3: 1}  # doc 2 clean; repeats count once (distinct sets)


def test_chunk_documents_sliding_windows(spark):
    from dbpedia_spotlight_spark.datapipe.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),  # shorter than one window
            (3, " ".join(f"u{i}" for i in range(8))),  # exact cover, no tail
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["tok_start"], r["n_tok_slice"], r["chunk_text"])
        )
    # doc1: starts 0,3,6 then stop (6+4=10 covers the end)
    assert sorted(by_doc[1]) == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]
    # doc2: one short window
    assert by_doc[2] == [(0, 0, 3, "a b c")]
    # doc3 (8 tokens): starts 0,3 then 6 is needed? 3+4=7 < 8 so yes: 0,3,6
    assert sorted(by_doc[3]) == [
        (0, 0, 4, "u0 u1 u2 u3"),
        (1, 3, 4, "u3 u4 u5 u6"),
        (2, 6, 2, "u6 u7"),
    ]
    # every token of every doc is covered by at least one window
    for did, chunks in by_doc.items():
        covered = set()
        for _, s, ln, _t in chunks:
            covered |= set(range(s, s + ln))
        n = {1: 10, 2: 3, 3: 8}[did]
        assert covered == set(range(n))

    # default stride = disjoint chunks
    disjoint = chunk_documents(docs, max_tokens=4).collect()
    d1 = sorted(
        (r["tok_start"], r["n_tok_slice"])
        for r in disjoint
        if r["doc_id"] == 1
    )
    assert d1 == [(0, 4), (4, 4), (8, 2)]


def test_semantic_dedup_trained_quantizer(spark):
    """SemDeDup over a trained k-means quantizer: two tight direction
    clusters + an outlier. Within each cluster every member duplicates the
    lowest-id exemplar (cosine ~1 >= 0.9); the exemplar and the outlier
    survive."""
    import numpy as np

    from dbpedia_spotlight_spark.datapipe.dedup import semantic_dedup
    from dbpedia_spotlight_spark.datapipe.similarity import train_ivf_centroids

    base_a = np.ones(8)
    base_b = np.concatenate([np.ones(4), -np.ones(4)])
    outlier = np.array([8.0, -8, 8, -8, 8, -8, 8, -8])
    rows = []
    for i, eps in enumerate([0.0, 0.01, -0.01]):         # ids 0,1,2: cluster A
        rows.append((i, (base_a + eps).tolist()))
    for i, eps in enumerate([0.0, 0.02], start=10):       # ids 10,11: cluster B
        rows.append((i, (base_b + eps).tolist()))
    rows.append((20, outlier.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = train_ivf_centroids(emb, num_cells=3, dim=8, seed=5)
    out = {r["vec_id"]: r for r in semantic_dedup(emb, cents, 0.9).collect()}
    assert len(out) == 6
    assert out[0]["keep"] and not out[1]["keep"] and not out[2]["keep"]
    assert out[10]["keep"] and not out[11]["keep"]
    assert out[20]["keep"]
    # same-direction vectors land in the same k-means cell
    assert out[0]["cell"] == out[1]["cell"] == out[2]["cell"]
    assert out[10]["cell"] == out[11]["cell"]

    # cap: an over-cap cluster is SPLIT with within-cell LSH sign bits
    # (round-3 fix: no more whole-cell exemption); near-identical vectors
    # share every sign bit, so the unsplittable clump degrades to
    # (min-id, member) star pairs and still dedupes — linearly, not O(c²)
    capped = semantic_dedup(emb, cents, 0.9, max_cluster_size=2)
    kept = {r["vec_id"] for r in capped.collect() if r["keep"]}
    assert kept == {0, 10, 20}


def test_incremental_exact_dedup_reasons(spark):
    from dbpedia_spotlight_spark.datapipe.dedup import (
        exact_hash_index,
        incremental_exact_dedup,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "Alpha   Beta"),  # normalized dup of base 1 -> 'base'
            (11, "delta"),         # fresh -> keep
            (12, "delta"),         # batch dup of 11 -> 'batch'
            (13, "ALPHA beta"),    # in base AND in batch -> base wins
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.keep, r.reason)
        for r in incremental_exact_dedup(new, exact_hash_index(base)).collect()
    }
    assert out == {
        10: (False, "base"),
        11: (True, None),
        12: (False, "batch"),
        13: (False, "base"),
    }


def test_zorder_key_matches_python_reference(spark):
    from dbpedia_spotlight_spark.functions.zorder import zorder_key

    def ref(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(3, 5), (0, 0), (65535, 65535), (12345, 54321), (70000, 2)]
    df = spark.createDataFrame(rows, "x long, y long")
    from pyspark.sql import functions as SF

    got = df.select("x", "y", zorder_key(SF.col("x"), SF.col("y")).alias("z")).collect()
    for r in got:
        assert r.z == ref(r.x & 65535, r.y & 65535), (r.x, r.y)


def test_write_zordered_partition_ranges_disjoint(spark, tmp_path):
    from pyspark.sql import functions as SF

    from dbpedia_spotlight_spark.functions.zorder import (
        write_zordered,
        zorder_key,
    )

    df = spark.range(2000).select(
        SF.col("id").alias("rid"),
        (SF.col("id") * 37 % 1000).alias("x"),
        (SF.col("id") * 91 % 1000).alias("y"),
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, "x", "y", n_files=8)
    out = (
        spark.read.parquet(path)
        .withColumn("f", SF.input_file_name())
        .withColumn("z", zorder_key(SF.col("x"), SF.col("y")))
    )
    assert out.count() == 2000
    ranges = sorted(
        (r.lo, r.hi)
        for r in out.groupBy("f")
        .agg(SF.min("z").alias("lo"), SF.max("z").alias("hi"))
        .collect()
    )
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert lo2 > hi1  # files tile the z-curve: zone maps prune cleanly


def test_png_gif_decoders_real(spark):
    """Compressed PNG/GIF decode with zero external libs: zlib inflate +
    per-scanline unfiltering (all five PNG filter types cross-checked
    against an independent spec-forward filterer), GIF-LZW. Only
    JPEG/MP3/H.264 remain stubbed."""
    import struct
    import zlib

    import numpy as np

    from dbpedia_spotlight_spark.datapipe import codecs as C
    from dbpedia_spotlight_spark.datapipe.multimodal import (
        default_decode,
        extract_media_features,
    )

    rng = np.random.default_rng(7)

    # round-trip every supported channel count (gray, gray+A, RGB, RGBA)
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        assert (C.decode_png_pixels(C.encode_png(arr)) == arr).all()

    # unfiltering vs an independent forward implementation of RFC 2083 §6
    def forward_filter(img, ftypes, bpp):
        h, w_b = img.shape
        out = bytearray()
        for y in range(h):
            f = ftypes[y % len(ftypes)]
            for x in range(w_b):
                a = int(img[y, x - bpp]) if x >= bpp else 0
                b = int(img[y - 1, x]) if y > 0 else 0
                cc = int(img[y - 1, x - bpp]) if (x >= bpp and y > 0) else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                if x == 0:
                    out.append(f)
                out.append((int(img[y, x]) - pred) & 0xFF)
        return bytes(out)

    w, h, bpp = 7, 10, 3
    img = rng.integers(0, 256, size=(h, w * bpp), dtype=np.uint8)
    for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        raw = forward_filter(img, ftypes, bpp)
        assert (C._unfilter_scanlines(raw, w, h, bpp) == img).all(), ftypes

    # palette PNG expands through PLTE
    idx = rng.integers(0, 5, size=(6, 8), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    png_p = (
        C.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 6, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(
            b"IDAT",
            zlib.compress(b"".join(b"\x00" + idx[y].tobytes() for y in range(6))),
        )
        + chunk(b"IEND", b"")
    )
    assert (C.decode_png_pixels(png_p) == pal[idx]).all()

    # GIF LZW round-trip + frame count
    gidx = rng.integers(0, 7, size=(11, 5), dtype=np.uint8)
    gpal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    gif = C.encode_gif(gidx, gpal)
    arr, nf = C.decode_gif_pixels(gif)
    assert nf == 1 and (arr == gpal[gidx]).all()

    # end to end through the Spark operator with the REAL default decoder
    png = C.encode_png(np.full((16, 12, 3), 100, dtype=np.uint8))
    media = spark.createDataFrame(
        [("img://png", "image", bytearray(png)), ("img://gif", "image", bytearray(gif))],
        "media_ref string, kind string, payload binary",
    )
    rows = {r["media_ref"]: r for r in extract_media_features(media).collect()}
    assert rows["img://png"]["width"] == 12 and rows["img://png"]["height"] == 16
    assert abs(rows["img://png"]["feature"][0] - 100.0 / 255.0) < 1e-6
    assert rows["img://gif"]["width"] == 5 and rows["img://gif"]["n_frames"] == 1

    # compressed audio/video stays a declared stub (MP3 frame sync header)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        default_decode("audio", b"\xff\xfb\x90\x00 mp3 frame")


def test_jpeg_baseline_codec():
    """Pure-numpy baseline JPEG: constant blocks reconstruct flat within
    the DC quantization bound (±q00/16 = ±1), a smooth gradient round-trips
    above 30 dB PSNR, odd (non-multiple-of-8) sizes crop correctly, and
    the default_decode dispatch picks it up from the SOI marker."""
    import numpy as np

    from dbpedia_spotlight_spark.datapipe import codecs as C
    from dbpedia_spotlight_spark.datapipe.multimodal import default_decode

    for v in (0, 7, 100, 128, 200, 255):
        out = C.decode_jpeg_pixels(
            C.encode_jpeg(np.full((8, 8, 1), v, dtype=np.uint8))
        )
        assert out.shape == (8, 8, 1)
        assert np.all(np.abs(out.astype(int) - v) <= 1), (v, int(out[0, 0, 0]))
        assert np.all(out == out[0, 0, 0])  # perfectly flat reconstruction

    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [
            xx * 255 // (w - 1),
            yy * 255 // (h - 1),
            (xx + yy) * 255 // (w + h - 2),
        ],
        axis=-1,
    ).astype(np.uint8)
    out = C.decode_jpeg_pixels(C.encode_jpeg(arr))
    assert out.shape == arr.shape
    mse = np.mean((out.astype(np.float64) - arr) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 30

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(17, 13, 1), dtype=np.uint8)
    jpg = C.encode_jpeg(gray)
    assert C.decode_jpeg_pixels(jpg).shape == gray.shape
    w_, h_, nf, feat = default_decode("image", jpg)
    assert (w_, h_, nf) == (13, 17, 1) and len(feat) == 8

    # restart markers (DRI + RSTn, DC prediction reset) decode identically
    base = C.decode_jpeg_pixels(C.encode_jpeg(arr))
    for ri in (1, 3, 24):
        assert (
            C.decode_jpeg_pixels(C.encode_jpeg(arr, restart_interval=ri)) == base
        ).all(), ri


def test_png_adam7_and_8bit_wav():
    """Adam7 interlaced PNGs deinterlace exactly (forward-interlaced
    fixtures across channel counts and sub-8px edge sizes); 8-bit unsigned
    PCM WAV decodes with the right scaling."""
    import struct
    import zlib

    import numpy as np

    from dbpedia_spotlight_spark.datapipe import codecs as C
    from dbpedia_spotlight_spark.datapipe.multimodal import decode_wav

    rng = np.random.default_rng(5)
    for h, w, c in ((13, 9, 3), (8, 8, 1), (1, 1, 3), (5, 17, 4)):
        arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        passes = []
        for x0, y0, dx, dy in C._ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            body = sub.reshape(ph, pw * c)
            passes.append(
                b"".join(b"\x00" + body[y].tobytes() for y in range(ph))
            )
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        png = (
            C.PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(b"".join(passes)))
            + chunk(b"IEND", b"")
        )
        out = C.decode_png_pixels(png)
        assert out.shape == arr.shape and (out == arr).all(), (h, w, c)

    data = bytes([128 + 64] * 10)  # constant +0.5 amplitude
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, ch, n, feat = decode_wav(wav)
    assert (rate, ch, n) == (8000, 1, 10)
    assert abs(feat[0] - 0.5) < 1e-6


def test_winnow_fingerprints_reference_and_locality(spark):
    """Winnowing == pure-Python Schleimer et al. reference (incl. the
    rightmost-tie rule and short docs with no full window), and the
    locality guarantee holds: two docs sharing a token run of length
    >= w + k - 1 share at least one fingerprint hash."""
    import hashlib

    from dbpedia_spotlight_spark.datapipe.textstats import (
        winnow_fingerprints,
    )

    def ref_winnow(text, k=4, w=4):
        toks = text.lower().split(" ")
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[16:24], 16)
            for g in grams
        ]
        out = set()
        for s in range(len(hs) - w + 1):
            win = hs[s : s + w]
            m = min(win)
            p = s + max(i for i, v in enumerate(win) if v == m)
            out.add((p, hs[p]))
        return out

    shared = "zebra yak xylophone walrus vulture tortoise snake rabbit"
    texts = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "a b a b a b a b a b a b"),  # hash ties -> rightmost rule
        (3, "one two three four"),  # 1 gram, no full window -> empty
        (4, "intro words here then " + shared + " and a different tail"),
        (5, "other opening text now " + shared + " closing differently"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["h"]))
    for did, text in texts:
        assert got.get(did, set()) == ref_winnow(text), did

    # locality: docs 4 and 5 share an 8-token run (>= w + k - 1 = 7)
    h4 = {h for _p, h in got[4]}
    h5 = {h for _p, h in got[5]}
    assert h4 & h5, "shared run must yield a shared fingerprint"


def test_normalize_nfc(spark):
    """NFC normalization composes decomposed sequences (e+combining acute
    -> precomposed \u00e9), flags changed rows, and leaves ASCII and null
    rows untouched."""
    from dbpedia_spotlight_spark.datapipe.textstats import normalize_nfc

    decomposed = "cafe\u0301 A\u030A"
    composed = "caf\u00e9 \u00c5"
    df = spark.createDataFrame(
        [(1, "plain ascii"), (2, decomposed), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in normalize_nfc(df).collect()}
    assert rows[1]["text"] == "plain ascii" and not rows[1]["changed"]
    assert rows[2]["text"] == composed and rows[2]["changed"]
    assert rows[3]["text"] is None and not rows[3]["changed"]


def test_quota_sample_exact_counts(spark):
    """quota_sample returns exactly min(quota, |stratum|) rows per stratum,
    deterministically (same ids across calls)."""
    from dbpedia_spotlight_spark.datapipe.packing import quota_sample

    rows = [(i, f"s{i % 3}") for i in range(30)]  # 10 per stratum
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = quota_sample(df, {"s0": 4, "s1": 99}, default_quota=0)
    got = {}
    for r in out.collect():
        got.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(got["s0"]) == 4          # true subset
    assert len(got["s1"]) == 10         # over-ask -> whole stratum
    assert "s2" not in got              # default 0 -> dropped
    # determinism: identical pick on a second run
    again = {r["doc_id"] for r in
             quota_sample(df, {"s0": 4, "s1": 99}, default_quota=0)
             .filter("source = 's0'").collect()}
    assert again == got["s0"]


def test_mjpeg_avi_decode_and_frame_sampling(spark):
    """Real compressed-video path: MJPEG AVI (RIFF walk + per-frame
    baseline-JPEG decode). Flat frames reconstruct their level within the
    JPEG DC bound, default_decode dispatches on the 'AVI ' fourcc, and
    sample_frames emits every_n-th frame as a standalone PGM that the
    image path can re-decode."""
    import numpy as np

    from dbpedia_spotlight_spark.datapipe import codecs as C
    from dbpedia_spotlight_spark.datapipe.multimodal import (
        decode_pnm_pixels,
        default_decode,
        encode_avi_mjpeg,
        sample_frames,
    )

    levels = [40, 128, 216]
    frames = [
        C.encode_jpeg(np.full((16, 24, 3), v, dtype=np.uint8)) for v in levels
    ]
    avi = encode_avi_mjpeg(frames, width=24, height=16, fps=10)

    w, h, nf, feat = default_decode("video", avi)
    assert (w, h, nf) == (24, 16, 3)
    for i, v in enumerate(levels):  # 3 frames -> first 3 temporal segments
        assert abs(feat[i] * 255 - v) <= 2, (i, feat[i] * 255)
    assert feat[3:] == [0.0] * 5

    df = spark.createDataFrame([("v1", bytearray(avi))],
                               "media_ref string, payload binary")
    rows = {r["frame_idx"]: r for r in
            sample_frames(df, every_n=2, max_frames=16).collect()}
    assert set(rows) == {0, 2}
    for idx, v in [(0, levels[0]), (2, levels[2])]:
        arr, _maxval = decode_pnm_pixels(bytes(rows[idx]["payload"]))
        assert arr.shape == (16, 24, 1)
        assert abs(float(arr.mean()) - v) <= 2


def test_flac_crc_public_vectors():
    """The FLAC CRC polynomials pinned by public check vectors: CRC-8
    poly 0x07 init 0 (CRC-8/SMBUS) and CRC-16 poly 0x8005 init 0
    non-reflected (CRC-16/UMTS) of b'123456789'."""
    from dbpedia_spotlight_spark.datapipe import flac

    assert flac.crc8(b"123456789") == 0xF4
    assert flac.crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize(
    "mode", ["verbatim", "verbatim_wasted", "fixed2", "lpc2"]
)
def test_flac_mono_roundtrip_all_subframe_types(mode):
    """FLAC is lossless: every subframe coding (verbatim, wasted-bits
    verbatim, FIXED order-2 + Rice residual, LPC + Rice residual)
    round-trips the exact PCM through the bit-level decoder, with frame
    CRC-8/CRC-16 verified on the way back."""
    import numpy as np

    from dbpedia_spotlight_spark.datapipe import flac

    rng = np.random.RandomState(7)
    t = np.arange(5000)
    mono = (3000 * np.sin(t / 23.0) + rng.randint(-200, 200, t.size)).astype(
        np.int64
    )
    if mode == "verbatim_wasted":
        mono = (mono // 8) * 8  # 3 genuinely wasted low bits per sample
    enc = flac.encode_flac(mono, rate=8000, bps=16, blocksize=1024, mode=mode)
    rate, channels, bps, pcm = flac.decode_flac_samples(enc)
    assert (rate, channels, bps) == (8000, 1, 16)
    assert np.array_equal(pcm, mono)
    if mode in ("fixed2", "lpc2"):  # prediction + Rice actually compresses
        assert len(enc) < mono.size * 2 * 0.75


@pytest.mark.parametrize(
    "stereo_mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_flac_stereo_decorrelation_roundtrip(stereo_mode):
    """All four channel assignments reconstruct exactly — including
    mid/side, whose side-LSB trick ((mid<<1)|(side&1)) must restore the
    dropped low bit."""
    import numpy as np

    from dbpedia_spotlight_spark.datapipe import flac

    rng = np.random.RandomState(11)
    t = np.arange(3000)
    left = (2500 * np.sin(t / 17.0) + rng.randint(-100, 100, t.size)).astype(
        np.int64
    )
    right = left // 2 + rng.randint(-50, 50, t.size)
    st = np.stack([left, right], axis=1)
    enc = flac.encode_flac(st, bps=16, mode="fixed2", stereo_mode=stereo_mode)
    rate, channels, _bps, pcm = flac.decode_flac_samples(enc)
    assert channels == 2
    assert np.array_equal(pcm.reshape(-1, 2), st)


def test_flac_constant_blocks_and_corruption_detected():
    """All-equal blocks take the CONSTANT path; a flipped payload bit is
    caught by the frame CRC-16."""
    import numpy as np
    import pytest as _pytest

    from dbpedia_spotlight_spark.datapipe import flac

    const = np.full(2048, -123, dtype=np.int64)
    enc = flac.encode_flac(const, mode="fixed2", blocksize=1024)
    _, _, _, pcm = flac.decode_flac_samples(enc)
    assert np.array_equal(pcm, const)
    bad = bytearray(enc)
    bad[-4] ^= 0x10  # inside the last frame (payload or its CRC-16)
    with _pytest.raises(ValueError):
        flac.decode_flac_samples(bytes(bad))


def test_flac_dispatch_matches_wav_features():
    """default_decode dispatches on the fLaC magic and yields the SAME
    (rate, channels, n_frames, 8-band RMS feature) as the 16-bit PCM WAV
    of identical samples — both normalize by 2^(bps-1)."""
    import numpy as np

    from dbpedia_spotlight_spark.datapipe import flac
    from dbpedia_spotlight_spark.datapipe.audio import build_wav
    from dbpedia_spotlight_spark.datapipe.multimodal import default_decode

    rng = np.random.RandomState(3)
    t = np.arange(4000)
    mono = (5000 * np.sin(t / 31.0) + rng.randint(-300, 300, t.size)).astype(
        np.int16
    )
    via_flac = default_decode(
        "audio", flac.encode_flac(mono.astype(np.int64), rate=16000, bps=16)
    )
    via_wav = default_decode(
        "audio",
        build_wav(
            fmt_tag=1, rate=16000, channels=1, bits=16,
            data=mono.astype("<i2").tobytes(),
        ),
    )
    assert via_flac[:3] == via_wav[:3] == (16000, 1, 4000)
    assert np.allclose(via_flac[3], via_wav[3], atol=1e-6)


def test_kmv_sketch_exact_below_k_and_estimates_above(spark):
    """KMV semantics: a group with < k distinct items reports the EXACT
    count (n_seen == estimate == truth); a group far above k estimates
    within the expected (k-1)/kth_min error envelope (~1/sqrt(k-2), 3
    sigma). Deterministic — no seed, the hash IS the randomness."""
    import pyspark.sql.functions as F

    from dbpedia_spotlight_spark.datapipe.sketches import kmv_sketch

    small = [("s", f"item{i % 17}") for i in range(200)]
    big = [("b", f"tok-{i}") for i in range(5000)]
    df = spark.createDataFrame(small + big, "grp string, item string")
    rows = {
        r["grp"]: r
        for r in kmv_sketch(df, ["grp"], "item", k=64).collect()
    }
    assert rows["s"]["n_seen"] == 17 and rows["s"]["estimate"] == 17.0
    assert rows["b"]["n_seen"] == 64
    rel_err = abs(rows["b"]["estimate"] - 5000) / 5000
    assert rel_err < 3 / (62 ** 0.5), rows["b"]["estimate"]


def test_kmv_intersection_estimates_overlap(spark):
    """Theta-sketch overlap: two 3000-item sets sharing 1500 items; with
    k=256 the intersection estimate lands within 3/sqrt(k) of truth and
    the Jaccard estimate near 1500/4500."""
    from dbpedia_spotlight_spark.datapipe.sketches import kmv_intersection

    a = spark.createDataFrame(
        [(f"x-{i}",) for i in range(3000)], "item string"
    )
    b = spark.createDataFrame(
        [(f"x-{i}",) for i in range(1500, 4500)], "item string"
    )
    row = kmv_intersection(a, b, "item", k=256).collect()[0]
    assert abs(row["inter_estimate"] - 1500) / 1500 < 3 / (256 ** 0.5)
    assert abs(row["jaccard_estimate"] - 1500 / 4500) < 0.06


def test_expectations_single_pass_verdicts(spark):
    """Deequ-style gate: dirty data (nulls, duplicate keys, out-of-range
    numerics) produces passed=False on exactly the violated expectations;
    the whole suite is one aggregation (plan contains a single Aggregate
    of the input)."""
    from dbpedia_spotlight_spark.datapipe.expectations import (
        Expectation,
        validate,
    )

    df = spark.createDataFrame(
        [("a", 5, "xx"), ("b", 50, None), ("b", -1, "yy"), (None, 7, "zz")],
        "id string, score int, note string",
    )
    out = {
        (r["col_name"], r["metric"]): r
        for r in validate(
            df,
            [
                Expectation("id", "completeness", lo=1.0),
                Expectation("id", "uniqueness", lo=1.0),
                Expectation("score", "min", lo=0.0),
                Expectation("score", "max", hi=10.0),
                Expectation("score", "mean", lo=0.0, hi=100.0),
                Expectation("note", "completeness", lo=1.0),
            ],
        ).collect()
    }
    assert out[("id", "completeness")]["value"] == 0.75
    assert not out[("id", "completeness")]["passed"]
    assert out[("id", "uniqueness")]["value"] == 0.5  # 2 distinct / 4 rows
    assert not out[("id", "uniqueness")]["passed"]
    assert out[("score", "min")]["value"] == -1.0
    assert not out[("score", "min")]["passed"]
    assert not out[("score", "max")]["passed"]  # max 50 > 10
    assert out[("score", "mean")]["passed"]
    assert not out[("note", "completeness")]["passed"]


def test_kg_negative_samples_deterministic_and_filtered(spark):
    """TransE-style corrupted-tail sampling: reproducible across runs (the
    hash is the randomness), never emits the true tail as a negative,
    bounded at num_neg per positive, and positives pass through intact."""
    from dbpedia_spotlight_spark.datapipe.kg_samples import negative_samples

    triples = spark.createDataFrame(
        [(f"e{i}", "rel", f"e{(i * 3) % 7}") for i in range(7)],
        "subj string, pred string, obj string",
    )
    entities = spark.createDataFrame(
        [(f"e{i}",) for i in range(7)], "uri string"
    )
    out1 = sorted(
        tuple(r) for r in negative_samples(triples, entities, 3).collect()
    )
    out2 = sorted(
        tuple(r) for r in negative_samples(triples, entities, 3).collect()
    )
    assert out1 == out2
    pos = [r for r in out1 if r[3] == 1]
    neg = [r for r in out1 if r[3] == 0]
    assert len(pos) == 7 and all(r[4] == 0 for r in pos)
    assert 0 < len(neg) <= 7 * 3
    true_tail = {(s, p): o for s, p, o in triples.collect()}
    for s, p, o, _label, j in neg:
        assert 1 <= j <= 3
        assert o != true_tail[(s, p)]


def test_random_walks_follow_edges_and_reproduce(spark):
    """Every consecutive (step, step+1) pair in a walk is an edge of the
    symmetric graph; two invocations yield the identical corpus; each
    (start, walk) emits exactly walk_len+1 rows (no dead ends on a
    connected graph)."""
    from dbpedia_spotlight_spark.datapipe.kg_samples import random_walks

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        "src string, dst string",
    )
    out1 = sorted(
        tuple(r) for r in random_walks(edges, num_walks=3, walk_len=5).collect()
    )
    out2 = sorted(
        tuple(r) for r in random_walks(edges, num_walks=3, walk_len=5).collect()
    )
    assert out1 == out2
    adj = set()
    for s, d in [("a","b"),("b","c"),("c","d"),("d","a"),("a","c")]:
        adj |= {(s, d), (d, s)}
    walks = {}
    for start, wid, step, node in out1:
        walks.setdefault((start, wid), {})[step] = node
    assert len(walks) == 4 * 3  # 4 nodes x 3 walks
    for (start, _wid), seq in walks.items():
        assert len(seq) == 6 and seq[0] == start
        for t in range(5):
            assert (seq[t], seq[t + 1]) in adj


def test_kmv_sketch_plan_shape(spark):
    """Plan guard for the sketch bottom-k: every window is partitioned
    (no single-task global sort in the keyed path) and Spark's
    rank-limit pushdown (WindowGroupLimit partial/final — map-side
    top-k) engages on the row_number <= k filters."""
    from dbpedia_spotlight_spark.datapipe.sketches import kmv_sketch

    df = spark.createDataFrame(
        [("a", f"t{i}") for i in range(100)], "grp string, item string"
    )
    plan = (
        kmv_sketch(df, ["grp"], "item", k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            # partition exprs precede the ASC sort key; an empty
            # partitionBy would put the sort key first
            spec = line.split("windowspecdefinition(", 1)[1]
            assert not spec.lstrip().startswith("_h"), line


def test_funnel_counts_strict_order(spark):
    """Conversion requires the next step STRICTLY AFTER the earliest
    previous-step match; counts are non-increasing."""
    import datetime as dt

    from dbpedia_spotlight_spark.datapipe.funnel import funnel_counts

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 converts fully: signup@1 -> view@2 -> buy@3
        (1, t(1), "signup"), (1, t(2), "view"), (1, t(3), "buy"),
        # u2: buy BEFORE view -> stops after view
        (2, t(1), "signup"), (2, t(3), "view"), (2, t(2), "buy"),
        # u3: view only, never signed up -> not even step 1
        (3, t(1), "view"),
        # u4: signup only
        (4, t(5), "signup"),
        # u5: view at the SAME ts as signup -> strict > excludes it
        (5, t(1), "signup"), (5, t(1), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        (r.step_idx, r.step): r.n_users
        for r in funnel_counts(ev, ["signup", "view", "buy"]).collect()
    }
    assert got == {(0, "signup"): 4, (1, "view"): 2, (2, "buy"): 1}


def test_retention_cohorts_offsets(spark):
    import datetime as dt

    from dbpedia_spotlight_spark.datapipe.funnel import retention_cohorts

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        (1, d(1)), (1, d(2)),   # week of Jan 1: offsets 0 only (both days same week)
        (1, d(10)),             # next week: offset 1
        (2, d(1)),              # offset 0 only
        (3, d(10)), (3, d(24)),  # cohort Jan 8 week; offsets 0 and 2
    ]
    ev = spark.createDataFrame(
        [(u, ts, "e") for u, ts in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        (r.cohort, r.period_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }


def test_fastrp_embeddings_deterministic_and_structural(spark):
    """Embeddings replay identically across invocations; structurally
    equivalent nodes (same neighborhood) get identical vectors; a hop-1
    value equals the hand-computed mean of neighbor projections."""
    from dbpedia_spotlight_spark.datapipe.kg_samples import (
        fastrp_embeddings,
        fastrp_projection,
    )
    from pyspark.sql import functions as F

    # star: hub h connected to a, b; a and b are structurally identical
    ed = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("a", "h"), ("b", "h")],
        "src string, dst string",
    )
    e1 = {(r.node, r.j): r.value for r in fastrp_embeddings(ed, dim=4).collect()}
    e2 = {(r.node, r.j): r.value for r in fastrp_embeddings(ed, dim=4).collect()}
    assert e1 == e2 and e1
    va = [e1.get(("a", j), 0.0) for j in range(4)]
    vb = [e1.get(("b", j), 0.0) for j in range(4)]
    assert va == vb  # same single neighbor (h) -> identical embeddings

    # hand-check hop-1 for the hub: mean over {a, b} of their projections
    proj = {
        (r.node, r.j): r.r
        for r in fastrp_projection(
            spark.createDataFrame([("h",), ("a",), ("b",)], "node string"),
            dim=4,
        ).collect()
    }
    emb = fastrp_embeddings(ed, dim=4, weights=(1.0, 0.0))
    got_h = {r.j: r.value for r in emb.filter(F.col("node") == "h").collect()}
    for j in range(4):
        expect = (proj.get(("a", j), 0.0) + proj.get(("b", j), 0.0)) / 2
        assert abs(got_h.get(j, 0.0) - round(expect, 6)) < 1e-9


def test_temperature_quotas_hamilton(spark):
    from dbpedia_spotlight_spark.datapipe.packing import (
        temperature_quotas,
        temperature_sample,
    )

    # strata: 64 'big', 25 'mid', 11 'tiny' — sized so alpha=0.5 caps
    # nothing (exact Hamilton apportionment regime)
    rows = (
        [("b%d" % i, "big") for i in range(64)]
        + [("m%d" % i, "mid") for i in range(25)]
        + [("t%d" % i, "tiny") for i in range(11)]
    )
    docs = spark.createDataFrame(rows, "doc_id string, source string")
    q = {
        r.source: (r.n_docs, r.quota)
        for r in temperature_quotas(docs, 50, alpha=0.5).collect()
    }
    # weights 8 : 5 : 3.3166 -> 24.51/15.32/10.16 -> 25/15/10
    assert q == {"big": (64, 25), "mid": (25, 15), "tiny": (11, 10)}
    assert sum(v[1] for v in q.values()) == 50
    # alpha upweights the tail vs proportional (64/100*50 = 32)
    assert q["big"][1] < 32
    # alpha=1 reduces to proportional allocation (mid wins the tie on
    # remainder .5/.5 by name asc)
    qp = {
        r.source: r.quota
        for r in temperature_quotas(docs, 50, alpha=1.0).collect()
    }
    assert qp == {"big": 32, "mid": 13, "tiny": 5}
    # capped stratum: quota never exceeds population, capped-off mass
    # is not redistributed (documented)
    q1 = {
        r.source: r.quota
        for r in temperature_quotas(docs, 99, alpha=0.1).collect()
    }
    assert q1["tiny"] <= 11 and sum(q1.values()) <= 99
    samp = temperature_sample(docs, 50, alpha=0.5)
    assert samp.count() == 50
    # deterministic: same call, same rows
    ids1 = {r.doc_id for r in samp.collect()}
    ids2 = {r.doc_id for r in temperature_sample(docs, 50, alpha=0.5).collect()}
    assert ids1 == ids2


def test_leakage_safe_split_groups_stay_together(spark):
    import pytest

    from dbpedia_spotlight_spark.datapipe.packing import leakage_safe_split

    rows = [("d%d" % i, "g%d" % (i % 25)) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id string, source string")
    out = leakage_safe_split(
        docs, {"train": 0.8, "valid": 0.1, "test": 0.1}
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.source, set()).add(r.split)
    # every group lands in exactly one split
    assert all(len(s) == 1 for s in by_group.values())
    assert {r.split for r in out} <= {"train", "valid", "test"}
    # majority in train
    n_train = sum(1 for r in out if r.split == "train")
    assert n_train > 100
    with pytest.raises(ValueError):
        leakage_safe_split(docs, {})
    with pytest.raises(ValueError):
        leakage_safe_split(docs, {"a": 0.9, "b": 0.2})


def test_verbalize_triples_templates_and_grouping(spark):
    from dbpedia_spotlight_spark.datapipe.kg_samples import verbalize_triples

    t = spark.createDataFrame(
        [("A", "born", "P"), ("A", "likes", "B"), ("B", "born", "Q")],
        "subj string, pred string, obj string",
    )
    lab = spark.createDataFrame(
        [("A", "Alice"), ("P", "Paris")], "uri string, label string"
    )
    per = {
        (r.subj, r.pred): r.sentence
        for r in verbalize_triples(
            t,
            labels=lab,
            templates={"born": "{s} was born in {o}."},
            group_by_subject=False,
        ).collect()
    }
    assert per[("A", "born")] == "Alice was born in Paris."
    assert per[("A", "likes")] == "Alice likes B."
    assert per[("B", "born")] == "B was born in Q."
    grouped = {
        r.subj: (r.text, r.n_facts)
        for r in verbalize_triples(
            t, labels=lab, templates={"born": "{s} was born in {o}."}
        ).collect()
    }
    assert grouped["A"] == ("Alice likes B. Alice was born in Paris.", 2)
    assert grouped["B"] == ("B was born in Q.", 1)


def test_priority_sample_weighted_deterministic(spark):
    import pytest

    from dbpedia_spotlight_spark.datapipe.packing import priority_sample

    rows = [
        ("d%02d" % i, "s%d" % (i % 2), float(1 + i % 5)) for i in range(40)
    ] + [("z1", "s0", 0.0), ("z2", "s0", None)]
    df = spark.createDataFrame(rows, "doc_id string, source string, w double")
    g1 = sorted(r.doc_id for r in priority_sample(df, 5, "w").collect())
    g2 = sorted(r.doc_id for r in priority_sample(df, 5, "w").collect())
    assert g1 == g2 and len(g1) == 5
    # zero/null weights never sampled even at k = corpus size
    allk = sorted(r.doc_id for r in priority_sample(df, 100, "w").collect())
    assert "z1" not in allk and "z2" not in allk and len(allk) == 40
    # stratified: k per stratum
    s = priority_sample(df, 3, "w", stratum_col="source")
    per = {}
    for r in s.collect():
        per.setdefault(r.source, []).append(r.doc_id)
    assert {k: len(v) for k, v in per.items()} == {"s0": 3, "s1": 3}
    # weights matter: upweighting one doc pulls it into the sample
    boost = spark.createDataFrame(
        [("d%02d" % i, "s0", 1e6 if i == 39 else 1.0) for i in range(40)],
        "doc_id string, source string, w double",
    )
    assert "d39" in {r.doc_id for r in priority_sample(boost, 3, "w").collect()}
    with pytest.raises(ValueError):
        priority_sample(df, 0, "w")


def test_contrastive_triplets_hard_negatives(spark):
    from dbpedia_spotlight_spark.datapipe.kg_samples import contrastive_triplets

    # anchor 0 ~ [1,0]; its positive is 1; nearest non-linked is 2
    # (cos ~0.995), then 3 (cos ~0.9). 4 is orthogonal.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [1.0, 0.1]),
            (3, [0.9, 0.44]),
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    links = spark.createDataFrame([(0, 1)], "a long, b long")
    got = [
        (r.anchor, r.pos_id, r.neg_id, r.neg_rank)
        for r in contrastive_triplets(emb, links, k_neg=2).collect()
    ]
    assert sorted(got) == [(0, 1, 2, 1), (0, 1, 3, 2)]
    # the positive (1) and self (0) never appear as negatives
    assert all(g[2] not in (0, 1) for g in got)


def test_vocab_profile_zipf(spark):
    import math

    from dbpedia_spotlight_spark.datapipe.textstats import vocab_profile

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a d e")], "doc_id int, text string"
    )
    row = vocab_profile(docs, top_k=2).collect()[0]
    assert row.n_tokens == 9 and row.vocab_size == 5
    assert row.hapax == 3 and row.dis_legomena == 1
    # top-2 types (a:4, b:2) cover 6/9
    assert row.topk_coverage == round(6 / 9, 6)
    # slope of ln(freq) over ln(rank) for freqs [4,2,1,1,1]
    xs = [math.log(r) for r in range(1, 6)]
    ys = [math.log(f) for f in [4, 2, 1, 1, 1]]
    mx = sum(xs) / 5
    my = sum(ys) / 5
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert abs(row.zipf_slope - slope) < 1e-6


def test_blend_scores_percentiles(spark):
    import pytest

    from dbpedia_spotlight_spark.datapipe.packing import blend_scores

    d = spark.createDataFrame(
        [("d1", 10.0, 1.0), ("d2", 20.0, 2.0), ("d3", 30.0, None)],
        "doc_id string, q double, p double",
    )
    got = {r.doc_id: (r.q_pct, r.p_pct, r.blended) for r in blend_scores(d, {"q": 1.0, "p": -1.0}).collect()}
    # q ranks 0, .5, 1; p: NULL first -> d3 pct 0, then d1 .5, d2 1
    assert got["d1"] == (0.0, 0.5, -0.5)
    assert got["d2"] == (0.5, 1.0, -0.5)
    assert got["d3"] == (1.0, 0.0, 1.0)
    with pytest.raises(ValueError):
        blend_scores(d, {})


def test_mixture_drift_chi2(spark):
    import pytest

    from dbpedia_spotlight_spark.datapipe.packing import mixture_drift

    d = spark.createDataFrame(
        [("d%d" % i, "s%d" % (i % 3)) for i in range(90)] + [("x", "rogue")],
        "doc_id string, source string",
    )
    got = {
        r.source: (r.observed, r.expected, r.chi2)
        for r in mixture_drift(d, {"s0": 0.5, "s1": 0.3, "s2": 0.2}).collect()
    }
    # total 91; s0 expected 45.5 -> (30-45.5)^2/45.5
    assert got["s0"] == (30, 45.5, round((30 - 45.5) ** 2 / 45.5, 6))
    # unplanned stratum: expected 0, chi2 NULL (flagged, not divided)
    assert got["rogue"] == (1, 0.0, None)
    with pytest.raises(ValueError):
        mixture_drift(d, {})


def test_shard_divergence_kl(spark):
    import math

    from dbpedia_spotlight_spark.datapipe.textstats import shard_divergence

    docs = spark.createDataFrame(
        [(1, "a", "x x y"), (2, "b", "y z")],
        "doc_id int, source string, text string",
    )
    got = {r.source: (r.n_tokens, r.vocab_size, r.kl) for r in shard_divergence(docs).collect()}
    # corpus: x:2 y:2 z:1 (n=5); shard a: x:2 y:1 (n=3)
    kl_a = (2 / 3) * math.log((2 / 3) / (2 / 5)) + (1 / 3) * math.log(
        (1 / 3) / (2 / 5)
    )
    assert got["a"] == (3, 2, round(kl_a, 6))
    kl_b = (1 / 2) * math.log((1 / 2) / (2 / 5)) + (1 / 2) * math.log(
        (1 / 2) / (1 / 5)
    )
    assert got["b"] == (2, 2, round(kl_b, 6))


def test_sft_pack_loss_masks(spark):
    from dbpedia_spotlight_spark.datapipe.packing import sft_pack

    pairs = spark.createDataFrame(
        [("e1", "q one two", "a b c"),        # 3 + 3 tokens
         ("e2", "p", "x y z w v u t s"),      # 1 + 8
         ("e3", "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10", "c1")],  # 10 + 1
        "example_id string, prompt string, completion string",
    )
    got = sorted(map(tuple, sft_pack(pairs, 8).collect()))
    # e1: chunk 0 pos [0,6), loss = completion tail [3,6)
    assert (0, "e1", 0, 6, 3, 6) in got
    # e2 global tokens [6,15): chunk-0 slice pos [6,8) loss [7,8);
    # chunk-1 slice pos [0,7) all completion
    assert (0, "e2", 6, 2, 7, 8) in got
    assert (1, "e2", 0, 7, 0, 7) in got
    # e3 global [15,26): chunk-1 slice toks [0,1) pos [7,8) is PROMPT
    # ONLY -> empty loss span (start == end == slice end)
    e3 = [g for g in got if g[1] == "e3"]
    first = [g for g in e3 if g[0] == 1][0]
    assert first[2:] == (7, 1, 8, 8)
    # every loss span sits inside its slice
    for _, _, pos, n, lo, hi in got:
        assert pos <= lo <= hi <= pos + n


def test_ann_recall_counts_and_silent_miss(spark):
    import pytest

    from dbpedia_spotlight_spark.datapipe.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, c, r) for r, c in enumerate([10, 11, 12], 1)] + [(2, 20, 1)],
        "query_id long, cand_id long, rank int",
    )
    approx = spark.createDataFrame(
        [(1, 11, 1), (1, 99, 2), (1, 12, 3)],
        "query_id long, cand_id long, rank int",
    )
    got = {
        r.query_id: (r.n_exact, r.n_hit, r.recall)
        for r in ann_recall(approx, exact, 3).collect()
    }
    assert got[1] == (3, 2, 0.666667)
    # query 2 absent from the approx index -> surfaced at recall 0
    assert got[2] == (1, 0, 0.0)
    with pytest.raises(ValueError):
        ann_recall(approx, exact, 0)


def test_harmonic_pack_no_split_invariants(spark):
    import pytest

    from pyspark.sql import functions as F

    from dbpedia_spotlight_spark.datapipe.packing import harmonic_pack

    docs = spark.createDataFrame(
        [("d%02d" % i, " ".join(["w"] * (3 + i % 30))) for i in range(40)]
        + [("huge", " ".join(["w"] * 100)), ("empty", "")],
        "doc_id string, text string",
    )
    out = harmonic_pack(docs, 32)
    rows = out.collect()
    # no document split: one row per placed doc
    assert len(rows) == len({r.doc_id for r in rows}) == 40
    # oversize and empty docs dropped
    placed = {r.doc_id for r in rows}
    assert "huge" not in placed and "empty" not in placed
    # every bin total <= budget (the harmonic construction guarantee)
    over = (
        out.groupBy("bin_id").agg(F.sum("n_tok").alias("t"))
        .filter(F.col("t") > 32).count()
    )
    assert over == 0
    # offsets are the within-bin prefix sums
    for r in rows:
        assert r.bin_offset >= 0 and r.bin_offset + r.n_tok <= 32
    with pytest.raises(ValueError):
        harmonic_pack(docs, 0)


def test_blocklist_filter_matches(spark):
    import pytest

    from dbpedia_spotlight_spark.datapipe.textstats import blocklist_filter

    d = spark.createDataFrame(
        [(1, "a clean doc"), (2, "contains BADWORD and worse here")],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.blocked, list(r.matched))
        for r in blocklist_filter(d, ["badword", "worse", "absent"]).collect()
    }
    assert got[1] == (False, [])
    assert got[2] == (True, ["badword", "worse"])
    with pytest.raises(ValueError):
        blocklist_filter(d, [])


def test_dedup_audit_recall_precision(spark):
    from dbpedia_spotlight_spark.datapipe.dedup import dedup_audit

    ap = spark.createDataFrame(
        [("x", "y"), ("q", "p"), ("z", "w")], "a string, b string"
    )
    ex = spark.createDataFrame(
        [("y", "x"), ("p", "q"), ("m", "n")], "a string, b string"
    )
    r = dedup_audit(ap, ex).collect()[0]
    # orientation canonicalized: (x,y)/(y,x) and (q,p)/(p,q) match
    assert (r.n_exact, r.n_approx, r.n_hit) == (3, 3, 2)
    assert r.recall == r.precision == 0.666667
    # empty exact side -> NULL rate, not a division error
    r2 = dedup_audit(ap, ex.limit(0)).collect()[0]
    assert r2.n_exact == 0 and r2.recall is None


def test_hll_registers_merge_and_estimate(spark):
    """HLL invariants: (1) registers of the UNION equal the element-wise
    max of the halves' registers (mergeability — the distributed-merge
    correctness condition); (2) a 5000-distinct stream estimates within
    the ~1.04/sqrt(m) standard error (3 sigma); (3) a small group takes
    the linear-counting branch and lands near truth."""
    from dbpedia_spotlight_spark.datapipe.sketches import (
        hll_estimate,
        hll_registers,
    )

    rows = [("a" if i % 2 else "b", f"tok-{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "grp string, item string")
    whole = df.select(F.lit("all").alias("grp"), "item")

    half_regs = hll_registers(df, ["grp"], "item", p=8)
    merged = (
        half_regs.groupBy("bucket")
        .agg(F.max("register").alias("register"))
        .select(F.lit("all").alias("grp"), "bucket", "register")
    )
    whole_regs = hll_registers(whole, ["grp"], "item", p=8)
    sym_diff = merged.select("bucket", "register").exceptAll(
        whole_regs.select("bucket", "register")
    )
    assert sym_diff.count() == 0

    est = hll_estimate(whole_regs, ["grp"], p=8).collect()[0]
    assert abs(est["estimate"] - 5000) / 5000 < 3 * 1.04 / (256**0.5)

    tiny = spark.createDataFrame(
        [("t", f"x{i}") for i in range(30)], "grp string, item string"
    )
    trow = hll_estimate(hll_registers(tiny, ["grp"], "item", p=8), ["grp"], p=8).collect()[0]
    # linear-counting regime: estimate within ~15% at 30 items, m=256
    assert abs(trow["estimate"] - 30) <= 5


def test_cms_never_undercounts_and_is_tight_for_heavy_items(spark):
    """CMS guarantees: estimate >= true count always; for items far above
    the noise floor (n/width per row) the min-over-depth estimate is
    close. Also: the sketch has at most depth*width cells and total mass
    per row equals the stream length."""
    from dbpedia_spotlight_spark.datapipe.sketches import (
        cms_point_estimates,
        cms_sketch,
    )

    rows = (
        [("heavy",)] * 400
        + [("warm",)] * 100
        + [(f"tail-{i}",) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "item string")
    sk = cms_sketch(df, "item", depth=3, width=64)
    per_row = {
        r["row_idx"]: r["s"]
        for r in sk.groupBy("row_idx").agg(F.sum("cell").alias("s")).collect()
    }
    assert per_row == {0: 1000, 1: 1000, 2: 1000}
    assert sk.count() <= 3 * 64

    truth = df.groupBy("item").agg(F.count("*").alias("cnt"))
    est = cms_point_estimates(sk, truth.select("item"), "item", depth=3, width=64)
    j = {
        r["item"]: (r["cnt"], r["cms_estimate"])
        for r in truth.join(est, "item").collect()
    }
    for item, (cnt, e) in j.items():
        assert e >= cnt, (item, cnt, e)
    # heavy item: noise floor is ~1000/64 ≈ 16 per row; min over 3 rows
    # stays within a few floors of truth
    assert j["heavy"][1] - j["heavy"][0] <= 3 * (1000 // 64 + 1)


def test_k_anonymity_report_and_suppression(spark):
    """k-anonymity: classes below k flagged, suppression masks exactly
    those rows' quasi columns (and only those), non-QI columns pass
    through untouched, and the suppressed table is k-anonymous for the
    suppressed class too."""
    from dbpedia_spotlight_spark.datapipe.pii import (
        k_anonymity_report,
        k_suppress,
    )

    rows = (
        [("DE", "M", i, "flu") for i in range(4)]
        + [("DE", "F", 10, "flu"), ("DE", "F", 11, "cold")]
        + [("FR", "M", 20, "flu")]
    )
    df = spark.createDataFrame(rows, "country string, sex string, uid int, dx string")
    rep = {
        (r["country"], r["sex"]): r
        for r in k_anonymity_report(df, ["country", "sex"], "dx", k=3).collect()
    }
    assert rep[("DE", "M")]["k_anonymous"] is True
    assert rep[("DE", "M")]["l_diversity"] == 1  # homogeneity attack
    assert rep[("DE", "M")]["l_diverse"] is False
    assert rep[("DE", "F")]["k_anonymous"] is False
    assert rep[("DE", "F")]["l_diversity"] == 2
    assert rep[("FR", "M")]["k_anonymous"] is False

    sup = k_suppress(df, ["country", "sex"], k=3).collect()
    by_uid = {r["uid"]: r for r in sup}
    assert by_uid[0]["country"] == "DE" and by_uid[0]["sex"] == "M"
    for uid in (10, 11, 20):
        assert by_uid[uid]["country"] == "*" and by_uid[uid]["sex"] == "*"
    assert {r["dx"] for r in sup} == {"flu", "cold"}
    assert len(sup) == 7


def test_greedy_max_coverage_exact_greedy_order(spark):
    """Greedy coverage on a hand-built instance: doc A covers {1..4},
    B {3..7}, C {1,2}, D {8}. Greedy picks B (5), then A (gain 2: {1,2}
    — tie with C broken by... A adds {1,2} gain 2, C adds {1,2} gain 2,
    tie -> ascending id picks A), then D (1), then C gains 0 -> stops.
    covered_total is cumulative and the early-stop drops round 3."""
    from dbpedia_spotlight_spark.datapipe.selection import greedy_max_coverage

    rows = (
        [("A", f) for f in (1, 2, 3, 4)]
        + [("B", f) for f in (3, 4, 5, 6, 7)]
        + [("C", f) for f in (1, 2)]
        + [("D", f) for f in (8,)]
    )
    df = spark.createDataFrame(rows, "doc string, feat int")
    out = greedy_max_coverage(df, "doc", "feat", k=4).collect()
    assert [(r["round_idx"], r["doc"], r["gain"], r["covered_total"]) for r in out] == [
        (0, "B", 5, 5),
        (1, "A", 2, 7),
        (2, "D", 1, 8),
    ]


def _mk_events(spark, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_event_transitions_probabilities(spark):
    """Markov matrix: per-user consecutive pairs only (no cross-user
    transitions), probabilities row-normalize to 1 per src."""
    from dbpedia_spotlight_spark.datapipe.funnel import event_transitions

    ev = _mk_events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "a", 0.0),
            (2, "2024-01-01 00:01:00", 1, "b", 0.0),
            (3, "2024-01-01 00:02:00", 1, "a", 0.0),
            (4, "2024-01-01 00:00:30", 2, "a", 0.0),
            (5, "2024-01-01 00:01:30", 2, "a", 0.0),
        ],
    )
    rows = {
        (r["src"], r["dst"]): r for r in event_transitions(ev).collect()
    }
    assert rows[("a", "b")]["n"] == 1 and rows[("b", "a")]["n"] == 1
    assert rows[("a", "a")]["n"] == 1
    assert rows[("a", "b")]["prob"] == 0.5 and rows[("a", "a")]["prob"] == 0.5
    assert rows[("b", "a")]["prob"] == 1.0
    import math

    for src in ("a", "b"):
        assert math.isclose(
            sum(r["prob"] for k, r in rows.items() if k[0] == src), 1.0
        )


def test_touch_attribution_models(spark):
    """User converts once with touches view(t1) click(t2) view(t3):
    first credit -> view, last credit -> view(t3), linear 1/3 each
    (333333 micros); a touch AFTER the conversion earns nothing."""
    from dbpedia_spotlight_spark.datapipe.funnel import touch_attribution

    ev = _mk_events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1, "view", 0.0),
            (2, "2024-01-01 00:01:00", 1, "click", 0.0),
            (3, "2024-01-01 00:02:00", 1, "view", 0.0),
            (4, "2024-01-01 00:03:00", 1, "purchase", 0.0),
            (5, "2024-01-01 00:04:00", 1, "click", 0.0),
        ],
    )
    out = {
        r["touch_type"]: r
        for r in touch_attribution(ev, "purchase", ["view", "click"]).collect()
    }
    assert out["view"]["n_touches"] == 2 and out["click"]["n_touches"] == 1
    assert out["view"]["first_credit"] == 1 and out["click"]["first_credit"] == 0
    assert out["view"]["last_credit"] == 1 and out["click"]["last_credit"] == 0
    assert out["view"]["linear_micros"] == 2 * 333333
    assert out["click"]["linear_micros"] == 333333


def test_ab_test_report_deterministic_split_and_z(spark):
    """Hash split is a pure function of user id; z is NULL when pooled
    conversion is degenerate (all convert) and finite otherwise."""
    from dbpedia_spotlight_spark.datapipe.funnel import ab_test_report

    rows = []
    for uid in range(40):
        rows.append((uid * 2, "2024-01-01 00:00:00", uid, "view", 0.0))
        if uid % 3 == 0:
            rows.append((uid * 2 + 1, "2024-01-01 00:01:00", uid, "buy", 0.0))
    ev = _mk_events(spark, rows)
    r = ab_test_report(ev, "buy").collect()[0]
    assert r["n_a"] + r["n_b"] == 40
    assert r["conv_a"] + r["conv_b"] == 14
    assert r["z_score"] is not None
    # degenerate: every user converts -> NULL z, rates 1.0
    ev_all = _mk_events(
        spark,
        [(uid, "2024-01-01 00:00:00", uid, "buy", 0.0) for uid in range(10)],
    )
    r2 = ab_test_report(ev_all, "buy").collect()[0]
    assert r2["rate_a"] == 1.0 and r2["rate_b"] == 1.0
    assert r2["z_score"] is None


def test_event_ohlc_open_close_ties(spark):
    """OHLC: open/close by (ts, id) with id tiebreak on equal
    timestamps; high/low/volume integer-exact."""
    from dbpedia_spotlight_spark.datapipe.funnel import event_ohlc

    ev = _mk_events(
        spark,
        [
            (2, "2024-01-01 05:00:00", 1, "m", 10.00),
            (1, "2024-01-01 05:00:00", 1, "m", 11.00),
            (3, "2024-01-01 05:30:00", 2, "m", 9.50),
            (4, "2024-01-01 05:59:59", 1, "m", 10.25),
            (5, "2024-01-01 06:00:00", 1, "m", 99.00),
        ],
    )
    out = {
        str(r["bucket_ts"]): r for r in event_ohlc(ev).collect()
    }
    five = out["2024-01-01 05:00:00"]
    assert five["open_cents"] == 1100  # event_id 1 wins the ts tie
    assert five["close_cents"] == 1025
    assert five["high_cents"] == 1100 and five["low_cents"] == 950
    assert five["n"] == 4 and five["volume_cents"] == 4075
    assert out["2024-01-01 06:00:00"]["open_cents"] == 9900


def test_readability_scores_formula(spark):
    """Known text: 'The cat sat. The dog ran!' -> 6 words, 2 sentences,
    6 syllables (one vowel group per word) -> flesch = 206.835 -
    1.015*3 - 84.6*1 = 119.19; empty text -> NULL scores."""
    from dbpedia_spotlight_spark.datapipe.textstats import readability_scores

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    assert out[1]["n_words"] == 6
    assert out[1]["n_sentences"] == 2
    assert out[1]["n_syllables"] == 6
    assert out[1]["flesch"] == round(206.835 - 1.015 * 3 - 84.6 * 1, 4)
    assert out[1]["fk_grade"] == round(0.39 * 3 + 11.8 * 1 - 15.59, 4)
    assert out[2]["n_words"] == 0 and out[2]["flesch"] is None


def test_event_acf_alternating_series(spark):
    """A strictly alternating two-value series has lag-1 corr -1 and
    lag-2 corr +1; a constant series yields NULL (zero variance)."""
    rows = []
    for i in range(40):
        rows.append((i, f"2024-01-01 00:{i:02d}:00", 1, "alt", 10.0 if i % 2 else 20.0))
    for i in range(10):
        rows.append((100 + i, f"2024-01-01 01:{i:02d}:00", 1, "flat", 5.0))
    ev = _mk_events(spark, rows)
    from dbpedia_spotlight_spark.datapipe.funnel import event_acf

    out = {
        (r["event_type"], r["lag"]): r["corr"]
        for r in event_acf(ev, max_lag=2).collect()
    }
    assert out[("alt", 1)] == -1.0
    assert out[("alt", 2)] == 1.0
    assert out[("flat", 1)] is None


def test_benford_profile_digits_and_chi2(spark):
    """First digits come from the cent representation; shares sum to 1;
    a perfectly Benford-weighted sample has near-zero chi2 terms; zero
    and negative values are excluded."""
    import math

    from dbpedia_spotlight_spark.datapipe.expectations import (
        BENFORD_SHARES,
        benford_profile,
    )

    rows = []
    for d in range(1, 10):
        n = round(BENFORD_SHARES[d] * 1000)
        rows += [(float(d),)] * n  # d.00 -> cents d00 -> first digit d
    rows += [(0.0,), (-3.0,)]  # excluded
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    total = sum(r["n_obs"] for r in out.values())
    assert total == sum(round(BENFORD_SHARES[d] * 1000) for d in range(1, 10))
    assert math.isclose(sum(r["obs_share"] for r in out.values()), 1.0, abs_tol=1e-4)
    for r in out.values():
        assert r["chi2_term"] < 0.01  # rounding of the sample, not skew


def test_mmr_rerank_prefers_diverse_over_redundant(spark):
    """Hand instance (3-d so diversity and relevance decouple):
    candidates A and B are near-duplicates with top relevance, C is
    moderately relevant but nearly orthogonal to A. Pure relevance
    ranks (A, B); MMR at diversity-heavy lam=0.3 picks A then C (B's
    ~1.0 similarity to A sinks it). Round 0's score is the bare
    relevance."""
    from dbpedia_spotlight_spark.datapipe.similarity import mmr_rerank

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),    # query
            (1, [1.0, 0.01, 0.0]),   # A
            (2, [1.0, 0.02, 0.0]),   # B ~ A
            (3, [0.6, 0.0, 0.8]),    # C: rel 0.6, sim-to-A ~ 0.6
        ],
        "vec_id long, embedding array<double>",
    )
    out = mmr_rerank(emb, query_vec_id=0, pool_size=3, k=2, lam=0.3)
    rows = sorted(
        (r["round_idx"], r["cand_id"]) for r in out.collect()
    )
    assert rows == [(0, 1), (1, 3)]
    r0 = {r["round_idx"]: r for r in out.collect()}
    assert r0[0]["mmr_score"] == r0[0]["relevance"]
    assert r0[1]["mmr_score"] < r0[1]["relevance"]  # penalty applied


def test_rrf_fuse_three_lists_and_missing_ids(spark):
    """RRF: an id present in all three lists outranks ids in one list;
    score = sum of 1/(60+rank) over exactly the lists containing the
    id; fused_rank ties break by ascending id."""
    from dbpedia_spotlight_spark.datapipe.similarity import rrf_fuse

    def ranked(pairs):
        return spark.createDataFrame(pairs, "doc_id long, rank int")

    lists = [
        ranked([(1, 1), (2, 2), (3, 3)]),
        ranked([(1, 2), (4, 1)]),
        ranked([(1, 3), (4, 2)]),
    ]
    out = {r["doc_id"]: r for r in rrf_fuse(lists).collect()}
    assert out[1]["fused_rank"] == 1
    expect_1 = round(1 / 61 + 1 / 62 + 1 / 63, 9)
    assert out[1]["rrf_score"] == expect_1
    assert out[3]["rrf_score"] == round(1 / 63, 9)
    assert out[4]["rrf_score"] == round(1 / 61 + 1 / 62, 9)
    assert out[4]["fused_rank"] == 2


def test_degree_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative (corr = -1: every edge
    joins the hub's high degree to a leaf's degree 1); a cycle is
    degree-regular -> zero variance -> NULL."""
    from dbpedia_spotlight_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], "src string, dst string"
    )
    r = degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 5 and r["corr"] == -1.0

    cycle = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r2 = degree_assortativity(cycle).collect()[0]
    assert r2["corr"] is None


def test_ab_cuped_reduces_variance_with_predictive_covariate(spark):
    """CUPED sanity on a constructed experiment: users' post-period
    spend equals their pre-period spend plus a small per-user delta, so
    the covariate is near-perfectly predictive -> theta ~ 1,
    var_reduction close to 1, and the ADJUSTED arm difference recovers
    the true delta difference (the base-spend heterogeneity cancels).
    With NO pre-period data (zero covariate variance) theta and the
    adjustment are NULL."""
    import hashlib

    def arm_of(uid):
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:12], 16)
        return "A" if h % 2 == 0 else "B"

    rows = []
    eid = 0
    deltas = {"A": [], "B": []}
    for uid in range(60):
        base = 10.0 + (uid % 7) * 5.0  # user-level heterogeneity
        delta = 2.0 if uid % 3 == 0 else 0.0
        deltas[arm_of(uid)].append(delta * 100)  # cents
        rows.append((eid, "2024-01-05 00:00:00", uid, "view", base)); eid += 1
        rows.append((eid, "2024-01-20 00:00:00", uid, "view", base + delta)); eid += 1
    ev = _mk_events(spark, rows)
    from dbpedia_spotlight_spark.datapipe.funnel import ab_cuped

    out = {r["arm"]: r for r in ab_cuped(ev, "2024-01-15 00:00:00").collect()}
    assert set(out) == {"A", "B"}
    for r in out.values():
        assert r["theta"] is not None and abs(r["theta"] - 1.0) < 0.1
        assert r["var_reduction"] > 0.8
    true_diff = sum(deltas["A"]) / len(deltas["A"]) - sum(deltas["B"]) / len(
        deltas["B"]
    )
    adj_diff = out["A"]["mean_post_adj"] - out["B"]["mean_post_adj"]
    assert abs(adj_diff - true_diff) < 40  # cents

    ev_no_pre = _mk_events(
        spark,
        [(i, "2024-01-20 00:00:00", i, "view", 5.0) for i in range(10)],
    )
    r2 = ab_cuped(ev_no_pre, "2024-01-15 00:00:00").collect()[0]
    assert r2["theta"] is None and r2["mean_post_adj"] is None


def test_mann_whitney_u_matches_scipy_free_reference(spark):
    """The histogram-convolution U equals the textbook pairwise count
    (computed naively in Python, ties as half-pairs, doubled), and a
    location-shifted arm yields a clearly negative/positive z while
    identical arms give z ~ 0."""
    import hashlib

    from dbpedia_spotlight_spark.datapipe.funnel import mann_whitney_u

    def arm_of(uid):
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:12], 16)
        return "A" if h % 2 == 0 else "B"

    rows, eid = [], 0
    vals = {"A": [], "B": []}
    for uid in range(40):
        shift = 3.0 if arm_of(uid) == "B" else 0.0
        for j in range(3):
            v = 1.0 + ((uid * 7 + j * 13) % 10) + shift
            vals[arm_of(uid)].append(round(v * 100))
            rows.append((eid, "2024-01-05 00:00:00", uid, "view", v))
            eid += 1
    ev = _mk_events(spark, rows)
    r = mann_whitney_u(ev).collect()[0]
    u2_naive = sum(
        2 * (a > b) + (a == b) for a in vals["A"] for b in vals["B"]
    )
    assert r["u2_a"] == u2_naive
    assert r["n_a"] == len(vals["A"]) and r["n_b"] == len(vals["B"])
    assert r["z_score"] < -2  # B shifted up -> A stochastically smaller


def test_cohens_kappa_known_values(spark):
    """Kappa on hand confusion matrices: perfect agreement -> 1.0;
    independent-looking labels near chance -> ~0; the degenerate
    all-same-label case (pe == 1) -> NULL."""
    from dbpedia_spotlight_spark.datapipe.expectations import cohens_kappa

    perfect = spark.createDataFrame(
        [(1, 1)] * 6 + [(0, 0)] * 4, "a int, b int"
    )
    r = cohens_kappa(perfect, "a", "b").collect()[0]
    assert r["kappa"] == 1.0 and r["po"] == 1.0

    # hand-checked: po = 0.7, pe = (40*40 + 60*60)/100^2 = 0.52,
    # kappa = (0.7 - 0.52)/0.48 = 0.375
    rows = (
        [(1, 1)] * 25 + [(1, 0)] * 15 + [(0, 1)] * 15 + [(0, 0)] * 45
    )
    r2 = cohens_kappa(
        spark.createDataFrame(rows, "a int, b int"), "a", "b"
    ).collect()[0]
    assert r2["po"] == 0.7 and r2["pe"] == 0.52
    assert r2["kappa"] == 0.375

    same = spark.createDataFrame([(1, 1)] * 5, "a int, b int")
    r3 = cohens_kappa(same, "a", "b").collect()[0]
    assert r3["kappa"] is None  # pe == 1: chance agreement is total


def test_tfidf_keywords_downweights_boilerplate(spark):
    """A term in every doc (boilerplate) loses to a doc-specific term
    with the same tf; ranks are per-doc, tie-broken by term."""
    from dbpedia_spotlight_spark.datapipe.textstats import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "common apple apple common common"),
            (2, "common banana banana common common"),
            (3, "common cherry cherry common common"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rank"]): r["term"]
        for r in tfidf_keywords(docs, k=2).collect()
    }
    # tf(common)=3 but df=3 -> idf=1+ln(4/4)=1 -> score 3;
    # tf(specific)=2, df=1 -> idf=1+ln(2) -> score ~3.39 wins
    assert out[(1, 1)] == "apple" and out[(1, 2)] == "common"
    assert out[(2, 1)] == "banana" and out[(3, 1)] == "cherry"


def test_absorption_probability_chain_semantics(spark):
    """Hand chain a -> b -> buy (deterministic transitions): within 1
    step only b converts; within 2 steps a does too; a state with no
    path to the target stays at 0; probabilities are monotone in k."""
    from dbpedia_spotlight_spark.datapipe.funnel import absorption_probability

    rows, eid = [], 0
    for uid in range(10):
        for j, t in enumerate(["a", "b", "buy"]):
            rows.append((eid, f"2024-01-01 00:0{j}:00", uid, t, 0.0))
            eid += 1
    # an isolated self-looping state with no route to buy
    for uid in range(100, 105):
        rows.append((eid, "2024-01-01 00:00:00", uid, "z", 0.0)); eid += 1
        rows.append((eid, "2024-01-01 00:01:00", uid, "z", 0.0)); eid += 1
    ev = _mk_events(spark, rows)

    p1 = {
        r["state"]: r["p_absorb"]
        for r in absorption_probability(ev, "buy", steps=1).collect()
    }
    assert p1["b"] == 1.0 and p1["a"] == 0.0 and p1["z"] == 0.0
    p2 = {
        r["state"]: r["p_absorb"]
        for r in absorption_probability(ev, "buy", steps=2).collect()
    }
    assert p2["a"] == 1.0 and p2["b"] == 1.0 and p2["z"] == 0.0


def test_k_suppress_null_quasi_values(spark):
    """r4 advisory: an under-k class whose quasi-identifier contains
    NULL must be suppressed too — the membership join is null-safe, so
    NULL-keyed rows match their class instead of passing unmasked."""
    from dbpedia_spotlight_spark.datapipe.pii import (
        k_anonymity_report,
        k_suppress,
    )

    rows = (
        [("DE", "M", i, "flu") for i in range(4)]
        + [(None, "F", 10, "flu")]
        + [(None, None, 11, "cold")]
    )
    df = spark.createDataFrame(
        rows, "country string, sex string, uid int, dx string"
    )
    sup = {r["uid"]: r for r in k_suppress(df, ["country", "sex"], k=3).collect()}
    assert len(sup) == 6
    # the big class passes through
    assert sup[0]["country"] == "DE" and sup[0]["sex"] == "M"
    # both NULL-keyed under-k rows are masked (previously leaked verbatim)
    for uid in (10, 11):
        assert sup[uid]["country"] == "*" and sup[uid]["sex"] == "*", sup[uid]
    # and the report counts exactly the same two violating classes
    rep = k_anonymity_report(df, ["country", "sex"], "dx", k=3).collect()
    n_violating_rows = sum(
        r["class_size"] for r in rep if not r["k_anonymous"]
    )
    n_masked = sum(1 for r in sup.values() if r["country"] == "*")
    assert n_violating_rows == n_masked == 2


def test_benford_profile_zero_count_digit_rows(spark):
    """r4 advisory: digits that never occur still emit a row with
    n_obs=0 and chi2_term = total*e — the missing-digit signal is the
    fabricated-data case the audit exists for."""
    import math

    from dbpedia_spotlight_spark.datapipe.expectations import (
        BENFORD_SHARES,
        benford_profile,
    )

    df = spark.createDataFrame([(1.0,)] * 30 + [(2.0,)] * 20, "v double")
    out = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    for d in range(3, 10):
        assert out[d]["n_obs"] == 0
        assert math.isclose(
            out[d]["chi2_term"], 50 * BENFORD_SHARES[d], rel_tol=1e-4
        ), (d, out[d])
    assert out[1]["n_obs"] == 30 and out[2]["n_obs"] == 20


def test_mmr_rerank_single_candidate_pool(spark):
    """r4 advisory: a pool with one candidate (no a!=b sims pair) must
    still return that candidate, relevance seeded from the pool rows."""
    from dbpedia_spotlight_spark.datapipe.similarity import mmr_rerank

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.8, 0.6])],
        "vec_id long, embedding array<double>",
    )
    out = mmr_rerank(emb, query_vec_id=0, k=2, pool_size=5).collect()
    assert len(out) == 1
    assert out[0]["cand_id"] == 1 and out[0]["round_idx"] == 0
