"""Unit tests: normalization + URI cleanup (SURVEY.md §5.1)."""

from pyspark.sql import functions as F

from dbpedia_spotlight_spark.functions.text import (
    normalize_surface_form_col,
    normalize_surface_form_py,
    normalize_text_col,
    wiki_clean_uri_col,
    wiki_clean_uri_py,
)


def test_normalize_surface_form_py():
    # ref MemorySurfaceFormStore.scala:40-41 examples
    assert normalize_surface_form_py("The Beatles") == "/beatles"
    assert normalize_surface_form_py("Big-Apple") == "/big apple"
    assert normalize_surface_form_py("An apple a day") == "/apple day"
    assert normalize_surface_form_py("U.S.A.") == "/u s"  # 'a' is a stopword


def test_normalize_col_matches_py(spark):
    cases = ["The Beatles", "Big-Apple", "An apple a day", "U.S.A.",
             "apple", "  padded  ", "A", "big  apple"]
    df = spark.createDataFrame([(c,) for c in cases], "sf string")
    got = df.select("sf", normalize_surface_form_col(F.col("sf")).alias("n")).collect()
    for row in got:
        assert row["n"] == normalize_surface_form_py(row["sf"]), row["sf"]


def test_normalize_text(spark):
    df = spark.createDataFrame([("don’t",)], "t string")
    assert df.select(normalize_text_col(F.col("t"))).first()[0] == "don't"


def test_wiki_clean_uri(spark):
    cases = ["Apple#History", "New%20York", "Big Apple"]
    df = spark.createDataFrame([(c,) for c in cases], "u string")
    got = [r[0] for r in df.select(wiki_clean_uri_col(F.col("u"))).collect()]
    assert got == [wiki_clean_uri_py(c) for c in cases]
    assert got == ["Apple", "New_York", "Big_Apple"]


def test_reference_tsv_fixture_parity(spark, tmp_path):
    """Lines taken verbatim from the reference's own test corpus
    (core/src/test/.../AnnotatedTextSourceTest.scala:35,44 — the de-facto
    golden 5-col format): field mapping and the repeats->one-paragraph
    grouping must match AnnotatedTextSource.fromOccurrencesString."""
    from dbpedia_spotlight_spark.io.sources import read_annotated_tsv

    rep = (
        "Frankfort-pl16\tFrankfort_%28village%29,_New_York\tFrankfort\t"
        "Frankfort (village), New York, within the town of Frankfort\t0\n"
    )
    occ = (
        "Terra_Vibe_Park-p10l10\tMarilyn_Manson\tMarilyn Manson\t"
        "Iron Maiden Black Sabbath Velvet Revolver Marilyn Manson\t32\n"
    )
    p = tmp_path / "occs.tsv"
    p.write_text(rep * 5 + occ)
    df = read_annotated_tsv(spark, str(p))
    rows = df.collect()
    assert len(rows) == 6
    # repeats: 5 identical texts -> one paragraph id (ref `repeats` test)
    paras = {r["paragraph_id"] for r in rows if r["surface_form"] == "Frankfort"}
    assert len(paras) == 1
    # field mapping incl. URL-encoded URI carried through untouched
    m = next(r for r in rows if r["occ_id"] == "Terra_Vibe_Park-p10l10")
    assert m["uri"] == "Marilyn_Manson" and m["offset"] == 32
    assert m["text"].startswith("Iron Maiden")
    fr = next(r for r in rows if r["surface_form"] == "Frankfort")
    assert fr["uri"] == "Frankfort_%28village%29,_New_York"
    # distinct paragraphs overall: 2
    assert len({r["paragraph_id"] for r in rows}) == 2


def test_bm25_hand_computed(spark):
    """BM25 against hand-computed scores on a 3-doc corpus (k1=1.2, b=0.75,
    Lucene idf form ln(1 + (N-df+0.5)/(df+0.5))); duplicate query terms
    count once; ties break by doc_id."""
    import math

    from dbpedia_spotlight_spark.operators.bm25 import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across the cluster"),
            (2, "spark spark spark caching"),
            (3, "duckdb runs on one node"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(0, "spark"), (0, "spark"), (0, "node")], "query_id long, term string"
    )
    got = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in bm25_scores(docs, qs, k=10).collect()
    }

    def idf(df):
        return math.log(1 + (3 - df + 0.5) / (df + 0.5))

    def w(tf, dl, avgdl, k1=1.2, b=0.75):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    avgdl = (6 + 4 + 5) / 3
    exp1 = idf(2) * w(1, 6, avgdl)            # doc1: spark once
    exp2 = idf(2) * w(3, 4, avgdl)            # doc2: spark three times
    exp3 = idf(1) * w(1, 5, avgdl)            # doc3: node once
    assert abs(got[1][0] - exp1) < 1e-9
    assert abs(got[2][0] - exp2) < 1e-9
    assert abs(got[3][0] - exp3) < 1e-9
    # rare-term idf (node, df=1) outranks saturated tf on a common term
    assert [d for d, (_s, r) in sorted(got.items(), key=lambda kv: kv[1][1])] == [
        3, 2, 1,
    ]


def test_bpe_train_matches_reference(spark):
    """train_bpe == the Sennrich reference algorithm (greedy left-to-right
    merges, count-desc / pair-asc tie-break) on merges AND final
    segmentations; apply_bpe replays learned merges identically."""
    import collections

    from dbpedia_spotlight_spark.functions.bpe import (
        apply_bpe,
        train_bpe,
        word_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low low low lower lower newest newest newest"),
            (2, "newest newest newest widest widest widest aaa abab abab"),
        ],
        "doc_id long, text string",
    )
    words = word_counts(docs)
    merges, seg = train_bpe(words, 6)

    def ref_bpe(wc, k):
        vocab = {tuple(w): c for w, c in wc.items()}
        out, segs = [], {}
        for r in range(k):
            pairs = collections.Counter()
            for w, c in vocab.items():
                for i in range(len(w) - 1):
                    pairs[(w[i], w[i + 1])] += c
            if not pairs:
                break
            bestc = max(pairs.values())
            bp = tuple(
                sorted(
                    "  ".join(p) for p, c in pairs.items() if c == bestc
                )[0].split("  ")
            )
            out.append((r, "  ".join(bp), bestc))
            new = {}
            for w, c in vocab.items():
                i, neww = 0, []
                while i < len(w):
                    if i < len(w) - 1 and (w[i], w[i + 1]) == bp:
                        neww.append(w[i] + w[i + 1])
                        i += 2
                    else:
                        neww.append(w[i])
                        i += 1
                new[tuple(neww)] = new.get(tuple(neww), 0) + c
            vocab = new
        for w, _c in vocab.items():
            segs["".join(w)] = "  ".join(w)
        return out, segs

    wc = {r["word"]: r["cnt"] for r in words.collect()}
    ref_merges, ref_segs = ref_bpe(wc, 6)
    assert merges == ref_merges
    got_segs = {r["word"]: r["seg"] for r in seg.collect()}
    assert got_segs == ref_segs

    # apply_bpe replays the same merges on the same words
    replayed = {r["word"]: r["seg"] for r in apply_bpe(words, merges).collect()}
    assert replayed == got_segs
    # the overlap case: 'aaa' merges left-to-right once under pair (a, a)
    if ("a  a" in [m[1] for m in merges]):
        assert got_segs["aaa"].startswith("aa")


def test_ngram_doc_logprob_hand_checked(spark):
    """Trigram add-k scoring against hand-computed probabilities, plus
    the unseen-gram smoothing floor and the too-short-doc exclusion."""
    import math

    from dbpedia_spotlight_spark.datapipe.textstats import ngram_doc_logprob

    corpus = spark.createDataFrame(
        [("d1", "a b a b a"), ("d2", "a b")], "doc_id string, text string"
    )
    rows = {
        r.doc_id: r
        for r in ngram_doc_logprob(corpus, order=3, k=0.5).collect()
    }
    # d2 has < 3 words -> absent
    assert set(rows) == {"d1"}
    # grams: "a b a" x2, "b a b" x1; ctx: "a b"->2, "b a"->1; V=2
    expected = (
        2 * math.log((2 + 0.5) / (2 + 0.5 * 2))
        + 1 * math.log((1 + 0.5) / (1 + 0.5 * 2))
    ) / 3
    assert rows["d1"].n_grams == 3
    assert abs(rows["d1"].logprob - expected) < 1e-9
    assert abs(rows["d1"].perplexity - math.exp(-expected)) < 1e-9

    # unseen gram AND unseen context under a foreign model -> floor
    # ln(k / (k*V)) = ln(1/V)
    foreign = spark.createDataFrame([("x", "b b b")], "doc_id string, text string")
    got = ngram_doc_logprob(foreign, order=3, k=0.5, model_corpus=corpus).collect()
    assert len(got) == 1
    assert abs(got[0].logprob - math.log(0.5 / (0.5 * 2))) < 1e-9


def test_word_dropout_deterministic_ordered(spark):
    import pytest

    from dbpedia_spotlight_spark.datapipe.textstats import word_dropout

    d = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id int, text string",
    )
    r1 = word_dropout(d, 0.3).collect()[0]
    r2 = word_dropout(d, 0.3).collect()[0]
    assert r1.text == r2.text and r1.n_dropped > 0
    # surviving tokens keep original order (subsequence of the input)
    orig = "the quick brown fox jumps over the lazy dog".split()
    kept = r1.text.split()
    it = iter(orig)
    assert all(any(tok == o for o in it) for tok in kept)
    r0 = word_dropout(d, 0.0).collect()[0]
    assert r0.n_dropped == 0 and r0.text == " ".join(orig)
    with pytest.raises(ValueError):
        word_dropout(d, 1.0)


def test_textrank_summaries_central_sentences(spark):
    from dbpedia_spotlight_spark.datapipe.textstats import textrank_summaries

    d = spark.createDataFrame(
        [(1, "the cat sat on the mat. the cat ate food. dogs bark loudly. "
             "the mat was red. unrelated words entirely here"),
         (2, "single sentence only")],
        "doc_id int, text string",
    )
    out = textrank_summaries(d, top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: the overlapping cat/mat sentences outrank the isolated one
    top = sorted(by_doc[1], key=lambda r: r.rank)
    assert top[0].sentence == "the cat sat on the mat"
    assert all("unrelated" not in r.sentence for r in top)
    # single-sentence doc: that sentence, base (1-d) mass only
    assert by_doc[2][0].sentence == "single sentence only"
    assert by_doc[2][0].score == 0.15
    # deterministic across runs (integer fixed point)
    again = {(r.doc_id, r.sid, r.score) for r in textrank_summaries(d, top_k=2).collect()}
    assert again == {(r.doc_id, r.sid, r.score) for r in out}


def test_feature_hash_signed_collisions(spark):
    import pytest

    from dbpedia_spotlight_spark.datapipe.textstats import feature_hash

    d = spark.createDataFrame(
        [(1, "a b a c"), (2, "a")], "doc_id int, text string"
    )
    got = {r.doc_id: (list(r.indices), list(r.values)) for r in feature_hash(d, dim=16).collect()}
    # doc 1: 'a' twice -> |value| 2 at a's index; indices sorted
    idx1, val1 = got[1]
    assert idx1 == sorted(idx1) and len(idx1) == len(set(idx1))
    assert 2.0 in [abs(v) for v in val1]
    # same token, same index/sign across docs
    idx2, val2 = got[2]
    a_idx = idx2[0]
    a_val = val2[0]
    assert a_idx in idx1 and val1[idx1.index(a_idx)] == 2 * a_val
    # deterministic
    assert got == {r.doc_id: (list(r.indices), list(r.values)) for r in feature_hash(d, dim=16).collect()}
    with pytest.raises(ValueError):
        feature_hash(d, dim=1)


def test_surface_ambiguity_entropy(spark):
    import math

    from dbpedia_spotlight_spark.operators.auxstats import surface_ambiguity

    p = spark.createDataFrame(
        [("paris", "P_city", 90), ("paris", "P_person", 10), ("berlin", "B", 50)],
        "surface_form string, uri string, pair_count long",
    )
    got = {r.surface_form: r for r in surface_ambiguity(p).collect()}
    assert got["berlin"].entropy == 0.0 and got["berlin"].top_prior == 1.0
    h = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1))
    assert got["paris"].entropy == round(h, 6)
    assert got["paris"].n_senses == 2 and got["paris"].top_prior == 0.9


def test_ngram_novelty_first_owner(spark):
    from dbpedia_spotlight_spark.datapipe.textstats import ngram_novelty

    d = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, "a b c d"), (4, "z")],
        "doc_id int, text string",
    )
    got = {r.doc_id: (r.n_ngrams, r.n_new, r.novelty) for r in ngram_novelty(d, n=3).collect()}
    assert got[1] == (2, 2, 1.0)       # everything new
    assert got[2] == (2, 1, 0.5)       # 'a b c' seen, 'b c x' new
    assert got[3] == (2, 0, 0.0)       # pure re-crawl
    assert got[4] == (1, 1, 1.0)       # short doc: whole text one gram


def test_hilbert_key_bijection_adjacency_and_reference(spark):
    """with_hilbert_key on the full 16x16 grid (bits=4): (1) keys are a
    bijection onto 0..255; (2) consecutive keys are grid-ADJACENT
    (manhattan distance exactly 1) — the defining Hilbert property
    Morton keys lack; (3) exact parity with the classic xy2d reference
    implementation."""
    import pyspark.sql.functions as F

    from dbpedia_spotlight_spark.functions.zorder import with_hilbert_key

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = n - 1 - x
                    y = n - 1 - y
                x, y = y, x
            s //= 2
        return d

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x int, y int"
    )
    rows = with_hilbert_key(grid, "x", "y", bits=4).collect()
    keys = sorted(r["hilbert_key"] for r in rows)
    assert keys == list(range(256))
    by_key = {r["hilbert_key"]: (r["x"], r["y"]) for r in rows}
    for d in range(255):
        (x1, y1), (x2, y2) = by_key[d], by_key[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_key[d], by_key[d + 1])
    for r in rows:
        assert r["hilbert_key"] == xy2d(16, r["x"], r["y"])
