"""BPE tokenizer training / encoding (datapipe/bpe.py).

Reference vectors are hand-computed Sennrich BPE on tiny corpora; the
merge-application fold is additionally property-tested against a pure-
Python greedy merge on random symbol sequences (the overlap cases —
'a a a' under merge (a,a) — are exactly where naive implementations
diverge).
"""

import random

import pytest
from pyspark.sql import functions as F

from dbpedia_spotlight_spark.datapipe.bpe import (
    END_OF_WORD,
    _apply_merge,
    encode_words,
    learn_bpe,
    pair_counts,
    token_frequencies,
    word_frequencies,
)


def _py_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def test_word_frequencies_lowercase_letters_only(spark):
    docs = spark.createDataFrame(
        [("d1", "The cat, the CAT!"), ("d2", "cat9dog")],
        "doc_id string, text string",
    )
    got = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert got == {"the": 2, "cat": 3, "dog": 1}


def test_apply_merge_fold_matches_python_greedy(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(60):
        n = rng.randint(1, 8)
        rows.append(([rng.choice("ab") for _ in range(n)],))
    df = spark.createDataFrame(rows, "syms array<string>")
    got = [
        r["m"]
        for r in df.select(
            "syms", _apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    want = [_py_merge(r[0], "a", "a") for r in rows]
    assert got == want
    # the canonical overlap vector
    one = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    assert one.select(
        _apply_merge(F.col("syms"), "a", "a").alias("m")
    ).first()["m"] == ["aa", "a"]


def test_learn_bpe_sennrich_vector(spark):
    # classic toy corpus: low(5) lower(2) newest(6) widest(3)
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([("d", text)], "doc_id string, text string")
    merges, vocab = learn_bpe(docs, num_merges=4)
    # hand-derived: es(9) -> est(9) -> est</w>(9) -> lo(7)
    assert [(m[0], m[1]) for m in merges] == [
        ("e", "s"),
        ("es", "t"),
        ("est", END_OF_WORD),
        ("l", "o"),
    ]
    assert [m[2] for m in merges] == [9, 9, 9, 7]
    syms = {r["word"]: r["syms"] for r in vocab.collect()}
    assert syms["newest"] == ["n", "e", "w", "est" + END_OF_WORD]
    assert syms["low"] == ["lo", "w", END_OF_WORD]


def test_learn_bpe_deterministic_tie_break(spark):
    # every pair occurs exactly once -> lexicographically smallest wins
    docs = spark.createDataFrame(
        [("d", "zy xw")], "doc_id string, text string"
    )
    merges, _ = learn_bpe(docs, num_merges=1, min_count=1)
    assert (merges[0][0], merges[0][1]) == ("w", END_OF_WORD)


def test_learn_bpe_stops_below_min_count(spark):
    docs = spark.createDataFrame(
        [("d", "ab cd")], "doc_id string, text string"
    )
    merges, _ = learn_bpe(docs, num_merges=10, min_count=2)
    assert merges == []


def test_encode_and_token_frequencies(spark):
    text = " ".join(["low"] * 5 + ["newest"] * 6)
    docs = spark.createDataFrame([("d", text)], "doc_id string, text string")
    merges, _ = learn_bpe(docs, num_merges=3)
    words = spark.createDataFrame([("lowest",)], "word string")
    enc = encode_words(words, merges).first()["tokens"]
    # merges learned on low/newest apply to an unseen word
    assert "".join(enc).replace(END_OF_WORD, "") == "lowest"
    freqs = {
        r["token"]: r["n"]
        for r in token_frequencies(docs, merges).collect()
    }
    # every token count is freq-weighted: 'low' contributes 5 per token
    assert sum(n for n in freqs.values()) == 5 * len(
        encode_words(
            spark.createDataFrame([("low",)], "word string"), merges
        ).first()["tokens"]
    ) + 6 * len(
        encode_words(
            spark.createDataFrame([("newest",)], "word string"), merges
        ).first()["tokens"]
    )


def test_pair_counts_weighted(spark):
    vocab = spark.createDataFrame(
        [("ab", 3, ["a", "b"]), ("ba", 2, ["b", "a"]), ("a", 9, ["a"])],
        "word string, freq long, syms array<string>",
    )
    got = {(r["a"], r["b"]): r["cnt"] for r in pair_counts(vocab).collect()}
    assert got == {("a", "b"): 3, ("b", "a"): 2}
