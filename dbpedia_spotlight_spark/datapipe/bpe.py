"""Distributed byte-pair-encoding tokenizer training and application.

The missing piece between the engine's token-count *estimate*
(textstats.bpe_ish_token_count) and a real trainable subword vocabulary:
learn BPE merges over the corpus the Sennrich way (iterative most-frequent
adjacent-pair merging over a word-frequency table), then encode text with
the learned merge list. Reference analogue: the Spotlight model build's
token-store construction (index/.../CreateSpotlightModel.scala builds a
token vocabulary once and reuses it per annotation); here the vocabulary
itself is learned from data, the way an LLM-pipeline tokenizer is.

Spark-first scale design:

- All heavy work happens on the WORD-FREQUENCY table, never the corpus:
  `groupBy(word)` first collapses a 100 TB corpus to a ~10^7-row vocab
  (Heaps' law), and every merge round is a pair-explode + map-side-
  combinable groupBy over that vocab table only.
- One scalar `collect()` per merge round (the argmax pair — a single
  row, the same bounded-driver pattern as candidates.py's head-id cap).
- Greedy left-to-right merge application is a pure `F.aggregate` fold
  over the symbol array — JVM-side, zero UDF. The fold IS the classic
  non-overlapping left-to-right BPE replace: merging (a,b) appends each
  symbol unless the accumulator tail is `a` and the incoming symbol is
  `b`, in which case the tail becomes `a||b`; a freshly merged tail can
  never re-merge in the same round because `a||b != a` (symbols are
  nonempty).
- Lineage is truncated with `localCheckpoint` every few rounds (each
  round adds one fold to the plan; 50+ merges would otherwise build a
  50-deep expression tree). At production scale, checkpoint the vocab
  to the model's Iceberg/parquet tables instead.
- Encoding new text is vocab-side too: apply the merge list to the
  DISTINCT words of the input, then broadcast-join the word->tokens map
  back onto the corpus — the corpus-side cost is one regexp tokenize
  plus one broadcast join, no per-document Python.

Word model: lowercase `[a-z]+` word extraction, each word's symbol
sequence is its characters plus a terminal `</w>` end-of-word symbol
(Sennrich §3.2), so merges never cross word boundaries and a merged
symbol reaching `</w>` becomes a full-word token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-wide pass.

    Lowercased `[a-z]+` words only: keeps the symbol alphabet closed
    (26 letters + </w>), which the merge/encode algebra relies on.
    Map-side combinable groupBy; output cardinality is the vocabulary,
    not the corpus.
    """
    words = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _initial_symbols(word: Column) -> Column:
    """word -> array of single-char symbols + terminal </w>."""
    return F.concat(
        F.split(word, ""), F.array(F.lit(END_OF_WORD))
    )


def _pair_structs(syms: Column) -> Column:
    """Array of adjacent-pair structs (a, b) from a symbol array —
    zip_with of the two offset slices, empty for 1-symbol words."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a||b as a pure
    JVM-side fold (see module docstring for why the fold is exactly the
    non-overlapping BPE replace)."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt) adjacent-symbol pair frequencies, freq-weighted.
    vocab: (word, freq, syms)."""
    return (
        vocab.select("freq", F.explode(_pair_structs(F.col("syms"))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def learn_bpe(
    vocab_or_docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn `num_merges` BPE merges; returns (merges, final vocab).

    merges: [(left, right, pair_count)] in learned order, ties broken
    deterministically by (count DESC, left ASC, right ASC) so the same
    corpus always yields the same merge table on any cluster size.
    Final vocab: (word, freq, syms) with all merges applied.

    Accepts either a raw documents DataFrame (any column set including
    `text_col`) or a prebuilt (word, freq) table.
    """
    cols = set(vocab_or_docs.columns)
    if {"word", "freq"} <= cols:
        wf = vocab_or_docs.select("word", "freq")
    else:
        wf = word_frequencies(vocab_or_docs, text_col)
    vocab = wf.select(
        "word", "freq", _initial_symbols(F.col("word")).alias("syms")
    ).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for r in range(num_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = vocab.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab


def encode_words(
    words: DataFrame, merges: list[tuple[str, str, int]] | list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge list (in order) to a (word, ...) table;
    adds `tokens: array<string>`. Vocab-side: call on DISTINCT words and
    broadcast-join the result back onto the corpus."""
    syms = _initial_symbols(F.col("word"))
    for m in merges:
        syms = _apply_merge(syms, m[0], m[1])
    return words.withColumn("tokens", syms)


def token_frequencies(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """(token, n) corpus token frequencies under the learned merges —
    the encode path folded with the word-frequency reduction: encode the
    vocab once, weight each word's tokens by the word's corpus freq."""
    wf = word_frequencies(docs, text_col)
    enc = encode_words(wf, merges)
    return (
        enc.select("freq", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("n"))
    )
