"""BPE (byte-pair-encoding) subword-merge training over a corpus — the
tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016),
as a driver-coordinated loop of DataFrame aggregations (the same iterative
shape as the PageRank loop in operators/graph.py).

Representation: each word's segmentation is one string
``' ' + '  '.join(symbols) + ' '`` — symbols separated by TWO spaces, one
space of outer padding. A merge of pair (x, y) is then the literal
replacement ``' x  y ' -> ' xy '``:

  - every match is token-aligned (the pattern's single-space boundaries
    can only land in inter-token gaps, and tokens contain no spaces), so
    a pair like (x, y) can never match inside a longer token ``yb``;
  - left-to-right non-overlapping replace() == greedy BPE merge order
    (``a a a`` merges once, ``a b a b`` merges twice);
  - the replacement restores the two-space invariant, so K merges chain
    as K literal replaces — identical semantics in Spark and ANSI SQL,
    which is what makes the whole training loop oracle-checkable.

Per iteration: adjacent-pair counts (posexplode + arrays_zip, map-side
partial agg), one driver-side top-1 collect (max count, lexicographic
tie-break), one literal replace over the words table. The words table is
word-level (corpus vocabulary, not corpus tokens), so iterations run on
|V| rows regardless of corpus size; only the initial word count touches
the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """documents -> (word, cnt) over lowercase whitespace words."""
    return (
        documents.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_segmentation(words: DataFrame) -> DataFrame:
    """(word, cnt) -> + s = ' c1  c2  ...  cn ' (per-character symbols)."""
    return words.withColumn(
        "s",
        F.concat(
            F.lit(" "),
            # 'abc' -> 'a  b  c  ' -> trim trailing gap below
            F.expr("rtrim(regexp_replace(word, '(.)', '$1  '))"),
            F.lit(" "),
        ),
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count -> (pair, c)."""
    toks = F.split(F.trim(F.col("s")), "  ")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("x"),
        F.slice(toks, 2, n - 1).alias("y"),
    )
    return (
        seg.filter(n >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .select(
            F.concat_ws("  ", F.col("p.x"), F.col("p.y")).alias("pair"),
            "cnt",
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("c"))
    )


def train_bpe(
    words: DataFrame, num_merges: int
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Learn `num_merges` BPE merges from (word, cnt).

    Returns (merges, segmented) where merges = [(rank, 'x  y', freq)] in
    learned order and segmented = (word, cnt, seg) with seg the final
    double-space-joined symbol string. Deterministic: top pair by
    (count desc, pair asc)."""
    seg = _initial_segmentation(words).persist()
    merges: list[tuple[int, str, int]] = []
    for rank in range(num_merges):
        top = (
            _pair_counts(seg)
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, freq = top[0]["pair"], int(top[0]["c"])
        merges.append((rank, pair, freq))
        merged = pair.replace("  ", "")
        nxt = seg.withColumn(
            "s",
            F.replace(
                F.col("s"), F.lit(f" {pair} "), F.lit(f" {merged} ")
            ),
        ).persist()
        nxt.count()  # materialize before dropping the parent cache
        seg.unpersist()
        seg = nxt
    out = seg.select(
        "word", "cnt", F.trim(F.col("s")).alias("seg")
    )
    return merges, out


def apply_bpe(
    words: DataFrame, merges: list[tuple[int, str, int]]
) -> DataFrame:
    """Apply learned merges (in rank order) to new (word, ...) rows ->
    + seg column. Pure chained literal replaces — codegen end to end."""
    seg = _initial_segmentation(words)
    col = F.col("s")
    for _rank, pair, _freq in merges:
        col = F.replace(
            col, F.lit(f" {pair} "), F.lit(f" {pair.replace('  ', '')} ")
        )
    return seg.withColumn("seg", F.trim(col)).drop("s")
