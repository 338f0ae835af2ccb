"""Spot selectors — P13 in SURVEY.md §2.2: filters pruning the spot list
before disambiguation. All plain relational ops.

Reference:
  - NonCommonWordSelector (core/src/main/scala/org/dbpedia/spotlight/spot/
    NonCommonWordSelector.scala:23-70): drop single common words
    (`isCommonWord` :60-62 — lowercase membership in a frequency list).
  - ShortSurfaceFormSelector (core/.../spot/ShortSurfaceFormSelector.scala):
    drop spots shorter than a minimum length (3 chars in the reference).
  - SurfaceFormWhitelistSelector (core/.../spot/SurfaceFormWhitelistSelector.scala):
    keep only whitelisted surface forms.
  - AtLeastOneNounSelector (core/.../spot/AtLeastOneNounSelector.scala):
    keep spots containing >=1 noun-tagged token; POS comes from a tagger
    the reference configures (OpenNLP) — here the caller supplies a
    `pos_tags array<string>` column (any tagger; tests inject one).
  - ChainedSelector (core/.../spot/ChainedSelector.scala): apply in sequence.
  - RandomSelector (core/src/main/java/org/dbpedia/spotlight/spot/
    RandomSelector.java): random subset baseline.
  - Common-words source: WortschatzParser
    (core/.../io/WortschatzParser.scala) — a (word, count) TSV; any
    (word) DataFrame works here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_SURFACE_FORM_LENGTH = 3


def non_common_word_selector(spots: DataFrame, common_words: DataFrame) -> DataFrame:
    """Drop single-word spots whose lowercase form is a common word."""
    cw = F.broadcast(
        common_words.select(
            F.lower(F.col(common_words.columns[0])).alias("_cw")
        ).distinct()
    )
    single = ~F.col("surface_form").contains(" ")
    joined = spots.join(
        cw, F.lower(F.col("surface_form")) == F.col("_cw"), "left"
    )
    return joined.filter(~(single & F.col("_cw").isNotNull())).drop("_cw")


def short_surface_form_selector(
    spots: DataFrame, min_length: int = MIN_SURFACE_FORM_LENGTH
) -> DataFrame:
    return spots.filter(F.length("surface_form") >= F.lit(min_length))


def surface_form_whitelist_selector(
    spots: DataFrame, whitelist: DataFrame
) -> DataFrame:
    wl = whitelist.select(
        F.col(whitelist.columns[0]).alias("surface_form")
    ).distinct()
    return spots.join(F.broadcast(wl), "surface_form", "left_semi")


def at_least_one_noun_selector(
    spots: DataFrame, pos_col: str = "pos_tags"
) -> DataFrame:
    """Keep spots whose POS array contains a noun tag (N*). The caller
    attaches `pos_tags`; spots without the column raise early."""
    if pos_col not in spots.columns:
        raise ValueError(
            f"at_least_one_noun_selector needs a '{pos_col}' array<string> "
            "column (attach POS tags from any tagger first)"
        )
    return spots.filter(
        F.exists(F.col(pos_col), lambda t: t.startswith("N"))
    )


def random_selector(spots: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return spots.sample(fraction=fraction, seed=seed)


def chained_selector(spots: DataFrame, selectors: list) -> DataFrame:
    """selectors: list of callables DataFrame -> DataFrame, applied in order
    (ref ChainedSelector.scala — list semantics)."""
    out = spots
    for sel in selectors:
        out = sel(out)
    return out
