"""Within-document mention coreference by surface containment — the
high-precision heuristic layer between spotting and linking: a short
mention ("Obama", "the company") inherits the chain of the nearest
earlier mention whose surface form contains it as a whole-token
subsequence ("Barack Obama" -> "Obama"), so link decisions made on the
most informative mention propagate to its abbreviated repeats.

Reference context: the reference links every spot independently
(core/.../db/DBTwoStepDisambiguator.scala scores each occurrence in
isolation); document-level consistency only enters through shared
context vectors. Surface-containment chaining is the standard cheap
upgrade (the "shortcut" features of classic sieve coref, Raghunathan
et al. 2010 sieve 2) and is purely relational, so it belongs in the
engine rather than per-document code.

Scale shape: one self-join per document key (mention counts per doc are
bounded — hundreds, not corpus-scale), then a groupBy-argmax for the
nearest antecedent. Chain ids resolve by pointer doubling over the
single-parent antecedent forest: O(log chain-length) rounds, same
machinery as the redirect closure (operators/closure.py). All plain
column ops — token containment is contains() on space-padded strings,
no regex, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _padded(col) -> F.Column:
    return F.concat(F.lit(" "), col, F.lit(" "))


def coref_links(
    mentions: DataFrame,
    doc_col: str = "doc_id",
    pos_col: str = "pos",
    sf_col: str = "surface_form",
) -> DataFrame:
    """Link every mention to its nearest earlier same-document antecedent
    whose surface form token-contains this mention's surface form
    (equality included — exact repeats chain too).

    -> (doc_id, pos, surface_form, antecedent_pos, antecedent_sf);
    mentions with no antecedent are absent (they are chain roots).
    """
    a = mentions.select(
        F.col(doc_col).alias("doc_id"),
        F.col(pos_col).alias("_apos"),
        F.col(sf_col).alias("_asf"),
    )
    b = mentions.select(
        F.col(doc_col).alias("doc_id"),
        F.col(pos_col).alias("pos"),
        F.col(sf_col).alias("surface_form"),
    )
    pairs = b.join(a, "doc_id").filter(
        (F.col("_apos") < F.col("pos"))
        & _padded(F.col("_asf")).contains(_padded(F.col("surface_form")))
    )
    return pairs.groupBy("doc_id", "pos", "surface_form").agg(
        F.max("_apos").alias("antecedent_pos"),
        F.max_by("_asf", "_apos").alias("antecedent_sf"),
    )


def coref_chain_ids(
    mentions: DataFrame,
    links: DataFrame,
    doc_col: str = "doc_id",
    pos_col: str = "pos",
    max_iterations: int = 16,
) -> DataFrame:
    """Resolve each mention to its chain id — the position of the chain's
    ROOT mention (the earliest one, which has no antecedent). Pointer
    doubling over the antecedent forest: parent[m] <- parent[parent[m]]
    until fixpoint, O(log chain) join rounds; roots map to themselves.
    -> (doc_id, pos, chain_id)."""
    base = mentions.select(
        F.col(doc_col).alias("doc_id"), F.col(pos_col).alias("pos")
    ).distinct()
    parent = base.join(
        links.select("doc_id", "pos", "antecedent_pos"),
        ["doc_id", "pos"],
        "left",
    ).select(
        "doc_id",
        "pos",
        F.coalesce(F.col("antecedent_pos"), F.col("pos")).alias("chain_id"),
    )
    for _ in range(max_iterations):
        stepped = (
            parent.alias("x")
            .join(
                parent.select(
                    F.col("doc_id").alias("doc_id"),
                    F.col("pos").alias("_p"),
                    F.col("chain_id").alias("_g"),
                ).alias("y"),
                (F.col("x.doc_id") == F.col("y.doc_id"))
                & (F.col("x.chain_id") == F.col("y._p")),
            )
            .select(
                F.col("x.doc_id").alias("doc_id"),
                F.col("x.pos").alias("pos"),
                F.col("y._g").alias("chain_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            stepped.alias("n")
            .join(parent.alias("o"), ["doc_id", "pos"])
            .filter(F.col("n.chain_id") != F.col("o.chain_id"))
            .limit(1)
            .count()
        )
        parent = stepped
        if changed == 0:
            break
    return parent
