"""Temporal (interval-versioned) knowledge base: change-log folding and
as-of snapshot queries.

A KB built continuously from a document stream (the north rule's
10^12-doc corpus is re-crawled, not static) needs facts with validity
intervals: when a page's infobox changes, the old fact closes and the
new one opens. The reference models a single static snapshot (its model
tables are rebuilt from each dump — index/.../CreateSpotlightModel.scala);
this module adds the standard bitemporal-lite layer (SCD2 applied to
triples, the same shape as datapipe's scd2_resources for dimension rows)
so downstream queries can ask "what did the KB say at T".

Scale shape: interval derivation is one window lead() per (subj, pred)
partition — no join, no shuffle beyond the window's hash partition on
the fact key; as-of and diff are pushed-down range filters over the
interval columns (partition-prunable when the table is written
partitioned by months(valid_from) in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fold_changelog(
    changes: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    ts: str = "ts",
) -> DataFrame:
    """Fold a fact change log (subj, pred, obj, ts) — "at ts, (subj,pred)
    became obj" — into interval-versioned facts (subj, pred, obj,
    valid_from, valid_to), valid_to null for the current version.

    Consecutive assertions of the SAME obj collapse into one interval
    (re-crawls that observe no change must not fragment validity).
    One window pass per fact key: lag() drops no-op re-assertions,
    lead() closes each version at the next version's start.
    """
    key = Window.partitionBy("subj", "pred").orderBy("_ts")
    deduped = (
        changes.select(
            F.col(subj).alias("subj"),
            F.col(pred).alias("pred"),
            F.col(obj).alias("obj"),
            F.col(ts).alias("_ts"),
        )
        .withColumn("_prev", F.lag("obj").over(key))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("obj")))
        .drop("_prev")
    )
    nxt = Window.partitionBy("subj", "pred").orderBy("_ts")
    return deduped.select(
        "subj",
        "pred",
        "obj",
        F.col("_ts").alias("valid_from"),
        F.lead("_ts").over(nxt).alias("valid_to"),
    )


def kb_as_of(versioned: DataFrame, at) -> DataFrame:
    """Snapshot the interval-versioned KB at time ``at``: facts with
    valid_from <= at < valid_to (open-ended current versions match any
    future at). Pure filter — pushes to the scan, prunes interval
    partitions."""
    t = F.lit(at).cast("timestamp")
    return versioned.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("subj", "pred", "obj")


def kb_changes_between(versioned: DataFrame, start, end) -> DataFrame:
    """Facts whose validity STATE differs between the two instants —
    the KB delta an incremental consumer must apply to move a snapshot
    from ``start`` to ``end``: op='add' for facts valid at end but not
    start, op='del' for the reverse. Two as-of filters + one full outer
    join on the fact; equivalent to kb_diff(as_of(start), as_of(end))
    but in one pass over the version table."""
    a = kb_as_of(versioned, start).withColumn("_a", F.lit(1))
    b = kb_as_of(versioned, end).withColumn("_b", F.lit(1))
    j = a.join(b, ["subj", "pred", "obj"], "full_outer")
    return (
        j.filter(F.col("_a").isNull() | F.col("_b").isNull())
        .select(
            "subj",
            "pred",
            "obj",
            F.when(F.col("_a").isNull(), F.lit("add"))
            .otherwise(F.lit("del"))
            .alias("op"),
        )
    )
