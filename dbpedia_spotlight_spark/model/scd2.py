"""Slowly-changing-dimension (type 2) versioning for model dim tables —
the batch/temporal complement to streaming/model_updates.py's count merge.

The reference rebuilds its .mem stores from scratch per dump
(index/.../db/CreateSpotlightModel.scala); at 100 TB the model dims
(resources' support/prior, surface-form counts) instead evolve across
dump versions, and downstream consumers need as-of reads ("what was this
entity's prior when batch 7's annotations were produced?"). SCD2 keeps
every version with a validity interval:

  (key, attrs..., valid_from, valid_to, is_current)

`scd2_apply` merges one update batch: rows whose attributes actually
changed get their current version closed (valid_to = batch_id) and a new
open version appended; unchanged keys pass through untouched; new keys
open at the batch. Everything is one equi-join + column math — no
windows, no shuffle beyond the join, and the is_current partition keeps
the hot read path a metadata-pruned scan at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = 2**31 - 1  # valid_to sentinel for the current version


def scd2_init(dim: DataFrame, key: str, batch_id: int = 0) -> DataFrame:
    """Bootstrap a history table from a plain dim snapshot."""
    return dim.select(
        key,
        *[c for c in dim.columns if c != key],
        F.lit(batch_id).cast("int").alias("valid_from"),
        F.lit(OPEN_END).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    batch_id: int,
) -> DataFrame:
    """Merge `updates(key, attrs...)` into an SCD2 `history` at `batch_id`.

    Semantics (deterministic, set-based):
      - update with ANY attr differing from the key's current version ->
        close the current version (valid_to = batch_id, is_current=false)
        and append the new version (valid_from = batch_id, open-ended);
      - update identical to the current version -> no-op;
      - key absent from history -> new open version;
      - closed historical versions always pass through untouched.
    Updates must be unique per key (enforce upstream; the reference's
    uriCounts batches are)."""
    upd = updates.select(
        F.col(key), *[F.col(a).alias(f"_u_{a}") for a in attrs]
    )
    cur = history.filter(F.col("is_current"))
    closed = history.filter(~F.col("is_current"))
    matched = upd.select(key).distinct()
    cur_keyed = cur.join(matched, key, "left_semi")
    cur_unmatched = cur.join(matched, key, "left_anti")
    diff_vote = ~sum(
        (F.col(a).eqNullSafe(F.col(f"_u_{a}"))).cast("int") for a in attrs
    ).eqNullSafe(F.lit(len(attrs)))
    pending = cur_keyed.join(upd, key)
    to_close = pending.filter(diff_vote)
    unchanged = pending.filter(~diff_vote).select(*cur.columns)
    closed_now = to_close.select(
        key,
        *attrs,
        "valid_from",
        F.lit(batch_id).cast("int").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_versions = to_close.select(
        key,
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.lit(batch_id).cast("int").alias("valid_from"),
        F.lit(OPEN_END).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    brand_new = (
        upd.join(history.select(key).distinct(), key, "left_anti").select(
            key,
            *[F.col(f"_u_{a}").alias(a) for a in attrs],
            F.lit(batch_id).cast("int").alias("valid_from"),
            F.lit(OPEN_END).cast("int").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    cols = [key, *attrs, "valid_from", "valid_to", "is_current"]
    return (
        closed.select(*cols)
        .unionByName(cur_unmatched.select(*cols))
        .unionByName(unchanged.select(*cols))
        .unionByName(closed_now)
        .unionByName(new_versions)
        .unionByName(brand_new)
    )


def scd2_as_of(history: DataFrame, batch_id: int) -> DataFrame:
    """Dim snapshot as of `batch_id` (versions valid at that batch)."""
    return history.filter(
        (F.col("valid_from") <= batch_id) & (F.col("valid_to") > batch_id)
    ).drop("valid_to", "is_current")
