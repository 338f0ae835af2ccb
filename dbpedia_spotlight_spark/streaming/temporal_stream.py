"""Streaming SCD2: fold a fact-change STREAM into the interval-versioned
KB incrementally — the continuous-ingest twin of
operators/temporal.py:fold_changelog (which assumes the whole change log
in one table). A re-crawled corpus emits (subj, pred, obj, ts) change
events forever; replaying full history per micro-batch is O(history) —
this module keeps the standard two-table SCD2 layout instead:

    closed/  (subj, pred, obj, valid_from, valid_to)   immutable
    open/    (subj, pred, obj, valid_from)             current versions

and each micro-batch touches ONLY the keys it mentions: the open rows
for touched (subj, pred) keys are replayed as pseudo-changes together
with the batch through the same one-window fold (no-op re-assertions
collapse exactly as in the batch operator), then all-but-last land in
closed/ and the last version replaces the key's open row. Work per
batch ∝ batch keys, never history.

Exactly-once: same versioned-directory + _CURRENT commit protocol as
kg_ingest.py — a replayed batch id short-circuits, and a crash between
write and commit leaves the previous version current. The pytest gate
proves stream-fold == batch-fold on the same log split across batches.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGE_SCHEMA = (
    "subj string, pred string, obj string, ts timestamp"
)
_VERSIONS = "versions"
_CURRENT = "_CURRENT"


def _current_version(kb_dir: str) -> str | None:
    p = os.path.join(kb_dir, _CURRENT)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return fh.read().strip() or None


def _last_applied_batch(kb_dir: str) -> int:
    v = _current_version(kb_dir)
    return int(v[1:]) if v else -1


def _commit_version(kb_dir: str, version: str) -> None:
    tmp = os.path.join(kb_dir, _CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(kb_dir, _CURRENT))


def load_intervals(
    spark: SparkSession, kb_dir: str, table: str
) -> DataFrame:
    """Read closed/ or open/ from the current committed version; empty
    frame with the right schema before the first commit."""
    v = _current_version(kb_dir)
    cols = "subj string, pred string, obj string, valid_from timestamp"
    if table == "closed":
        cols += ", valid_to timestamp"
    if v is None:
        return spark.createDataFrame([], cols)
    return spark.read.parquet(os.path.join(kb_dir, _VERSIONS, v, table))


def apply_changelog_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    kb_dir: str,
) -> None:
    """Fold one micro-batch of (subj, pred, obj, ts) changes into the
    two-table SCD2 layout. Idempotent per batch id."""
    if batch_id <= _last_applied_batch(kb_dir):
        return
    from ..operators.temporal import fold_changelog

    os.makedirs(os.path.join(kb_dir, _VERSIONS), exist_ok=True)
    closed = load_intervals(spark, kb_dir, "closed")
    opened = load_intervals(spark, kb_dir, "open")

    batch = batch_df.select("subj", "pred", "obj", "ts").distinct()
    # Late-event contract: an event older than its key's OPEN interval
    # would overlap intervals already closed in earlier batches —
    # rewriting committed history. Those are beyond the supported
    # disorder (the same role a watermark plays for windowed aggs) and
    # are dropped here; events within the open interval reorder fine
    # because the whole open version is replayed through the fold.
    batch = (
        batch.join(
            opened.select(
                "subj", "pred", F.col("valid_from").alias("_open_from")
            ),
            ["subj", "pred"],
            "left",
        )
        .filter(
            F.col("_open_from").isNull()
            | (F.col("ts") >= F.col("_open_from"))
        )
        .drop("_open_from")
    )
    touched = batch.select("subj", "pred").distinct()
    open_touched = opened.join(touched, ["subj", "pred"], "left_semi")
    open_rest = opened.join(touched, ["subj", "pred"], "left_anti")

    replay = open_touched.select(
        "subj", "pred", "obj", F.col("valid_from").alias("ts")
    ).unionByName(batch)
    folded = fold_changelog(replay).localCheckpoint()

    new_closed = closed.unionByName(
        folded.filter(F.col("valid_to").isNotNull())
    )
    new_open = open_rest.unionByName(
        folded.filter(F.col("valid_to").isNull()).select(
            "subj", "pred", "obj", "valid_from"
        )
    )

    version = f"v{batch_id:012d}"
    vdir = os.path.join(kb_dir, _VERSIONS, version)
    if os.path.exists(vdir):
        shutil.rmtree(vdir)
    new_closed.write.parquet(os.path.join(vdir, "closed"))
    new_open.write.parquet(os.path.join(vdir, "open"))
    _commit_version(kb_dir, version)


def current_intervals(spark: SparkSession, kb_dir: str) -> DataFrame:
    """The full interval table (closed ∪ open-with-null-valid_to) of the
    committed version — the exact shape fold_changelog returns, so
    kb_as_of / kb_changes_between run on it unchanged."""
    closed = load_intervals(spark, kb_dir, "closed")
    opened = load_intervals(spark, kb_dir, "open").withColumn(
        "valid_to", F.lit(None).cast("timestamp")
    )
    return closed.unionByName(opened)


def run_changelog_stream(
    spark: SparkSession,
    input_path: str,
    kb_dir: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """File-stream wrapper: append-only parquet of change events in,
    versioned two-table SCD2 KB out. Returns the StreamingQuery."""
    stream = spark.readStream.schema(CHANGE_SCHEMA).parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        apply_changelog_batch(spark, batch_df, batch_id, kb_dir)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
