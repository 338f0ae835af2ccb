"""Incremental model updates — the reference's live/WikipediaUpdateFeed
module (live/src/main/scala/org/dbpedia/spotlight/feed/WikipediaUpdateFeed
.scala: a callback feed of edited articles whose occurrence statistics are
folded into the stores) re-expressed as a Structured Streaming merge.

A stream of new gold occurrences (doc_id, surface_form, uri) arrives in an
append-only directory; each micro-batch re-aggregates its counts and MERGES
them into the model count tables (uri support, pair counts). Parquet has no
upsert, so the merge is a full-outer join + sum rewritten atomically via a
temp directory swap — under Iceberg this becomes a MERGE INTO on the
bucketed table with snapshot isolation (io/storage.py notes).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OCC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("surface_form", T.StringType()),
        T.StructField("uri", T.StringType()),
    ]
)


def merge_counts(
    existing: DataFrame, delta: DataFrame, keys: list, count_col: str
) -> DataFrame:
    """existing ⟗ delta on keys, counts summed."""
    e = existing.withColumnRenamed(count_col, "_e")
    d = delta.withColumnRenamed(count_col, "_d")
    return e.join(d, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col("_e"), F.lit(0)) + F.coalesce(F.col("_d"), F.lit(0))
        ).cast("long").alias(count_col),
    )


def _atomic_overwrite(df: DataFrame, path: str) -> None:
    """Write to a temp dir, then swap — a poor man's snapshot commit."""
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def _last_applied_batch(model_dir: str) -> int:
    marker = os.path.join(model_dir, "_last_batch")
    if not os.path.exists(marker):
        return -1
    with open(marker) as f:
        return int(f.read().strip() or -1)


def _record_applied_batch(model_dir: str, batch_id: int) -> None:
    marker = os.path.join(model_dir, "_last_batch")
    tmp = marker + ".tmp"
    os.makedirs(model_dir, exist_ok=True)
    with open(tmp, "w") as f:
        f.write(str(batch_id))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)


def apply_occurrence_delta(
    spark: SparkSession,
    occs_delta: DataFrame,
    model_dir: str,
    batch_id: int | None = None,
) -> None:
    """Fold a batch of new occurrences into uri_counts + pair_counts tables
    under model_dir (creates them on first batch).

    Idempotence under foreachBatch's at-least-once replay: when batch_id is
    given, batches <= the recorded last-applied id are skipped, so a crash
    after the table swaps but before the streaming checkpoint commits does
    not double-count on restart. (A crash *between* the uri and pair swaps
    still leaves the two tables one batch apart until that batch replays —
    true multi-table atomicity needs the Iceberg MERGE INTO path noted in
    io/storage.py.)"""
    if batch_id is not None and batch_id <= _last_applied_batch(model_dir):
        return
    uri_path = os.path.join(model_dir, "uri_counts")
    pair_path = os.path.join(model_dir, "pair_counts")

    d_uri = occs_delta.groupBy("uri").agg(F.count("*").alias("support"))
    d_pair = occs_delta.groupBy("surface_form", "uri").agg(
        F.count("*").alias("pair_count")
    )
    if os.path.exists(uri_path):
        d_uri = merge_counts(
            spark.read.parquet(uri_path), d_uri, ["uri"], "support"
        )
        d_pair = merge_counts(
            spark.read.parquet(pair_path), d_pair,
            ["surface_form", "uri"], "pair_count",
        )
    # materialize before the swap (the plan reads the dir being replaced)
    du = d_uri.localCheckpoint(eager=True)
    dp = d_pair.localCheckpoint(eager=True)
    _atomic_overwrite(du, uri_path)
    _atomic_overwrite(dp, pair_path)
    if batch_id is not None:
        _record_applied_batch(model_dir, batch_id)


def occurrence_update_stream(
    spark: SparkSession,
    input_path: str,
    model_dir: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """readStream over an append-only occs directory; each micro-batch merges
    into the model count tables. Returns the StreamingQuery."""
    stream = spark.readStream.schema(OCC_SCHEMA).parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_occurrence_delta(spark, batch_df, model_dir, batch_id=batch_id)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
