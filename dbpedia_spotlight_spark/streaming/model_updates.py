"""Incremental model updates — the reference's live/WikipediaUpdateFeed
module (live/src/main/scala/org/dbpedia/spotlight/feed/WikipediaUpdateFeed
.scala: a callback feed of edited articles whose occurrence statistics are
folded into the stores) re-expressed as a Structured Streaming merge.

A stream of new gold occurrences (doc_id, surface_form, uri) arrives in an
append-only directory; each micro-batch re-aggregates its counts and MERGES
them into the model count tables (uri support, pair counts). Parquet has no
upsert, so the merge is a full-outer join + sum staged into a new version
directory and committed by atomically repointing a CURRENT marker (one
commit point covering both tables AND the batch id) — under Iceberg this
becomes a MERGE INTO on the bucketed table with snapshot isolation
(io/storage.py notes).
"""

from __future__ import annotations

import os
import shutil

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




_CURRENT = "CURRENT"
_VERSIONS = "versions"
_TABLES = ("uri_counts", "pair_counts")


def _current_version(model_dir: str) -> str | None:
    """Name of the committed version dir (e.g. 'v000000000003'), or None."""
    marker = os.path.join(model_dir, _CURRENT)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        name = f.read().strip()
    return name or None


def _last_applied_batch(model_dir: str) -> int:
    v = _current_version(model_dir)
    return int(v[1:]) if v else -1


def _commit_version(model_dir: str, version: str) -> None:
    """THE single commit point: atomically repoint CURRENT at a fully
    staged version dir."""
    marker = os.path.join(model_dir, _CURRENT)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(version)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)


def _reconcile_convenience_links(model_dir: str) -> None:
    """Point model_dir/<table> symlinks at the committed version's tables
    and drop superseded version dirs. Pure convenience/GC — CURRENT is the
    source of truth, so this being interrupted (or stale after a crash)
    never affects correctness; it is re-run on every apply."""
    v = _current_version(model_dir)
    if v is None:
        return
    for t in _TABLES:
        target = os.path.join(_VERSIONS, v, t)
        link = os.path.join(model_dir, t)
        tmp = link + ".__lnk"
        if os.path.islink(link) and os.readlink(link) == target:
            continue
        if os.path.lexists(tmp):
            os.remove(tmp)
        os.symlink(target, tmp)
        os.replace(tmp, link)
    vroot = os.path.join(model_dir, _VERSIONS)
    for d in os.listdir(vroot):
        if d != v:
            shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)


def apply_occurrence_delta(
    spark: SparkSession,
    occs_delta: DataFrame,
    model_dir: str,
    batch_id: int | None = None,
) -> None:
    """Fold a batch of new occurrences into uri_counts + pair_counts tables
    under model_dir (creates them on first batch).

    Exactly-once under foreachBatch's at-least-once replay, with ONE commit
    point: both merged tables are staged into versions/v<batch_id>/ (a
    replayed batch re-stages over its own leftovers harmlessly), then the
    CURRENT marker is atomically repointed — tables and batch id become
    visible together. A crash anywhere before the CURRENT swap leaves the
    previous version fully intact; a crash anywhere after it leaves the new
    version fully committed, and the replayed batch is skipped because the
    batch id IS the committed version name. This is a file-based miniature
    of an Iceberg snapshot commit — at production scale use MERGE INTO on
    an Iceberg table (io/storage.py) and get the same single-swap semantics
    from the table format. model_dir/uri_counts and /pair_counts are kept
    as symlinks to the current version for direct-path readers (refreshed
    after commit; CURRENT is authoritative if the two ever diverge)."""
    last = _last_applied_batch(model_dir)
    if batch_id is not None and batch_id <= last:
        _reconcile_convenience_links(model_dir)  # heal a post-commit crash
        return
    effective_id = batch_id if batch_id is not None else last + 1
    cur = _current_version(model_dir)

    d_uri = occs_delta.groupBy("uri").agg(F.count("*").alias("support"))
    d_pair = occs_delta.groupBy("surface_form", "uri").agg(
        F.count("*").alias("pair_count")
    )
    if cur is not None:
        vdir = os.path.join(model_dir, _VERSIONS, cur)
        d_uri = merge_counts(
            spark.read.parquet(os.path.join(vdir, "uri_counts")),
            d_uri, ["uri"], "support",
        )
        d_pair = merge_counts(
            spark.read.parquet(os.path.join(vdir, "pair_counts")),
            d_pair, ["surface_form", "uri"], "pair_count",
        )
    version = f"v{effective_id:012d}"
    stage = os.path.join(model_dir, _VERSIONS, version)
    os.makedirs(stage, exist_ok=True)
    # materialize before writing (the plan reads the tables being replaced)
    du = d_uri.localCheckpoint(eager=True)
    dp = d_pair.localCheckpoint(eager=True)
    du.write.mode("overwrite").parquet(os.path.join(stage, "uri_counts"))
    dp.write.mode("overwrite").parquet(os.path.join(stage, "pair_counts"))
    _commit_version(model_dir, version)
    _reconcile_convenience_links(model_dir)


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
