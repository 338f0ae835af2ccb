"""Streaming exact dedup — a custom stateful operator via
applyInPandasWithState.

A training-data ingest pipeline deduplicates continuously: a document seen
in any earlier micro-batch must not be emitted again. That is per-key
state the engine has no built-in operator for, so it uses the documented
custom-stateful path (applyInPandasWithState; the GroupState contract —
the reference has no streaming engine at all, its live feed replays full
batches).

Design for scale: the stream is grouped by the 64-bit xxhash64 of the
normalized text (state key), so state is one boolean per distinct
document ever seen, partitioned by the hash — no hot keys, state size
bounded by distinct-doc count, checkpointed by the engine. The emitted
row keeps the first-seen doc per hash (min doc_id inside the batch for
batch-internal ties, first batch wins across batches).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "text_hash long, doc_id string, text string"
STATE_SCHEMA = "seen boolean"


def _dedup_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # hash already emitted in an earlier batch: drop everything
    # applyInPandasWithState may split one group's batch rows across several
    # pandas chunks — track the running min(doc_id) across ALL chunks, so
    # the emitted representative is the batch-global min, not
    # min-within-first-chunk (which would be chunking-dependent).
    first: dict[str, Any] | None = None
    for pdf in pdfs:
        if len(pdf):
            i = pdf["doc_id"].idxmin()
            if first is None or pdf.at[i, "doc_id"] < first["doc_id"]:
                first = {
                    "doc_id": pdf.at[i, "doc_id"],
                    "text": pdf.at[i, "text"],
                }
    state.update((True,))
    if first is not None:
        yield pd.DataFrame(
            {
                "text_hash": [key[0]],
                "doc_id": [first["doc_id"]],
                "text": [first["text"]],
            }
        )


def dedup_stream(
    documents_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """stream(doc_id, text) -> stream of first-seen docs per normalized
    text hash. Wire into writeStream(outputMode='append')."""
    keyed = documents_stream.select(
        F.xxhash64(
            F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
        ).alias("text_hash"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """File-stream wrapper: append-only parquet of (doc_id, text) in,
    deduped parquet out. Returns the StreamingQuery."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(input_path)
    out = dedup_stream(stream)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
