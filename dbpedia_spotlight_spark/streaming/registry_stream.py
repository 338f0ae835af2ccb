"""Streaming first-seen entity registry — the KG-ingest "emerging
entity" gate as a custom stateful operator on the transformWithState
API (SPARK-49564, the Spark 4 successor of applyInPandasWithState used
by streaming/dedup_stream.py; typed per-key state handles + timers
instead of one opaque state tuple).

Semantics: a continuous stream of entity mentions (uri, ts) emits ONE
row per distinct uri — on the micro-batch where it is first sighted —
carrying the first-seen timestamp and that batch's mention count. Every
later mention of the uri is swallowed by the per-key ValueState. This
is the streaming twin of `emerging_entities` (operators/kbaugment.py):
the batch query finds NIL mentions post-hoc; the stream registers them
exactly once at ingest time, state checkpointed by the engine.

Scale: state is one boolean+timestamp per DISTINCT uri, hash-partitioned
by the group key — no hot keys beyond the mention skew itself, and the
RocksDB state store (required by this API; the wrapper sets the
provider) keeps per-executor state off-heap and incrementally
checkpointed, which is what makes billion-entity registries feasible
where the in-memory HDFS-backed store would OOM.

Environment gate: the transformWithState Python runner communicates
with its state server over protobuf; in a container without the
`protobuf` package the query fails at initialization (the pytest is
importorskip-gated on google.protobuf accordingly). The
applyInPandasWithState path (streaming/dedup_stream.py) has no such
dependency and stays the container-tested custom-stateful operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    BooleanType,
    StructField,
    StructType,
)

OUT_SCHEMA = "uri string, first_ts timestamp, n_first_batch long"

_STATE_SCHEMA = StructType([StructField("seen", BooleanType())])


class FirstSeenProcessor(StatefulProcessor):
    """ValueState("seen") per uri; emits only when state is absent."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        # one group's batch rows may arrive as several pandas chunks:
        # fold min(ts) and the count across ALL of them so the emitted
        # row is chunking-independent (same discipline as dedup_stream)
        first_ts = None
        n = 0
        for pdf in rows:
            if len(pdf):
                n += len(pdf)
                m = pdf["ts"].min()
                if first_ts is None or m < first_ts:
                    first_ts = m
        self._seen.update((True,))
        if n:
            yield pd.DataFrame(
                {"uri": [key[0]], "first_ts": [first_ts], "n_first_batch": [n]}
            )

    def close(self) -> None:
        pass


def first_seen_stream(mentions_stream: DataFrame) -> DataFrame:
    """stream(uri, ts) -> stream of first sightings (OUT_SCHEMA). Wire
    into writeStream(outputMode='append')."""
    return (
        mentions_stream.select("uri", "ts")
        .groupBy("uri")
        .transformWithStateInPandas(
            statefulProcessor=FirstSeenProcessor(),
            outputStructType=OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def run_registry_stream(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """File-stream wrapper: append-only parquet of (uri, ts) in,
    first-sighting registry parquet out. Sets the RocksDB state-store
    provider (the transformWithState API requires it; the setting is
    session-wide, and every other stateful operator in this package is
    provider-agnostic). Returns the StreamingQuery."""
    from pyspark.sql import types as T

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    schema = T.StructType(
        [
            T.StructField("uri", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(input_path)
    out = first_seen_stream(stream)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
