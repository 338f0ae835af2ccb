"""Event-time windowed aggregation with watermarks — trending counts over
an event stream.

The reference's feed module is a callback registry with no notion of event
time or lateness (live/src/main/scala/org/dbpedia/spotlight/feed/Feed.scala
— items are processed in arrival order). The Spark-native upgrade is an
event-time tumbling-window count with a watermark: late events within the
watermark still land in their window; events later than the watermark are
dropped deterministically instead of corrupting already-emitted windows.
At 100 TB-of-events scale this is the canonical streaming shape — the
window+key groupBy is a map-side-combined shuffle keyed by (window, key),
and state eviction is driven by the watermark, so state stays bounded by
(windows in flight x keys), not by stream length.

`trending_counts` is batch/stream agnostic: on a batch DataFrame the
watermark call is a no-op and the same plan computes the same counts —
that twin is what the DuckDB oracle checks (`events_windowed`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trending_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """-> (window_start, window_end, <key>, n): tumbling event-time window
    counts. On a streaming DataFrame the watermark bounds state and gates
    append-mode emission; on a batch DataFrame it is a no-op and the result
    is the plain windowed groupBy."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def top_trending(
    counts: DataFrame, k: int = 3, key_col: str = "event_type"
) -> DataFrame:
    """Top-k keys per window by count (batch post-processing of the window
    counts — rank windows are not incrementally computable in streaming, so
    run this on the sink table, the same split as annotate_stream)."""
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc(key_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def trending_stream(
    spark,
    input_path: str,
    schema,
    output_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "10 minutes",
):
    """readStream(parquet dir) -> watermarked window counts -> parquet sink,
    append mode (windows are emitted exactly once, when the watermark
    passes their end). Returns the started StreamingQuery (availableNow)."""
    stream = spark.readStream.schema(schema).parquet(input_path)
    counts = trending_counts(stream, ts_col, key_col, window, watermark)
    return (
        counts.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
