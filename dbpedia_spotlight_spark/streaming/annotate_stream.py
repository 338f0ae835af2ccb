"""Streaming ingest — the reference's live-feed module re-expressed as
Structured Streaming.

Reference: live/src/main/scala/org/dbpedia/spotlight/feed/Feed.scala and
WikipediaUpdateFeed.scala are an observer-pattern push feed (callbacks on
new items, no real stream engine). The Spark-native equivalent is
`readStream` on an append-only documents source with `foreachBatch`
running the same batch annotate DAG per micro-batch — exactly the
callback-per-item pattern, but distributed, checkpointed and exactly-once
per sink write.

Why foreachBatch (not a pure streaming DAG): the annotate pipeline ends in
per-spot `row_number` windows (best_k) which Structured Streaming cannot
run incrementally; per micro-batch they are tiny and exact. The spotting /
candidate-join stages are stateless and would also run as a pure streaming
transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbpedia_spotlight_spark.model.model_tables import SpotlightModel
from dbpedia_spotlight_spark.pipeline.annotate import annotate

INTERLEAVED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def read_document_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Append-only parquet directory of interleaved documents as a stream."""
    reader = spark.readStream.schema(INTERLEAVED_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def annotate_stream(
    documents_stream: DataFrame,
    model: SpotlightModel,
    output_path: str,
    checkpoint_path: str,
    use_context: bool = True,
    available_now: bool = True,
):
    """Run the annotate pipeline over a document stream; each micro-batch
    appends annotations parquet under output_path. Returns the
    StreamingQuery (call .awaitTermination() / .stop())."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ann = annotate(batch_df, model, use_context=use_context)
        (
            ann.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_path)
        )

    writer = (
        documents_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
