"""Table storage — the north rule's partitioned Iceberg output, with a
parquet fallback when no Iceberg catalog is on the classpath (this sandbox
ships no iceberg-spark-runtime jar; production submits with
--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13).

Layout contract (identical in both formats, SURVEY.md §4):
  - documents:   partitioned by bucket(doc_id)   — co-locates per-doc stages
  - triples:     partitioned by pred, bucket(subj)
  - model facts: candidates by bucket(sf_id); context_counts by
    bucket(res_id) — the candidate/context joins shuffle on exactly these
    keys, so co-partitioned reads skip the exchange
Under Iceberg these are real `bucket(N, col)` transforms with snapshot
isolation (the checkpoint manifest then just records snapshot ids); under
parquet we materialize the bucket as a column + directory partition, which
preserves partition pruning but not hidden partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def _bucket(col: str, n: int):
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


def write_bucketed(
    df: DataFrame,
    path_or_table: str,
    bucket_col: str,
    num_buckets: int = 64,
    extra_partition_cols: list | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with the standard layout. `path_or_table` is an Iceberg table
    identifier when a catalog is available, else a filesystem path."""
    spark = df.sparkSession
    parts = list(extra_partition_cols or [])
    if iceberg_available(spark):
        # One partitionedBy call with all transforms: repeated calls REPLACE
        # the previous partitioning (CreateTableWriter assigns, not appends),
        # which would silently drop the extra partition columns.
        transforms = [F.col(p) for p in parts] + [
            F.bucket(num_buckets, F.col(bucket_col))
        ]
        writer = df.writeTo(path_or_table).using("iceberg").partitionedBy(
            transforms[0], *transforms[1:]
        )
        (writer.createOrReplace() if mode == "overwrite" else writer.append())
        return
    out = df.withColumn("_bucket", _bucket(bucket_col, num_buckets))
    (
        out.repartition(*parts, "_bucket")
        .write.mode(mode)
        .partitionBy(*parts, "_bucket")
        .parquet(path_or_table)
    )


def read_bucketed(spark: SparkSession, path_or_table: str) -> DataFrame:
    if iceberg_available(spark) and "/" not in path_or_table:
        return spark.read.table(path_or_table)
    df = spark.read.parquet(path_or_table)
    return df.drop("_bucket") if "_bucket" in df.columns else df
