"""SparkSession factory tuned for the KG-construction workload.

Settings chosen for scale (100 TB / 1000 executors) while remaining correct
on local[N]:
  - AQE on (runtime coalesce + skew-join split for head surface forms)
  - Arrow enabled for all pandas UDF boundaries, bounded batch size
  - shuffle partitions sized by parallelism (driver can override)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbpedia-spotlight-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # local[k] -> k cores; on a real cluster the caller passes master/None and
    # shuffle partitions should be ~2-3x total executor cores.
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            cores = os.cpu_count() if inner == "*" else int(inner)
        else:
            cores = 32
        shuffle_partitions = max(8, 2 * cores)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
