"""Per-user sessionization — gap-based session windows over an event
stream, batch/stream agnostic.

The reference's feed module (live/src/main/scala/org/dbpedia/spotlight/
feed/Feed.scala) has no event-time notion at all; sessionization is the
other canonical event-time shape next to tumbling windows
(streaming/trending.py): events of one user closer than `gap` apart
merge into one session, a quiet period of ≥ `gap` closes it.

Spark-native: `F.session_window` — the built-in merging session window.
In streaming it is stateful with watermark-driven eviction (state is
bounded by open sessions, not stream length); on a batch DataFrame the
same plan computes the same sessions, which is what the DuckDB
gaps-and-islands oracle checks (`sessionize` query: lag + `<= gap`
merge test + running-sum island ids — the exact same merge rule: an
event at EXACTLY last_event_ts + gap still merges (the window end is
inclusive for merging — probed empirically on pyspark 4.1.2), and the
reported session end is last_event_ts + gap).

Scale shape at 100 TB of events: one shuffle keyed by user_id (map-side
partial session merge happens inside the session-window aggregation);
per-user state is one open session. A pathological single user with
billions of events is a key-skew concern like any groupBy — AQE skew
splitting cannot split a session window mid-key, so the mitigation is
the standard one: bound sessions with `max_events_hint` downstream or
pre-split such synthetic users at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """-> (user, session_start_us, session_end_us, n_events, total_value):
    one row per (user, session). Times are unix microseconds
    (timezone-independent integers; session_end = last event + gap)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            user_col,
            # parquet timestamps load as TIMESTAMP_NTZ; the session runs
            # in UTC (session.py), so the cast is a wall-clock identity
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("sw.end").cast("timestamp")).alias(
                "session_end_us"
            ),
            "n_events",
            "total_value",
        )
    )


def burst_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "hour",
    z: float = 2.0,
    baseline: int = 24,
) -> DataFrame:
    """Burst detection over an event stream (the rolling-z-score
    reduction of Kleinberg's burst model, KDD '02 — the form monitoring
    pipelines actually deploy): bucket event counts per key, compare
    each bucket against the mean/std of its own PREVIOUS `baseline`
    buckets, and flag buckets whose z-score clears `z` — "error events
    are arriving 4 sigma above their trailing day".

    -> flagged buckets only: (key_col, bucket_ts, n, base_mean round 6,
    base_std round 6, zscore round 4). Buckets with fewer than 2
    trailing buckets or zero variance never flag (no division).

    Scale shape: ONE groupBy (key, time bucket) collapses the stream
    (map-side combinable — the only pass over the raw events), then
    rolling mean/std are ONE window per key over the bucket series —
    state per key is `baseline` counters, the same per-key bound as
    sessionize. Works identically as a foreachBatch stage: the bucket
    table is tiny relative to the stream.
    """
    from pyspark.sql import Window

    counts = (
        events.select(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .groupBy("key", "bucket_ts")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(-baseline, -1)
    )
    scored = (
        counts.withColumn("_mu", F.avg("n").over(w))
        .withColumn("_sd", F.stddev_pop(F.col("n").cast("double")).over(w))
        .withColumn("_nb", F.count("n").over(w))
    )
    return (
        scored.filter(
            (F.col("_nb") >= 2)
            & (F.col("_sd") > 0)
            & ((F.col("n") - F.col("_mu")) / F.col("_sd") >= F.lit(z))
        )
        .select(
            F.col("key").alias(key_col),
            "bucket_ts",
            F.col("n").cast("long").alias("n"),
            F.round("_mu", 6).alias("base_mean"),
            F.round("_sd", 6).alias("base_std"),
            F.round((F.col("n") - F.col("_mu")) / F.col("_sd"), 4)
            .alias("zscore"),
        )
    )


def event_quantiles(
    events: DataFrame,
    quantiles: list[float],
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Exact per-key discrete quantiles (the p50/p95/p99 ops
    dashboard), computed by EXPLICIT rank arithmetic — value at row
    ceil(q*n) of the (value, tiebreak) total order — instead of an
    engine's percentile function, so the answer is identical on any
    engine (percentile_disc/approx implementations differ in
    interpolation and tie policy; this one is pinned).

    -> (key_col, q, value): one row per key x quantile.

    Scale shape: ONE window per key (rank over the per-key total
    order) + one broadcast-joined quantile dim + one filter — per-key
    sequential like every exact-quantile build; pre-aggregate or
    sample upstream for keys with billions of rows.
    """
    from pyspark.sql import Window

    if not quantiles or not all(0.0 < q <= 1.0 for q in quantiles):
        raise ValueError("quantiles must be in (0, 1]")
    spark = events.sparkSession
    qdim = spark.createDataFrame(
        [(float(q),) for q in sorted(set(quantiles))], "q double"
    )
    w = Window.partitionBy(key_col).orderBy(F.col(value_col).asc())
    ranked = (
        events.select(key_col, value_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n", F.count("*").over(Window.partitionBy(key_col))
        )
    )
    return (
        ranked.join(F.broadcast(qdim))
        .filter(F.col("_rn") == F.ceil(F.col("q") * F.col("_n")))
        .select(key_col, "q", F.col(value_col).alias("value"))
    )
