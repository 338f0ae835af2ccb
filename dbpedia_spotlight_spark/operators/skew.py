"""Skew handling utilities — the north-rule's "salted repartitioning" made
explicit, complementing the two-stage broadcast-then-shuffle candidate join
(operators/candidates.py:join_candidates) and AQE skew-join splitting
(session.py enables spark.sql.adaptive.skewJoin).

When to use which (SURVEY.md §4):
  - join skew, small skewed side      -> broadcast the head (two-stage join)
  - join skew, both sides big         -> salt the probe side, replicate the
                                         build side per salt (salted_join)
  - aggregation skew on heavy keys    -> two-phase salted aggregate (mostly
                                         redundant with map-side partial
                                         aggregation, but required for
                                         aggregates without partial combine,
                                         e.g. exact distinct counts)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Random-but-deterministic salt in [0, buckets) derived from the whole
    row's partition spread (monotonically_increasing_id is per-partition
    monotonic — cheap and shuffle-free)."""
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")
    )


def replicate_for_salt(
    df: DataFrame, buckets: int, salt_col: str = "_salt"
) -> DataFrame:
    """Replicate every row once per salt value (the build side of a salted
    join)."""
    return df.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))),
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `probe` has heavily skewed join keys: salt the probe
    rows across `buckets` partitions-per-key and replicate `build` per salt,
    so one hot key fans across `buckets` tasks instead of one straggler.
    Cost: build side is shuffled `buckets`×."""
    p = with_salt(probe, buckets)
    b = replicate_for_salt(build, buckets)
    return p.join(b, [*on, "_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame, group_cols: list, distinct_col: str, buckets: int = 16
) -> DataFrame:
    """Exact distinct count per group, skew-safe: phase 1 dedups on
    (group, salt-of-value, value) — hot groups spread over `buckets` tasks —
    phase 2 sums partial distincts. Equivalent to
    groupBy(group).agg(countDistinct(distinct_col)) with bounded per-task
    key width.
    -> group_cols + n_distinct."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(distinct_col), F.lit(buckets)).cast("int")
    )
    partial = (
        salted.select(*group_cols, "_salt", distinct_col)
        .distinct()
        .groupBy(*group_cols, "_salt")
        .agg(F.count("*").alias("_part"))
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_part").cast("long").alias("n_distinct")
    )


def dense_sorted_id(
    df: DataFrame,
    order_cols: list,
    id_col: str,
    start: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Dense, gap-free integer ids in global `order_cols` sort order WITHOUT
    a single-partition global window.

    `row_number() over (order by k)` moves the whole table through one
    partition — fine for a 20-row test dim, a straggler at the 10M+ surface
    forms / resources / vocab the reference's model build produces
    (core/.../memory/MemoryStore.scala keeps each dim fully indexed by a
    dense int id, so the ids themselves are non-negotiable). Instead:

      1. range-repartition by the sort key (partition i's keys all sort
         before partition i+1's; equal keys co-locate),
      2. row_number within each partition (parallel windows),
      3. add per-partition prefix offsets (one tiny P-row collect).

    The result is byte-identical to the global window (same dense ids in
    the same sort order) but every stage is parallel; the only driver-side
    data is one count per partition. The range-partitioned frame is
    persisted so the count pass and the id pass see identical partition
    bounds.
    """
    sess = df.sparkSession
    if partitions is None:
        partitions = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parts = (
        df.repartitionByRange(partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = dict(
        parts.groupBy("_pid").count().select("_pid", "count").collect()
    )
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            ),
            F.col("_pid"),
        ),
        F.lit(start),
    ) if offsets else F.lit(start)
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy(*cols)
    out = parts.withColumn(
        id_col, (F.row_number().over(w) - 1 + offset_expr).cast("long")
    ).drop("_pid")
    return out
