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
