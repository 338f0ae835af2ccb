"""Skyline (Pareto frontier) operator — the classic "best trade-offs"
query (Börzsönyi, Kossmann & Stocker, ICDE 2001) Spark has no built-in
for: keep every row not DOMINATED by another (dominated = other row ≤ in
both dimensions, strictly < in at least one; both dimensions minimized —
negate a column to maximize it).

Distributed shape (the standard two-phase skyline): phase 1 computes a
LOCAL skyline per physical input partition — lossless pruning, since any
global skyline point is necessarily a skyline point of its own partition
— using windows partitioned by spark_partition_id (never a global
window over the raw relation; the same discipline as the KMV bottom-k
prune). Phase 2 runs the identical dominance test over the survivor
union, which is bounded by the sum of per-partition frontier sizes (for
anti-correlated worst cases, repartition the survivors and iterate —
for real distributions frontiers are tiny relative to the input).

Dominance test per phase, all in one window pass over integer columns:
row (x, y) is dominated iff  min(y) over {x' < x}  <= y   (strictly
smaller x, no-worse y)  OR  min(y) over {x' = x}  <  y   (equal x,
strictly better y). Exact integer comparisons — no floats anywhere, so
the oracle's naive NOT EXISTS definition replays it verbatim (and the
equivalence of the optimized plan to the textbook definition IS the
correctness test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prune(df: DataFrame, x: str, y: str, part_cols: list) -> DataFrame:
    w_lt = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(x))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(*part_cols, x)
    min_lt = F.min(F.col(y)).over(w_lt)
    min_eq = F.min(F.col(y)).over(w_eq)
    dominated = (min_lt <= F.col(y)) | (min_eq < F.col(y))
    return (
        df.withColumn("_dom", F.coalesce(dominated, F.lit(False)))
        .filter(~F.col("_dom"))
        .drop("_dom")
    )


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows of `df` on the (x_col, y_col) minimization skyline. Both
    columns must be integer-comparable (cast floats to exact integer
    units first — cents, epoch seconds)."""
    local = _prune(df.withColumn("_pid", F.spark_partition_id()),
                   x_col, y_col, ["_pid"]).drop("_pid")
    return _prune(local, x_col, y_col, [])
