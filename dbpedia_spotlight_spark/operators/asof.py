"""As-of (point-in-time) join — for each left row, the most recent right
row at-or-before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do — the DuckDB one IS the
oracle for the `events_asof` query). A naive theta-join
(`l.key = r.key AND r.ts <= l.ts` + keep max) explodes to O(|l|·|r|)
per key before pruning; the scale-correct shape is the union-and-fill
trick, the same one databases compile ASOF to a merge join with:

1. union both sides tagged (`_is_left` 0 for right, 1 for left) on
   (key, ts) — right sorts BEFORE left at equal ts, so an exactly
   simultaneous right row IS visible to the left row (`ts >= r.ts`
   semantics, matching DuckDB's ASOF default);
2. one window per key ordered by (ts, _is_left):
   `last(right_payload, ignorenulls=True)` over unbounded-preceding
   carries the latest right row forward;
3. keep the left rows; optionally null the match beyond `tolerance`.

Cost: ONE shuffle of |l|+|r| rows keyed by the join key and a per-key
sort — exactly a sort-merge join's cost, no row amplification. At
100 TB this holds as long as single keys fit a task's sort spill
(same bound as any sort-merge join); a pathologically hot key is the
usual groupBy-skew story.

Ambiguity note: if the right side has several rows at one (key, ts),
"the" as-of match is undefined in any engine — pre-aggregate the right
side to unique (key, ts) first (the query does).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_prefix: str = "r_",
    tolerance: Optional[Column] = None,
) -> DataFrame:
    """Backward as-of join: left columns + `r_<col>` for every non-key
    right column (incl. its timestamp), null when no right row precedes.
    `tolerance` (an interval/duration Column) nulls matches older than
    `left.ts - tolerance` instead of dropping the row."""
    r_payload = [c for c in right.columns if c != on]
    r_struct = F.struct(
        *[F.col(c).alias(right_prefix + c) for c in r_payload]
    )
    # typed-null twin of the right payload struct for the left rows
    null_r = F.lit(None).cast(
        right.select(r_struct.alias("_s")).schema["_s"].dataType
    )
    l_rows = left.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        null_r.alias("_r"),
    )
    r_rows = right.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("_s"))
            .schema["_s"]
            .dataType
        ).alias("_l"),
        r_struct.alias("_r"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_rows.unionByName(r_rows)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_is_left") == 1)
    )
    if tolerance is not None:
        fresh = F.col("_m")[right_prefix + ts_col] >= F.col("_ts") - tolerance
        filled = filled.withColumn(
            "_m", F.when(fresh, F.col("_m"))
        )
    out_cols = [F.col("_l")[c].alias(c) for c in left.columns] + [
        F.col("_m")[right_prefix + c].alias(right_prefix + c)
        for c in r_payload
    ]
    return filled.select(*out_cols)
