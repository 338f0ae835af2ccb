"""Stream-stream event-time join — correlate two live event streams per
key within a time window.

The last Structured Streaming shape the engine needed: both sides are
unbounded, so the join is stateful — each side buffers rows until the
OTHER side's watermark passes the range-condition horizon, then state
is evicted. The range condition (`r.ts` within [l.ts − within, l.ts])
is what makes eviction possible: without it state grows with stream
length; with it Spark bounds each side's buffer to (watermark + within)
of event time. That is the documented Spark contract for stream-stream
joins, and the reason `within` is a REQUIRED argument here.

Batch/stream agnostic (the same plan on batch frames is what the
`events_join_within` DuckDB oracle checks; on batch, prefer
operators/ranges.point_in_interval_join when one side is huge — the
theta range tail of this join filters per key AFTER the equi match,
which is fine streaming-side where the buffer is watermark-bounded but
quadratic-per-key on a skewed batch key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_within(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Rows of `left` paired with every `right` row of the same key whose
    timestamp falls in [left.ts − within, left.ts] (right at-or-before
    left, bounded lookback). Columns come out prefixed l_/r_."""
    l = left.select(
        F.col(on).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (on, ts_col)
        ],
    )
    r = right.select(
        F.col(on).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, ts_col)
        ],
    )
    if l.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)
