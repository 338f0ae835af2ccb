"""Range (interval-containment) join — match point rows to the intervals
that contain them, per key.

Spark compiles `l.key = r.key AND p.ts BETWEEN r.lo AND r.hi` as an
equi-join on key followed by a post-filter — correct, but the theta part
gives O(points × intervals) work inside each key, which dies on hot keys
(one user with 10⁵ events × 10³ sessions). The standard scale shape
(Databricks' range-join optimization does the same thing under a hint)
is BIN BUCKETING:

1. each interval explodes to the fixed-width bins it overlaps
   (`sequence(floor(lo/W), floor(hi/W))` — codegen, no Python);
2. each point computes its single bin `floor(ts/W)`;
3. equi-join on (key, bin) — now the multiplicity per probe row is only
   the intervals overlapping ONE bin — then the exact containment
   filter.

A (point, interval) pair can meet in at most one bin (the point's), so
no post-dedup is needed. Pick `bin_width` near the typical interval
span: too small explodes interval rows (span/W bins each), too large
degrades toward the per-key cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner join: every (point, containing-interval) pair — point and
    interval columns side by side (shared names: interval's prefixed
    `iv_`). Containment is lo <= ts < hi over NON-NEGATIVE numeric
    (e.g. epoch-us) columns — binning uses integer division via a
    truncating cast, which equals floor only for non-negative values;
    shift negative domains before joining."""
    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(lo_col) / bin_width).cast("long"),
                # hi is exclusive, but a point at floor(hi/W) may still
                # be < hi, so that bin is included
                (F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    dup = [c for c in intervals.columns if c in points.columns and c != on]
    for c in dup:
        binned_iv = binned_iv.withColumnRenamed(c, f"iv_{c}")
    lo = f"iv_{lo_col}" if lo_col in dup else lo_col
    hi = f"iv_{hi_col}" if hi_col in dup else hi_col
    pts = points.withColumn(
        "_bin", (F.col(ts_col) / bin_width).cast("long")
    )
    return (
        pts.join(binned_iv, [on, "_bin"])
        .where((F.col(ts_col) >= F.col(lo)) & (F.col(ts_col) < F.col(hi)))
        .drop("_bin")
    )
