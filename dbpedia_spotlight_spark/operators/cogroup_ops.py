"""Cogrouped pandas operators — per-key alignment of TWO tables where
the semantics are genuinely non-relational.

`cogrouped_dtw` computes the dynamic-time-warping distance per key
between two value series (e.g., a user's 'click' curve vs their 'view'
curve). DTW's O(n·m) dynamic program over the alignment lattice has no
SQL form, so this is the honest use of
`groupBy().cogroup().applyInPandas` — Spark shuffles both tables once
on the key and hands each key's two Arrow batches to one Python call;
the DP itself is a numpy rolling vector (one loop over the shorter
side, vectorized over the other).

Scale shape: one co-partitioned shuffle of each input; per-key cost is
the DP (band-limited via `band` for long series — the Sakoe-Chiba
constraint caps it at O(n·band)). Per-key state is two value arrays —
the same bound as any per-key sort. Verified against a pure-Python DP
reference in pytest (no SQL oracle can express this — documented
rows-only class).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def dtw_distance(
    a: np.ndarray, b: np.ndarray, band: Optional[int] = None
) -> float:
    """Classic DTW with |x−y| local cost; optional Sakoe-Chiba band.
    Rolling two-row DP, inner max/min vectorized across `b`."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("nan")
    if band is not None and abs(n - m) > band:
        band = abs(n - m)  # a valid warp path must exist
    prev = np.full(m + 1, np.inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, np.inf)
        lo = 1 if band is None else max(1, i - band)
        hi = m if band is None else min(m, i + band)
        cost = np.abs(a[i - 1] - b[lo - 1 : hi])
        # cur[j] = cost + min(prev[j-1], prev[j], cur[j-1]) — the
        # cur[j-1] term is a running dependency; do the two
        # prev-based candidates vectorized, then one scan for cur[j-1]
        base = np.minimum(prev[lo - 1 : hi], prev[lo : hi + 1])
        run = np.inf
        for k in range(hi - lo + 1):
            run = cost[k] + min(base[k], run)
            cur[lo + k] = run
        prev = cur
    return float(prev[m])


def cogrouped_dtw(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    band: Optional[int] = None,
) -> DataFrame:
    """-> (key, n_left, n_right, dtw): DTW distance between each key's
    two series (each sorted by ts). Keys present on only one side get
    dtw = null with the counts still reported (Arrow maps the NaN to
    null on the Spark side; we make that explicit)."""
    import math

    def per_key(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        a = l.sort_values(ts_col)[val_col].to_numpy(dtype=float)
        b = r.sort_values(ts_col)[val_col].to_numpy(dtype=float)
        d = dtw_distance(a, b, band)
        return pd.DataFrame(
            {
                on: [key[0]],
                "n_left": [len(a)],
                "n_right": [len(b)],
                "dtw": [None if math.isnan(d) else d],
            }
        )

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(
            per_key,
            schema=f"{on} long, n_left long, n_right long, dtw double",
        )
    )
