"""Cogrouped DTW (operators/cogroup_ops.py): DP correctness vs a pure
reference, band behavior, one-sided keys."""

import math
import random

import numpy as np

from dbpedia_spotlight_spark.operators.cogroup_ops import (
    cogrouped_dtw,
    dtw_distance,
)


def _ref_dtw(a, b):
    n, m = len(a), len(b)
    D = [[math.inf] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(a[i - 1] - b[j - 1])
            D[i][j] = c + min(D[i - 1][j - 1], D[i - 1][j], D[i][j - 1])
    return D[n][m]


def test_dtw_distance_known_and_random():
    assert dtw_distance(np.array([1.0, 2, 3]), np.array([1.0, 2, 2, 3])) == 0.0
    assert dtw_distance(np.array([0.0]), np.array([5.0])) == 5.0
    rng = random.Random(3)
    for _ in range(25):
        a = [rng.uniform(-5, 5) for _ in range(rng.randint(1, 12))]
        b = [rng.uniform(-5, 5) for _ in range(rng.randint(1, 12))]
        got = dtw_distance(np.array(a), np.array(b))
        assert got == round(_ref_dtw(a, b), 12) or abs(got - _ref_dtw(a, b)) < 1e-9


def test_dtw_band_widens_to_feasible():
    # |n-m| > band would make the path infeasible; band auto-widens
    a = np.arange(10, dtype=float)
    b = np.array([0.0, 9.0])
    assert math.isfinite(dtw_distance(a, b, band=1))


def test_cogrouped_dtw_per_key(spark):
    left = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 2.0), (1, 2, 3.0), (2, 0, 4.0)],
        "user_id long, ts long, value double",
    )
    right = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 2.0), (1, 2, 2.0), (1, 3, 3.0), (3, 0, 7.0)],
        "user_id long, ts long, value double",
    )
    out = {r.user_id: r for r in cogrouped_dtw(left, right).collect()}
    assert out[1].dtw == 0.0 and out[1].n_left == 3 and out[1].n_right == 4
    # one-sided keys: counts reported, distance null
    assert out[2].n_right == 0 and out[2].dtw is None
    assert out[3].n_left == 0 and out[3].dtw is None
