"""Declarative data-quality expectations over a DataFrame — the
Deequ/Great-Expectations-style validation gate a 100 TB ingest pipeline
runs BEFORE model building or training-data export (bad partitions are
cheaper to reject than to debug downstream).

Design: every requested metric compiles to ONE column expression inside a
SINGLE `agg()` — the whole suite is one scan + one map-side-combinable
aggregation regardless of how many expectations are declared (Deequ's
core trick). No collect of data rows: the only driver-side value is the
one metrics row. Checks then evaluate as plain comparisons on that row,
yielding (col_name, metric, value, threshold, passed) verdicts.

Supported metrics (all exact, all ANSI-SQL-expressible, hence the
`table_expectations` query hash-checks against DuckDB):

- completeness(col)        — non-null fraction
- uniqueness(col)          — distinct / total (exact count_distinct; at
                             100 TB swap approx_count_distinct or the
                             KMV sketch in datapipe/sketches.py)
- min / max / mean(col)    — numeric bounds
- mean_length(col)         — string payload sanity
- match_fraction(col, re)  — regexp conformance fraction

Reference parity note: DBpedia Spotlight has no validation layer; this
extends the training-data-pipeline operators (SURVEY.md §2.7). The
indexing pipeline's implicit assumptions (non-null URIs, positive counts)
become explicit, testable expectations here.
"""

from __future__ import annotations

import math

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative check: metric on column, expected in
    [lo, hi] (inclusive; None = unbounded on that side)."""

    column: str
    metric: str  # completeness|uniqueness|min|max|mean|mean_length|match_fraction
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None  # match_fraction only

    @property
    def key(self) -> str:
        return f"{self.column}__{self.metric}"


def _metric_expr(e: Expectation):
    c = F.col(e.column)
    if e.metric == "completeness":
        return F.avg(c.isNotNull().cast("double"))
    if e.metric == "uniqueness":
        return F.count_distinct(c) / F.count(F.lit(1))
    if e.metric == "min":
        return F.min(c).cast("double")
    if e.metric == "max":
        return F.max(c).cast("double")
    if e.metric == "mean":
        return F.avg(c.cast("double"))
    if e.metric == "mean_length":
        return F.avg(F.length(c).cast("double"))
    if e.metric == "match_fraction":
        return F.avg(c.rlike(e.pattern).cast("double"))
    raise ValueError(f"unknown metric {e.metric!r}")


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """-> (col_name, metric, value, lo, hi, passed) — one row per
    expectation, computed in ONE aggregation pass over df. Rounding to
    6 dp happens here so verdicts are reproducible across engines."""
    aggs = [
        F.round(_metric_expr(e), 6).alias(e.key) for e in expectations
    ]
    metrics = df.agg(*aggs)
    rows = []
    for e in expectations:
        v = F.col(e.key)
        passed = F.lit(True)
        if e.lo is not None:
            passed = passed & (v >= F.lit(float(e.lo)))
        if e.hi is not None:
            passed = passed & (v <= F.lit(float(e.hi)))
        rows.append(
            F.struct(
                F.lit(e.column).alias("col_name"),
                F.lit(e.metric).alias("metric"),
                v.alias("value"),
                F.lit(None if e.lo is None else float(e.lo))
                .cast("double")
                .alias("lo"),
                F.lit(None if e.hi is None else float(e.hi))
                .cast("double")
                .alias("hi"),
                passed.alias("passed"),
            )
        )
    # one metrics row -> explode the verdict structs; stays a DataFrame
    # end to end (no driver-side collect of metric values)
    return metrics.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.*")


#: Benford's-law expected first-digit shares, log10(1 + 1/d) — bound as
#: literals so the Spark plan and any SQL oracle embed the IDENTICAL
#: doubles (repr round-trips exactly) instead of each calling their own
#: log10.
BENFORD_SHARES: dict[int, float] = {
    d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_profile(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column ->
    one row per digit 1..9: (digit, n_obs, obs_share, expected_share,
    chi2_term). Benford deviation is the classic fabricated-data /
    unit-error screen on financial and measurement columns (Benford
    1938; Nigrini's auditing use); sum(chi2_term) against the
    chi-square(8) critical value is the test.

    First digits come from the integer-cent representation
    (round(x*100) -> string -> first char), so digit extraction is
    integer/string-exact in every engine; non-positive values are
    excluded (Benford is defined on positive magnitudes). One groupBy
    on 9 keys with map-side combine; the only floats are the terminal
    share/chi2 expressions against the literal expected shares.

    Every digit 1..9 emits a row even at zero observations (left join
    from a literal digit frame, r4 advisory): a digit that never occurs
    is exactly the fabricated-data signal the audit exists to catch,
    and its chi2 term (total·e) must count toward the statistic rather
    than silently vanish. With zero qualifying rows the shares/chi2
    come back NULL (0/0) on all nine rows."""
    cents = F.round(F.col(col) * 100).cast("long")
    digits = (
        df.select(cents.alias("_c"))
        .filter(F.col("_c") > 0)
        .select(F.substring(F.col("_c").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    all_digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = all_digits.join(
        digits.groupBy("digit").agg(F.count("*").cast("long").alias("n_obs")),
        "digit",
        "left",
    ).select("digit", F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"))
    total = F.sum("n_obs").over(Window.partitionBy())
    expected = F.create_map(
        *[
            x
            for d, s in BENFORD_SHARES.items()
            for x in (F.lit(d), F.lit(s))
        ]
    )
    e = expected[F.col("digit")]
    return counts.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs") / total, 6).alias("obs_share"),
        F.round(e, 6).alias("expected_share"),
        F.round(
            (F.col("n_obs") - total * e) * (F.col("n_obs") - total * e)
            / (total * e),
            6,
        ).alias("chi2_term"),
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Inter-annotator agreement for two BINARY labelers (Cohen 1960)
    -> one row (n, n11, n00, n_a1, n_b1, po, pe, kappa): observed
    agreement po, chance agreement pe from the marginals, and
    kappa = (po − pe)/(1 − pe) — the standard check before trusting
    any silver-label pipeline (weak supervision, rule-based labelers,
    model-vs-model audits).

    Exactness: kappa reduces to a ratio of INTEGERS —
      kappa = (n·(n11+n00) − E) / (n² − E),
      E = n_a1·n_b1 + (n−n_a1)·(n−n_b1)
    — so the single terminal division is the only float op and any
    engine replays it bit-for-bit. One scalar aggregate, map-side
    combinable; NULL kappa when chance agreement is total (n² == E)."""
    a = F.col(a_col).cast("int")
    b = F.col(b_col).cast("int")
    agg = df.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(((a == 1) & (b == 1)).cast("int")).cast("long").alias("n11"),
        F.sum(((a == 0) & (b == 0)).cast("int")).cast("long").alias("n00"),
        F.sum(a).cast("long").alias("n_a1"),
        F.sum(b).cast("long").alias("n_b1"),
    )
    n = F.col("n")
    e = F.col("n_a1") * F.col("n_b1") + (n - F.col("n_a1")) * (
        n - F.col("n_b1")
    )
    obs = F.col("n11") + F.col("n00")
    return agg.select(
        "n",
        "n11",
        "n00",
        "n_a1",
        "n_b1",
        F.round(obs.cast("double") / n, 6).alias("po"),
        F.round(e.cast("double") / (n * n), 6).alias("pe"),
        F.round(
            F.when(
                (n * n - e) != 0,
                (n * obs - e).cast("double") / (n * n - e).cast("double"),
            ),
            6,
        ).alias("kappa"),
    )
