"""Ordered-funnel matching and retention cohorts over an event stream —
the product-analytics pair of the engine's event family (windowed
aggregation, sessionization, as-of joins already live in
streaming/sessions.py and the events_* queries).

Spark design: a K-step funnel is K-1 frontier joins — each step's
frontier is (user, first qualifying ts), built by one filtered
aggregate and an equi-join on user_id against the previous frontier;
never a per-user collect_list sort (a user with millions of events
would blow task memory). Retention is two grouped aggregates (cohort =
first-seen period per user; activity = distinct user-periods) plus one
join. Both are map-side combinable before their shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user converts through step i iff an
    event of type steps[i] exists STRICTLY AFTER their earliest match
    of step i-1 (the standard min-time greedy matching — it maximizes
    conversion counts for ordered funnels). -> (step_idx, step,
    n_users), one row per step, counts non-increasing.

    Each step is one filter + one (user, min ts) aggregate + one join
    on user_id against the previous frontier; K steps = K shuffles on
    the same user key (co-partitioned after the first).
    """
    if not steps:
        raise ValueError("steps must be a non-empty list of event types")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_t"))
    )
    counts = [(0, steps[0], frontier.count())]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(
                F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
            )
            .join(frontier, "_u")
            .filter(F.col("_ts") > F.col("_t"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_t"))
        )
        frontier = nxt
        counts.append((i, step, frontier.count()))
    spark = events.sparkSession
    return spark.createDataFrame(
        counts, "step_idx int, step string, n_users long"
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period: str = "week",
) -> DataFrame:
    """Cohort retention: cohort = the period of a user's FIRST event;
    for every (cohort, later-or-equal active period) pair, how many of
    the cohort's users were active -> (cohort, period_offset, n_users);
    offset 0 row = cohort size, and n_users at offset k is the classic
    retention curve.

    Two aggregates (first-seen per user; distinct user-periods) and one
    join on user_id. Cohort dates render as 'yyyy-MM-dd' strings so the
    output is engine-portable.
    """
    per_user = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("_cohort")
    )
    active = (
        events.select(
            F.col(user_col).alias("_u"),
            F.date_trunc(period, F.col(ts_col)).alias("_p"),
        )
        .distinct()
    )
    days = {"week": 7, "day": 1}.get(period)
    if days is None:
        raise ValueError("period must be 'week' or 'day'")
    return (
        active.join(per_user, "_u")
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort"),
            (
                F.datediff(F.col("_p"), F.col("_cohort")) / days
            ).cast("long").alias("period_offset"),
        )
        .agg(F.countDistinct("_u").cast("long").alias("n_users"))
    )
