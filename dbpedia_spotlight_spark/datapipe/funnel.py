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

from pyspark.sql import DataFrame, Window
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


def event_transitions(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream ->
    (src, dst, n, prob): for each ordered per-user pair of consecutive
    events, the transition count and the row-normalized probability
    P(dst | src) — the clickstream model behind next-action prediction
    and anomaly scoring ("error after purchase is 40x base rate").

    One lead() window per user (keyed shuffle on user_col, ordered by
    (ts, id) so duplicate timestamps stay deterministic), one groupBy on
    the (src, dst) pair, and the normalizer is a window over the tiny
    (|types|^2)-row matrix, not the stream. prob = n / n_src rounded to
    6 — a single exact-replayable division."""
    w = Window.partitionBy(user_col).orderBy(
        F.asc(ts_col), F.asc(id_col)
    )
    pairs = (
        events.select(
            F.col(type_col).alias("src"),
            F.lead(type_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w_src = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_src), 6).alias("prob"),
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch attribution -> per touch channel (touch_type,
    n_touches, first_credit, last_credit, linear_micros, linear_credit):
    every conversion event distributes credit over that user's EARLIER
    touch events — 1 to the first touch, 1 to the last, and 1/n to each
    under the linear model (the three standard position models).

    Linear credit is computed in FIXED POINT: each touch earns
    1_000_000 div n micro-credits (integer division), so sums are exact
    BIGINTs with no float accumulation order to drift across engines —
    the same half-up/fixed-point discipline as the neighborhood-agg and
    label-noise operators; `linear_credit` is the single terminal
    division by 1e6.

    Plan: conversions equi-join touches on user_col (keyed shuffle;
    fan-out bounded by per-user activity, the same boundedness argument
    as the funnel joins), strictly-earlier filter, two rank windows per
    conversion for first/last, then one groupBy per channel."""
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_cts"),
        F.col(id_col).alias("_cid"),
    )
    touch = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_tts"),
        F.col(id_col).alias("_tid"),
        F.col(type_col).alias("touch_type"),
    )
    joined = conv.join(touch, "_u").filter(F.col("_tts") < F.col("_cts"))
    w_conv = Window.partitionBy("_u", "_cid")
    w_asc = w_conv.orderBy(F.asc("_tts"), F.asc("_tid"))
    w_desc = w_conv.orderBy(F.desc("_tts"), F.desc("_tid"))
    scored = joined.select(
        "touch_type",
        (F.row_number().over(w_asc) == 1).cast("long").alias("_first"),
        (F.row_number().over(w_desc) == 1).cast("long").alias("_last"),
        F.floor(F.lit(1_000_000) / F.count("*").over(w_conv))
        .cast("long")
        .alias("_lin_micros"),
    )
    return scored.groupBy("touch_type").agg(
        F.count("*").cast("long").alias("n_touches"),
        F.sum("_first").cast("long").alias("first_credit"),
        F.sum("_last").cast("long").alias("last_credit"),
        F.sum("_lin_micros").cast("long").alias("linear_micros"),
        (F.sum("_lin_micros") / F.lit(1e6)).alias("linear_credit"),
    )


def ab_test_report(
    events: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Deterministic A/B readout -> one row (n_a, n_b, conv_a, conv_b,
    rate_a, rate_b, z_score): users are assigned to arms by md5 parity
    of their id (the reproducible hash-split every experiment platform
    uses — no stored assignment table needed), a user converts iff they
    have >= 1 event of `conversion_type`, and the two-proportion pooled
    z-statistic quantifies the split. sqrt is IEEE correctly-rounded, so
    the statistic is bit-replayable given the same expression tree (the
    DuckDB twin mirrors the parenthesization exactly).

    Plan: one per-user aggregate (arm + converted flag, keyed shuffle on
    user), one 2-row groupBy, one scalar projection."""
    per_user = (
        events.select(
            F.col(user_col).alias("_u"),
            (F.col(type_col) == conversion_type).cast("int").alias("_c"),
        )
        .groupBy("_u")
        .agg(F.max("_c").alias("_conv"))
        .select(
            F.when(
                F.conv(
                    F.substring(F.md5(F.col("_u").cast("string")), 1, 12),
                    16,
                    10,
                ).cast("long")
                % 2
                == 0,
                F.lit("A"),
            )
            .otherwise(F.lit("B"))
            .alias("_arm"),
            "_conv",
        )
    )
    arms = per_user.groupBy("_arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_conv").cast("long").alias("conv"),
    )
    a = arms.filter(F.col("_arm") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = arms.filter(F.col("_arm") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    wide = a.crossJoin(b)
    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    # degenerate experiment (0% or 100% pooled conversion) -> NULL z
    # rather than an ANSI divide-by-zero
    z = F.when(se > 0, (pa - pb) / se)
    return wide.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
    )


def event_ohlc(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """OHLC downsampling (the candlestick / metrics-rollup shape) ->
    per (event_type, time bucket): open, high, low, close in exact
    integer CENTS plus event count and cent volume. Open/close are the
    first/last event by (ts, id) in the bucket — id tiebreak keeps
    duplicate timestamps deterministic; high/low/volume are plain
    max/min/sum. Values enter as round(value*100) BIGINTs, so every
    aggregate is integer-exact (no float min/max/sum drift).

    Plan: one window pass partitioned by (type, bucket) for the two rank
    flags, one groupBy — both shuffle on the same key."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = events.select(
        F.col(type_col).alias("event_type"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        cents.alias("_cents"),
    )
    w = Window.partitionBy("event_type", "bucket_ts")
    w_asc = w.orderBy(F.asc("_ts"), F.asc("_id"))
    w_desc = w.orderBy(F.desc("_ts"), F.desc("_id"))
    flagged = base.select(
        "event_type",
        "bucket_ts",
        "_cents",
        (F.row_number().over(w_asc) == 1).alias("_is_open"),
        (F.row_number().over(w_desc) == 1).alias("_is_close"),
    )
    return flagged.groupBy("event_type", "bucket_ts").agg(
        F.max(F.when(F.col("_is_open"), F.col("_cents"))).alias("open_cents"),
        F.max("_cents").alias("high_cents"),
        F.min("_cents").alias("low_cents"),
        F.max(F.when(F.col("_is_close"), F.col("_cents"))).alias(
            "close_cents"
        ),
        F.count("*").cast("long").alias("n"),
        F.sum("_cents").cast("long").alias("volume_cents"),
    )


def event_acf(
    events: DataFrame,
    max_lag: int = 5,
    value_col: str = "value",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Lag-k autocorrelation of each event type's value series ->
    (event_type, lag, n_pairs, corr): Pearson correlation between the
    series and its lag-k shift (ordered by (ts, id)), for lags 1..max_lag
    — the seasonality/burst-memory profile of a metric stream.

    Exactness discipline: values enter as integer cents, and the
    correlation is computed from the five BIGINT power sums of the
    lag-paired series (m·Σxy − Σx·Σy over the sqrt of the two variance
    terms), so every aggregate is integer-exact and only the one
    terminal expression is floating point — bit-replayable in any
    engine, like `ab_test_report`'s z. Cent-scale products over
    row-count-scale sums stay far inside BIGINT range.

    Plan: one lead() window per lag over the same (type)-keyed sort —
    Spark reuses the single sort across the max_lag projections — one
    explode-free union via stacked lag columns, one groupBy on
    (type, lag). NULL corr for constant series (zero variance)."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    w = Window.partitionBy(type_col).orderBy(F.asc(ts_col), F.asc(id_col))
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = events.select(
        F.col(type_col).alias("event_type"),
        cents.alias("_x"),
        *[
            F.lead(cents, k).over(w).alias(f"_y{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    pairs = base.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col("_x").alias("x"),
                        F.col(f"_y{k}").alias("y"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("p"),
    ).select(
        "event_type", "p.lag", "p.x", "p.y"
    ).filter(F.col("y").isNotNull())
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    m = F.col("n_pairs")
    num = m * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = m * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = m * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "event_type",
        "lag",
        "n_pairs",
        F.round(
            F.when(
                (varx > 0) & (vary > 0),
                num / F.sqrt(varx.cast("double") * vary.cast("double")),
            ),
            6,
        ).alias("corr"),
    )


def ab_cuped(
    events: DataFrame,
    split_ts: str,
    value_col: str = "value",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    WSDM 2013) -> one row per md5-parity arm: (arm, n_users, mean_post,
    mean_post_adj, theta, var_reduction). The covariate is each user's
    PRE-period value sum (before `split_ts`), the metric their
    post-period sum; CUPED subtracts theta·(x − x̄) from the metric,
    where theta = cov(x, y)/var(x) pooled over all users — the standard
    sensitivity boost every experimentation platform applies before the
    t-test.

    Exactness discipline (the ab_test/event_acf pattern taken further):
    values are integer cents, and BOTH the per-arm adjusted means and
    the variance-reduction ratio are CLOSED FORMS over seven BIGINT
    power sums —
      theta        = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)
      mean_adj(a)  = Sy_a/n_a − theta·(Sx_a/n_a − Sx/n)
      var_red      = 1 − (Vyy − 2θ·Cxy + θ²·Vxx)/Vyy
        with Vxx = n·Sxx − Sx², Vyy = n·Syy − Sy², Cxy = n·Sxy − Sx·Sy
    — so no per-row float ever exists and the DuckDB twin replays the
    identical expression tree. NULL theta/adjusted values when the
    covariate has zero variance.

    Plan: one per-user aggregate (conditional pre/post cent sums, keyed
    shuffle on user), one 2-row arm aggregate, one scalar pooled
    aggregate broadcast back."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    cut = F.lit(split_ts).cast("timestamp")
    per_user = (
        events.select(
            F.col(user_col).alias("_u"),
            F.when(F.col(ts_col) < cut, cents).otherwise(F.lit(0)).alias("_x"),
            F.when(F.col(ts_col) >= cut, cents).otherwise(F.lit(0)).alias("_y"),
        )
        .groupBy("_u")
        .agg(F.sum("_x").alias("x"), F.sum("_y").alias("y"))
        .select(
            F.when(
                F.conv(
                    F.substring(F.md5(F.col("_u").cast("string")), 1, 12),
                    16,
                    10,
                ).cast("long")
                % 2
                == 0,
                F.lit("A"),
            )
            .otherwise(F.lit("B"))
            .alias("arm"),
            "x",
            "y",
        )
    )
    pooled = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").alias("sx_a"),
        F.sum("y").alias("sy_a"),
    )
    j = arms.crossJoin(F.broadcast(pooled))
    vxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    theta = F.when(vxx > 0, cxy / vxx.cast("double"))
    mean_post = F.col("sy_a") / F.col("n_users")
    mean_adj = mean_post - theta * (
        F.col("sx_a") / F.col("n_users") - F.col("sx") / F.col("n")
    )
    var_red = F.when(
        (vxx > 0) & (vyy > 0),
        F.lit(1.0)
        - (vyy - 2 * theta * cxy + theta * theta * vxx) / vyy.cast("double"),
    )
    return j.select(
        "arm",
        "n_users",
        F.round(mean_post, 6).alias("mean_post"),
        F.round(mean_adj, 6).alias("mean_post_adj"),
        F.round(theta, 6).alias("theta"),
        F.round(var_red, 6).alias("var_reduction"),
    )


def mann_whitney_u(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    type_col: str = "event_type",
    conversion_type: str | None = None,
) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between the md5-parity
    arms -> one row (n_a, n_b, u2_a, z_score): the nonparametric
    companion of `ab_test_report` for skewed metrics where the t-test's
    mean is fragile. Samples are the two arms' event values (optionally
    restricted to `conversion_type` events), in integer cents.

    Scale design — NO global rank window and NO pairwise join: U counts
    pairs (a > b) + ties/2, which convolves over the VALUE HISTOGRAMS:
      U_A = Σ_v cntA(v) · (cumB(< v) + cntB(v)/2)
    Both histograms group by the distinct cent values (domain-bounded,
    not row-bounded), the running cumB is a window over that bounded
    domain, and to stay integer-exact the operator reports u2_a = 2·U_A
    (doubling clears the tie halves). The normal approximation
      z = (2U − n_a·n_b) / sqrt( 4·σ² ),
      σ² = n_a·n_b/12 · [ (N+1) − Σ(t³−t)/(N(N−1)) ]   (tie-corrected)
    is a single terminal float expression over exact BIGINT sums — the
    same discipline as ab_test/ab_cuped, so the oracle replays it."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    arm = F.when(
        F.conv(
            F.substring(F.md5(F.col(user_col).cast("string")), 1, 12), 16, 10
        ).cast("long")
        % 2
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    src = events
    if conversion_type is not None:
        src = src.filter(F.col(type_col) == conversion_type)
    vals = src.select(arm.alias("arm"), cents.alias("v"))
    hist = vals.groupBy("v").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    # running count of B strictly below v — window over the bounded
    # distinct-value domain, not the event stream
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    conv = hist.withColumn(
        "cumb_lt", F.coalesce(F.sum("cb").over(w), F.lit(0))
    )
    agg = conv.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("cumb_lt") + F.col("cb"))
        ).alias("u2_a"),
        F.sum(
            (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            - (F.col("ca") + F.col("cb"))
        ).alias("tie_sum"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    sigma2_4 = (
        F.lit(4.0)
        * (na * nb).cast("double")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("tie_sum").cast("double")
            / (n * (n - 1)).cast("double")
        )
    )
    z = F.when(
        sigma2_4 > 0,
        (F.col("u2_a") - na * nb).cast("double") / F.sqrt(sigma2_4),
    )
    return agg.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.col("u2_a").cast("long").alias("u2_a"),
        F.round(z, 4).alias("z_score"),
    )


def absorption_probability(
    events: DataFrame,
    target_type: str,
    steps: int = 10,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Probability of reaching `target_type` within `steps` transitions
    from each event state -> (state, p_absorb): the first-order Markov
    chain of `event_transitions` with the target made ABSORBING, iterated
    k steps — "how likely does a user in state s convert within k
    actions", the chain-based complement of the positional funnel.

    Recursion: v_0 ≡ 0; v_{k+1}(s) = P(s, target) + Σ_{t≠target}
    P(s, t)·v_k(t). The state space is the event-type vocabulary — a
    BOUNDED dimension — so the exact transition counts (the only
    data-sized aggregate) are collected and the k-step recursion runs
    driver-side over the tiny matrix in a FIXED state order
    (alphabetical, left-assoc adds), making every float op replayable
    by the oracle's unrolled per-state expressions. Transition
    probabilities are exact count ratios."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    pairs = (
        events.select(
            F.col(type_col).alias("src"),
            F.lead(type_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
    )
    rows = pairs.collect()  # bounded: |event types|^2
    states = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    cnt = {(r["src"], r["dst"]): r["n"] for r in rows}
    tot = {s: sum(cnt.get((s, t), 0) for t in states) for s in states}
    p = {
        (s, t): (cnt.get((s, t), 0) / tot[s] if tot[s] else 0.0)
        for s in states
        for t in states
    }
    v = {s: 0.0 for s in states}
    for _ in range(steps):
        nv = {}
        for s in states:
            acc = p[(s, target_type)] if target_type in states else 0.0
            for t in states:  # fixed alphabetical order = fixed FP order
                if t != target_type:
                    acc = acc + p[(s, t)] * v[t]
            nv[s] = acc
        v = nv
    spark = events.sparkSession
    return spark.createDataFrame(
        [(s, round(v[s], 6)) for s in states], "state string, p_absorb double"
    )
