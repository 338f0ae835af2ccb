"""Temporal (interval-versioned) knowledge base: change-log folding and
as-of snapshot queries.

A KB built continuously from a document stream (the north rule's
10^12-doc corpus is re-crawled, not static) needs facts with validity
intervals: when a page's infobox changes, the old fact closes and the
new one opens. The reference models a single static snapshot (its model
tables are rebuilt from each dump — index/.../CreateSpotlightModel.scala);
this module adds the standard bitemporal-lite layer (SCD2 applied to
triples, the same shape as datapipe's scd2_resources for dimension rows)
so downstream queries can ask "what did the KB say at T".

Scale shape: interval derivation is one window lead() per (subj, pred)
partition — no join, no shuffle beyond the window's hash partition on
the fact key; as-of and diff are pushed-down range filters over the
interval columns (partition-prunable when the table is written
partitioned by months(valid_from) in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fold_changelog(
    changes: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    ts: str = "ts",
) -> DataFrame:
    """Fold a fact change log (subj, pred, obj, ts) — "at ts, (subj,pred)
    became obj" — into interval-versioned facts (subj, pred, obj,
    valid_from, valid_to), valid_to null for the current version.

    Consecutive assertions of the SAME obj collapse into one interval
    (re-crawls that observe no change must not fragment validity).
    One window pass per fact key: lag() drops no-op re-assertions,
    lead() closes each version at the next version's start.
    """
    key = Window.partitionBy("subj", "pred").orderBy("_ts")
    deduped = (
        changes.select(
            F.col(subj).alias("subj"),
            F.col(pred).alias("pred"),
            F.col(obj).alias("obj"),
            F.col(ts).alias("_ts"),
        )
        .withColumn("_prev", F.lag("obj").over(key))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("obj")))
        .drop("_prev")
    )
    nxt = Window.partitionBy("subj", "pred").orderBy("_ts")
    return deduped.select(
        "subj",
        "pred",
        "obj",
        F.col("_ts").alias("valid_from"),
        F.lead("_ts").over(nxt).alias("valid_to"),
    )


def kb_as_of(versioned: DataFrame, at) -> DataFrame:
    """Snapshot the interval-versioned KB at time ``at``: facts with
    valid_from <= at < valid_to (open-ended current versions match any
    future at). Pure filter — pushes to the scan, prunes interval
    partitions."""
    t = F.lit(at).cast("timestamp")
    return versioned.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("subj", "pred", "obj")


def kb_changes_between(versioned: DataFrame, start, end) -> DataFrame:
    """Facts whose validity STATE differs between the two instants —
    the KB delta an incremental consumer must apply to move a snapshot
    from ``start`` to ``end``: op='add' for facts valid at end but not
    start, op='del' for the reverse. Two as-of filters + one full outer
    join on the fact; equivalent to kb_diff(as_of(start), as_of(end))
    but in one pass over the version table."""
    a = kb_as_of(versioned, start).withColumn("_a", F.lit(1))
    b = kb_as_of(versioned, end).withColumn("_b", F.lit(1))
    j = a.join(b, ["subj", "pred", "obj"], "full_outer")
    return (
        j.filter(F.col("_a").isNull() | F.col("_b").isNull())
        .select(
            "subj",
            "pred",
            "obj",
            F.when(F.col("_a").isNull(), F.lit("add"))
            .otherwise(F.lit("del"))
            .alias("op"),
        )
    )


_ALLEN_CASES = (
    # (name, predicate-builder) — Allen 1983's 13 relations, closed-open
    # [s, e) intervals with s < e; exactly one case matches any pair.
    ("equals", lambda s1, e1, s2, e2: (s1 == s2) & (e1 == e2)),
    ("before", lambda s1, e1, s2, e2: e1 < s2),
    ("after", lambda s1, e1, s2, e2: e2 < s1),
    ("meets", lambda s1, e1, s2, e2: e1 == s2),
    ("met_by", lambda s1, e1, s2, e2: e2 == s1),
    ("starts", lambda s1, e1, s2, e2: (s1 == s2) & (e1 < e2)),
    ("started_by", lambda s1, e1, s2, e2: (s1 == s2) & (e2 < e1)),
    ("finishes", lambda s1, e1, s2, e2: (e1 == e2) & (s2 < s1)),
    ("finished_by", lambda s1, e1, s2, e2: (e1 == e2) & (s1 < s2)),
    ("during", lambda s1, e1, s2, e2: (s2 < s1) & (e1 < e2)),
    ("contains", lambda s1, e1, s2, e2: (s1 < s2) & (e2 < e1)),
    ("overlaps", lambda s1, e1, s2, e2: (s1 < s2) & (s2 < e1) & (e1 < e2)),
    ("overlapped_by", lambda s1, e1, s2, e2: (s2 < s1) & (s1 < e2) & (e2 < e1)),
)


def allen_relation(s1, e1, s2, e2):
    """Column expression naming the Allen interval relation (Allen 1983,
    "Maintaining Knowledge about Temporal Intervals") between [s1, e1)
    and [s2, e2). The 13 relations are mutually exclusive and jointly
    exhaustive for well-formed (start < end) intervals, so a single
    CASE chain — pure whole-stage-codegen, no UDF — classifies every
    pair; malformed intervals fall through to NULL for the caller to
    filter or assert on."""
    expr = F.lit(None).cast("string")
    for name, pred in reversed(_ALLEN_CASES):
        expr = F.when(pred(F.col(s1), F.col(e1), F.col(s2), F.col(e2)), name).otherwise(
            expr
        )
    return expr


def interval_align(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str = "valid_from",
    left_end: str = "valid_to",
    right_start: str = "valid_from",
    right_end: str = "valid_to",
) -> DataFrame:
    """Classify the Allen relation between every (left, right) interval
    pair sharing an entity key — the temporal-KB alignment step: does a
    fact's validity contain, overlap, or precede another fact about the
    same entity (event-ordering features, temporal-consistency checks
    on extracted facts à la Talukdar et al. 2012).

    Scale shape: one equi-join on the entity key (never a cross
    product; time predicates evaluate post-join inside codegen), so
    cost is Σ per-key |L_k|·|R_k| — the same bound any per-entity
    temporal reasoner pays. Output: key + both intervals + relation.
    """
    l = left.select(
        F.col(on).alias("key"),
        F.col(left_start).alias("l_start"),
        F.col(left_end).alias("l_end"),
    )
    r = right.select(
        F.col(on).alias("key"),
        F.col(right_start).alias("r_start"),
        F.col(right_end).alias("r_end"),
    )
    return l.join(r, "key").withColumn(
        "relation", allen_relation("l_start", "l_end", "r_start", "r_end")
    )


def interval_overlap_pairs(
    intervals: DataFrame,
    id_col: str = "id",
    start: str = "valid_from",
    end: str = "valid_to",
    bucket_width_days: int = 30,
) -> DataFrame:
    """Keyless interval-overlap self-join — all (a, b) pairs with
    a < b whose validity intervals intersect — via the standard grid
    trick: explode each interval to the day-buckets it covers, equi-join
    on the bucket, dedupe, re-verify true overlap. This replaces the
    quadratic theta-join Catalyst would otherwise plan (BroadcastNestedLoop)
    with one shuffle keyed on time buckets, at the cost of interval-
    length/bucket_width duplicate candidates — the same decomposition
    DuckDB/Postgres range-join papers use (Dignös et al., SIGMOD'14).

    Scale shape: candidates ≈ Σ_bucket |bucket|², so bucket_width should
    track interval length (default 30 d for month-scale facts); a
    temporally uniform corpus keeps buckets balanced regardless of
    total size. -> (a, b, a_start, a_end, b_start, b_end).
    """
    day = lambda c: F.datediff(F.col(c), F.lit("1970-01-01"))  # noqa: E731
    iv = intervals.select(
        F.col(id_col).alias("iid"),
        F.col(start).alias("s"),
        F.col(end).alias("e"),
        F.explode(
            F.sequence(
                F.floor(day(start) / bucket_width_days),
                F.floor((day(end) - 1) / bucket_width_days),
            )
        ).alias("bucket"),
    )
    cand = (
        iv.alias("a")
        .join(
            iv.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.iid") < F.col("b.iid")),
        )
        .select(
            F.col("a.iid").alias("a"),
            F.col("b.iid").alias("b"),
            F.col("a.s").alias("a_start"),
            F.col("a.e").alias("a_end"),
            F.col("b.s").alias("b_start"),
            F.col("b.e").alias("b_end"),
        )
        .distinct()
    )
    return cand.filter(
        (F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end"))
    )


def interval_coalesce(
    facts: DataFrame,
    keys: list[str] | None = None,
    start: str = "valid_from",
    end: str = "valid_to",
) -> DataFrame:
    """Temporal COALESCE (Böhlen/Snodgrass, the canonical temporal-DB
    normalization): merge overlapping OR adjacent validity intervals of
    value-equivalent facts into maximal intervals — the cleanup pass a
    temporal KB needs after unioning snapshots or changelogs, where the
    same (subj, pred, obj) arrives as [1,3) from one dump and [3,7)
    from the next but IS one continuous assertion [1,7). Intervals are
    half-open [start, end): touching endpoints merge, a gap of any
    size splits.

    -> one row per maximal interval: keys + (start, end) columns under
    their input names.

    Scale shape: gaps-and-islands — ONE window over (keys) ordered by
    (start, end) computing the running max end over PRECEDING rows (an
    island opens where start > that max), one running-sum window for
    the island id, one groupBy for the hull. All three share the same
    (keys)-partitioning: Spark plans a single shuffle, per-fact-key
    state only, no global sort, no self-join (the naive SQL coalesce is
    a quadratic NOT EXISTS self-join — that shape dies at 100 TB).
    """
    from pyspark.sql import Window

    keys = list(keys) if keys is not None else ["subj", "pred", "obj"]
    if not keys:
        raise ValueError("interval_coalesce needs >= 1 key column")
    # dedupe first: duplicate (keys, interval) rows never change the
    # hulls, but they DO make the (start, end) window order ambiguous —
    # two engines (or two window evaluations) may interleave the copies
    # differently and disagree on island ids. Unique rows make the sort
    # total and the result engine-independent.
    facts = facts.select(*keys, start, end).distinct()
    w = Window.partitionBy(*keys).orderBy(F.col(start).asc(), F.col(end).asc())
    prev_max = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = facts.withColumn(
        "_new_island",
        F.when(
            prev_max.isNull() | (F.col(start) > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy(*keys, "_island")
        .agg(F.min(start).alias(start), F.max(end).alias(end))
        .drop("_island")
    )


def interval_subtract(
    facts: DataFrame,
    retractions: DataFrame,
    keys: list[str] | None = None,
    start: str = "valid_from",
    end: str = "valid_to",
) -> DataFrame:
    """Temporal DIFFERENCE (the other half of Böhlen/Snodgrass interval
    algebra next to interval_coalesce): subtract per-key retraction
    intervals from fact validity intervals — the operator a continuously
    maintained KB needs to apply takedowns, corrections, or embargo
    windows ("fact F did NOT hold during [a, b)") without rewriting
    history row by row. Intervals are half-open [start, end); a
    retraction splits a fact interval into up to (overlaps + 1) pieces
    and drops it entirely when covered.

    ``facts`` and ``retractions`` both carry keys + (start, end); fact
    rows are deduplicated on (keys, start, end) first (payload-free
    contract, like interval_coalesce). -> maximal remaining validity
    pieces under the input column names.

    Scale shape: retractions are first COALESCED per key (the
    gaps-and-islands pass above — disjoint, sorted), then ONE keyed
    equi-join (never keyless) picks the retractions overlapping each
    fact, and ONE window per (keys, fact-interval) ordered by retraction
    start emits the gap before each retraction plus one tail piece —
    lag() + greatest/least, all codegen. A fact overlapped by R
    retractions costs R+1 rows, never R²; facts with no overlap pass
    through the left join untouched.
    """
    keys = list(keys) if keys is not None else ["subj", "pred", "obj"]
    if not keys:
        raise ValueError("interval_subtract needs >= 1 key column")
    f = facts.select(*keys, start, end).distinct()
    r = interval_coalesce(
        retractions.select(*keys, start, end), keys=keys, start=start, end=end
    ).select(
        *keys, F.col(start).alias("_rs"), F.col(end).alias("_re")
    )
    # keyed left join; a retraction that shares the key but does not
    # overlap the fact is nulled out below so it behaves like a miss
    j = (
        f.join(r, on=keys, how="left")
        .withColumn(
            "_hit",
            F.col("_rs").isNotNull()
            & (F.col(start) < F.col("_re"))
            & (F.col("_rs") < F.col(end)),
        )
        .withColumn("_rs", F.when(F.col("_hit"), F.col("_rs")))
        .withColumn("_re", F.when(F.col("_hit"), F.col("_re")))
        .dropDuplicates(keys + [start, end, "_rs", "_re"])
    )
    # untouched facts: no overlapping retraction at all
    grp = keys + [start, end]
    touched = j.filter(F.col("_hit")).select(*grp).distinct()
    untouched = (
        j.select(*grp).distinct().join(touched, grp, "left_anti")
    )
    hits = j.filter(F.col("_hit"))
    w = Window.partitionBy(*grp).orderBy(F.col("_rs").asc())
    pieces_before = (
        hits.withColumn("_ps", F.coalesce(F.lag("_re").over(w), F.col(start)))
        .withColumn("_pe", F.least(F.col(end), F.col("_rs")))
        .filter(F.col("_ps") < F.col("_pe"))
        .select(*keys, F.col("_ps").alias(start), F.col("_pe").alias(end))
    )
    tail = (
        hits.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*grp).orderBy(F.col("_rs").desc())
            ),
        )
        .filter((F.col("_rn") == 1) & (F.col("_re") < F.col(end)))
        .select(*keys, F.col("_re").alias(start), F.col(end).alias(end))
    )
    return untouched.unionByName(pieces_before).unionByName(tail)


def validity_histogram(
    facts: DataFrame,
    keys: list[str] | None = None,
    start: str = "valid_from",
    end: str = "valid_to",
) -> DataFrame:
    """Concurrent-validity timeline (the temporal-DB sweep line): for
    each key, how many facts are simultaneously valid over time —
    answering "how many distinct employers did this entity overlap",
    "how many versions of this predicate were live during the conflict
    window" without materializing per-instant rows. Each interval
    [start, end) contributes +1 at its start boundary and -1 at its
    end; the running sum at boundary t is the number of facts valid on
    [t, next boundary).

    -> (keys..., t, active): one row per distinct boundary instant,
    `active` = facts whose interval covers [t, next boundary). Trailing
    zero rows (after the last interval closes) are kept — they mark
    where the timeline empties.

    Scale shape: one union -> ONE groupBy (keys, t) summing deltas
    (map-side combinable — simultaneous starts/ends at the same instant
    collapse BEFORE the window, so no order ambiguity), then ONE
    running-sum window per key. Per-key state only; keys with millions
    of boundaries should pre-bucket t (the window is per-key
    sequential, the usual gaps-and-islands caveat).
    """
    keys = list(keys) if keys is not None else ["pred"]
    if not keys:
        raise ValueError("validity_histogram needs >= 1 key column")
    deltas = (
        facts.select(*keys, F.col(start).alias("t"), F.lit(1).alias("_d"))
        .unionByName(
            facts.select(*keys, F.col(end).alias("t"), F.lit(-1).alias("_d"))
        )
        .groupBy(*keys, "t")
        .agg(F.sum("_d").alias("_d"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return deltas.withColumn(
        "active", F.sum("_d").over(w).cast("long")
    ).drop("_d")


def temporal_constraints(
    facts: DataFrame,
    rules: list[tuple[str, str]],
    t_col: str = "valid_from",
) -> DataFrame:
    """Temporal-consistency checking over extracted facts (the ordering
    constraints of Talukdar/Wijaya/Mitchell, WSDM 2012: born before
    died, founded before acquired, joined before left): for each rule
    (pred_before, pred_after) and each subject, EVERY pred_after
    instant must be >= every pred_before instant; violating pairs come
    back as evidence rows — the triage feed for kbmaintain (retract or
    re-extract).

    ``facts``: (subj, pred, t_col). -> (subj, pred_before, t_before,
    pred_after, t_after, rule) with t_after < t_before, rule =
    'pred_before<pred_after'.

    Scale shape: the rules dim is tiny and BROADCAST onto the fact
    table twice (before-side, after-side); the violation join is keyed
    on (subj, rule) — per-entity state, never cross-entity; output
    bounded by actual violations. Multi-valued predicates pair up per
    subject (|A|x|B| within one entity), the same per-key bound as
    interval_align.
    """
    if not rules:
        raise ValueError("temporal_constraints needs >= 1 rule")
    spark = facts.sparkSession
    rdim = spark.createDataFrame(
        [(a, b, f"{a}<{b}") for a, b in rules], "pa string, pb string, rule string"
    )
    f = facts.select("subj", "pred", F.col(t_col).alias("_t"))
    before = f.join(
        F.broadcast(rdim), f["pred"] == rdim["pa"]
    ).select(
        "subj", "rule", F.col("pred").alias("pred_before"),
        F.col("_t").alias("t_before"),
    )
    after = f.join(
        F.broadcast(rdim), f["pred"] == rdim["pb"]
    ).select(
        "subj", "rule", F.col("pred").alias("pred_after"),
        F.col("_t").alias("t_after"),
    )
    return (
        before.join(after, ["subj", "rule"])
        .filter(F.col("t_after") < F.col("t_before"))
        .select(
            "subj", "pred_before", "t_before", "pred_after", "t_after",
            "rule",
        )
    )


def kb_timeline(
    versioned: DataFrame,
    instants: list,
    key_col: str = "pred",
) -> DataFrame:
    """KB composition over time: for each probe instant, how many facts
    (per key) were valid — the release-over-release health series a
    continuously built KB is judged by ("how many population facts did
    we hold each month"), computed WITHOUT materializing a snapshot
    per instant.

    ``versioned``: fold_changelog output (valid_from, valid_to —
    NULL = still current). ``instants``: explicit probe timestamps
    (a small list — months, releases). -> (key_col, at, n_facts).

    Scale shape: the instant dim is tiny and BROADCAST; one join with
    the interval-containment predicate (per fact x instant — bounded
    fan-out |instants|) and one groupBy. Zero rows per instant where
    the key held nothing (dense output left to the caller's pivot).
    """
    if not instants:
        raise ValueError("kb_timeline needs >= 1 instant")
    spark = versioned.sparkSession
    dim = spark.createDataFrame([(t,) for t in instants], ["at"]).withColumn(
        "at", F.col("at").cast("timestamp")
    )
    return (
        versioned.join(
            F.broadcast(dim),
            (F.col("valid_from") <= F.col("at"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("at"))),
        )
        .groupBy(F.col(key_col), "at")
        .agg(F.count("*").cast("long").alias("n_facts"))
    )
