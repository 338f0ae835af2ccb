"""Truth discovery / fact fusion over multi-source named-graph quads.

A KG built from many extractors or snapshots (the named-graph layout
``functions/rdf.py:with_graph`` / ``lift_named_graphs`` materialize and
``operators/kgquery.py:sparql_select_quads`` queries) carries conflicting
claims: two graphs assert different objects for the same (subject,
predicate). The reference resolves conflicts only implicitly — last
extractor wins inside its indexers (index/.../CreateSpotlightModel.scala
merges count tables without provenance). Production KG construction uses
*truth discovery*: estimate per-source reliability and per-fact confidence
jointly (Yin, Han & Yu, "Truth Discovery with Multiple Conflicting
Information Providers on the Web", TKDE 2008 — TruthFinder; Dong et al.,
"Knowledge Vault", KDD 2014 uses the same source-reliability idea).

``fact_fusion`` implements the fixed-point family's simplest deterministic
member (Sums/average-log-style mutual reinforcement with vote-share
normalization), unrolled a fixed number of rounds so the result is exact,
reproducible, and SQL-expressible:

    t_k(source) = mean over its claims of c_k(fact)
    c_{k+1}(fact) = Σ_{sources claiming fact} t_k
                    / Σ_{sources claiming ANY object for the same
                         (subj, pred) conflict group} t_k

c is a vote share in [0, 1] within each conflict group; sources that
agree with the majority on many facts gain trust, and their minority
claims then outweigh claims from habitually-contradicted sources.

Scale shape: the claim table is shuffled alternately on the fact key and
the source key — two hash aggregations per round, both map-side
combinable, no window over the whole table, no driver state. Rounds are
a Python loop over lazily-composed DataFrames (default 3), so the plan
depth is bounded and small. Confidences are rounded per round to keep
float drift below oracle tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fact_fusion", "resolve_conflicts", "annotation_vote"]


def fact_fusion(
    quads: DataFrame,
    rounds: int = 3,
    graph_col: str = "graph",
) -> DataFrame:
    """Joint source-reliability / fact-confidence estimation.

    ``quads``: (subj, pred, obj, <graph_col>) — one row per claim; the
    graph is the claiming source. Duplicate claims from one source count
    once. Returns one row per distinct fact:

        (subj, pred, obj, confidence, n_sources)

    confidence = the round-``rounds`` vote share of this object within
    its (subj, pred) conflict group (1.0 when uncontested), rounded to
    6 decimals. Facts and conflict groups are exact set constructs, so
    a fixed-round SQL twin reproduces the values bit-for-bit.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    claims = (
        quads.select(
            "subj", "pred", "obj", F.col(graph_col).alias("src")
        )
        .distinct()
        .persist()
    )
    # round 0: every fact starts at the uninformative vote share —
    # uniform over the objects competing in its conflict group.
    group_sizes = claims.select("subj", "pred", "obj").distinct().groupBy(
        "subj", "pred"
    ).agg(F.count("*").alias("_n_obj"))
    conf = (
        claims.select("subj", "pred", "obj")
        .distinct()
        .join(group_sizes, ["subj", "pred"])
        .select(
            "subj", "pred", "obj",
            F.round(F.lit(1.0) / F.col("_n_obj"), 6).alias("confidence"),
        )
    )
    for _ in range(rounds):
        # trust: mean confidence of the source's claims
        trust = (
            claims.join(conf, ["subj", "pred", "obj"])
            .groupBy("src")
            .agg(F.round(F.avg("confidence"), 6).alias("trust"))
        )
        # fact support: sum of claiming sources' trust
        support = (
            claims.join(trust, "src")
            .groupBy("subj", "pred", "obj")
            .agg(F.sum("trust").alias("_support"))
        )
        # vote-share normalization within the (subj, pred) conflict group
        totals = support.groupBy("subj", "pred").agg(
            F.sum("_support").alias("_total")
        )
        conf = support.join(totals, ["subj", "pred"]).select(
            "subj", "pred", "obj",
            F.round(F.col("_support") / F.col("_total"), 6).alias(
                "confidence"
            ),
        )
    n_sources = claims.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("n_sources")
    )
    out = conf.join(n_sources, ["subj", "pred", "obj"])
    claims.unpersist()
    return out


def resolve_conflicts(fused: DataFrame) -> DataFrame:
    """Pick the winning object per (subj, pred) from fact_fusion output.

    Deterministic: highest confidence wins, ties broken by most sources,
    then lexicographically smallest object. Returns
    (subj, pred, obj, confidence, n_sources) — one row per (subj, pred),
    i.e. a functional (conflict-free) triple table ready for closure /
    entailment / export. One window partitioned by the conflict-group
    key (bounded groups), no global sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("subj", "pred").orderBy(
        F.desc("confidence"), F.desc("n_sources"), F.asc("obj")
    )
    return (
        fused.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def annotation_vote(
    annotations: DataFrame,
    min_sources: int = 1,
) -> DataFrame:
    """Span-level annotator fusion — the Snorkel-style majority label
    model reduced to its deterministic core, applied to entity
    annotations instead of triples (fact_fusion above is the triple
    half): multiple annotators (model spotters, dictionary spotters,
    crowd layers) emit (doc_id, begin, end, label, source); each
    distinct span keeps the label with the most DISTINCT supporting
    sources, ties broken by label ascending so the result is
    bit-stable. agreement = winner votes / all votes on the span — the
    confidence signal a training-data pipeline thresholds on before a
    span becomes a silver label.

    -> (doc_id, begin, end, label, votes, n_sources, agreement),
    one row per span with >= min_sources distinct annotators.

    Scale shape: ONE groupBy (doc_id, begin, end, label) counting
    distinct sources, then a window max-pick partitioned by the span —
    both hash-partition on the span key, so Spark plans a single
    exchange; no join, no collect, skew bounded by annotators-per-span
    (the number of layers, a small constant).
    """
    votes = annotations.groupBy("doc_id", "begin", "end", "label").agg(
        F.countDistinct("source").alias("votes")
    )
    w = Window.partitionBy("doc_id", "begin", "end")
    picked = (
        votes.withColumn("_tot", F.sum("votes").over(w))
        .withColumn("_ns", F.col("_tot"))
        .withColumn(
            "_rn",
            F.row_number().over(
                w.orderBy(F.col("votes").desc(), F.col("label").asc())
            ),
        )
        .filter(F.col("_rn") == 1)
    )
    return picked.filter(F.col("votes") >= min_sources).select(
        "doc_id",
        "begin",
        "end",
        "label",
        "votes",
        F.col("_tot").alias("n_sources"),
        F.round(F.col("votes") / F.col("_tot"), 6).alias("agreement"),
    )
