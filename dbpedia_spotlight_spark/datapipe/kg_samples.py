"""Training-example generation for KG-embedding models (TransE-family)
over the materialized triple store — the step between this engine's
KG-construction output (pipeline/triples.py) and a representation-learning
job.

Negative sampling (Bordes et al. 2013): each positive (subj, pred, obj)
triple yields `num_neg` corrupted-tail triples (subj, pred, obj') with
obj' drawn from the entity dimension. The draw is DETERMINISTIC — obj' is
the entity whose dense rank equals md5_48(subj·pred·obj·j) mod
n_entities (fields joined on the \\x1f unit separator)
— so the sample set is reproducible across runs, executors, and engines
(the DuckDB oracle replays the identical hash arithmetic; same md5-prefix
pattern as datapipe/sketches.py). Corruptions that collide with the true
tail are dropped, the standard filtered-sampling correction.

Scale shape: positives never move — the only join is corrupted rank ->
entity dimension, and the entity dim is the SMALL side (broadcast), same
boundedness argument as the model's res_id assignment in
operators/modelbuild.py. One explode (num_neg, a small constant) is the
only row amplification.

Reference parity note: DBpedia Spotlight emits annotations, not training
samples; this extends the training-data-pipeline operators
(SURVEY.md §2.7) on the kg_construct axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash48(col):
    """48-bit md5-prefix BIGINT — cross-engine-replayable (DuckDB twin:
    ('0x' || substr(md5(x), 1, 12))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def entity_ranks(entities: DataFrame, uri_col: str = "uri") -> DataFrame:
    """-> (ent_rank, uri): dense 0-based ranks in uri order. The entity
    dimension is the small side (bounded like the model's res_id dim), so
    the single-partition rank window is deliberate; the output is meant to
    be broadcast."""
    w = Window.orderBy(F.asc(uri_col))
    return entities.select(F.col(uri_col).alias("uri")).distinct().select(
        (F.row_number().over(w) - 1).cast("long").alias("ent_rank"),
        "uri",
    )


def negative_samples(
    triples: DataFrame,
    entities: DataFrame,
    num_neg: int = 2,
    uri_col: str = "uri",
) -> DataFrame:
    """triples(subj, pred, obj) + entities(uri) ->
    (subj, pred, obj, label, neg_idx): the positives (label 1, neg_idx 0)
    plus up to num_neg corrupted-tail negatives per positive (label 0,
    neg_idx 1..num_neg, obj replaced by the hash-picked entity; picks
    colliding with the true obj are filtered out)."""
    ents = F.broadcast(entity_ranks(entities, uri_col))
    n = ents.count()
    pos = triples.select(
        "subj",
        "pred",
        "obj",
        F.lit(1).alias("label"),
        F.lit(0).alias("neg_idx"),
    )
    corrupted = (
        triples.select(
            "subj",
            "pred",
            "obj",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, num_neg + 1)])
            ).alias("neg_idx"),
        )
        .withColumn(
            "pick",
            # \x1f unit separator between fields so ("ab","c") and
            # ("a","bc") cannot hash alike; the oracle joins with chr(31)
            F.pmod(
                _hash48(
                    F.concat_ws("\x1f", "subj", "pred", "obj", "neg_idx")
                ),
                F.lit(n),
            ),
        )
        .join(ents, F.col("pick") == F.col("ent_rank"))
        .filter(F.col("uri") != F.col("obj"))
        .select(
            "subj",
            "pred",
            F.col("uri").alias("obj"),
            F.lit(0).alias("label"),
            "neg_idx",
        )
    )
    return pos.unionByName(corrupted)


def random_walks(
    edges: DataFrame,
    num_walks: int = 2,
    walk_len: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic DeepWalk-style walk corpus (Perozzi et al. 2014) over
    an undirected edge list -> (start, walk_id, step, node), one row per
    visited node, step 0..walk_len.

    Step s of walk w from `start` standing at `node` moves to the
    neighbor whose per-node rank (neighbors sorted by id) equals
    md5_48(start·w·s·node) mod degree(node) — fields \\x1f-joined, same
    replayable-hash scheme as negative_samples, so the SAMPLED walk
    corpus itself is oracle-checkable and identical across runs,
    executors, and engines.

    Scale shape: the walk frontier advances with two equi-joins per step
    (frontier->degree dim for the modulus, then (node, pick) ->
    (u, nrank) into the ranked adjacency) — no row amplification beyond
    the frontier itself, walk_len is a small constant, and the adjacency
    ranking is a per-node window (partitioned, never global). Walks from
    every node proceed in one DataFrame — the corpus for a skip-gram
    embedding job downstream.
    """
    u, v = F.col(src).alias("u"), F.col(dst).alias("v")
    sym = (
        edges.select(u, v)
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    w_nbr = Window.partitionBy("u").orderBy(F.asc("v"))
    nbr = sym.select(
        "u", "v", (F.row_number().over(w_nbr) - 1).cast("long").alias("nrank")
    )
    deg = nbr.groupBy("u").agg(F.count("*").cast("long").alias("deg"))

    frontier = (
        deg.select(F.col("u").alias("start"))
        .select(
            "start",
            F.explode(
                F.array(*[F.lit(i) for i in range(num_walks)])
            ).alias("walk_id"),
        )
        .withColumn("node", F.col("start"))
    )
    out = frontier.select(
        "start", "walk_id", F.lit(0).alias("step"), "node"
    )
    for s in range(1, walk_len + 1):
        stepped = (
            frontier.join(deg, frontier["node"] == deg["u"])
            .withColumn(
                "pick",
                F.pmod(
                    _hash48(
                        F.concat_ws(
                            "\x1f",
                            "start",
                            "walk_id",
                            F.lit(s).cast("string"),
                            "node",
                        )
                    ),
                    F.col("deg"),
                ),
            )
            .select("start", "walk_id", "node", "pick")
        )
        frontier = (
            stepped.join(
                nbr,
                (stepped["node"] == nbr["u"])
                & (stepped["pick"] == nbr["nrank"]),
            )
            .select("start", "walk_id", F.col("v").alias("node"))
        )
        out = out.unionByName(
            frontier.select(
                "start", "walk_id", F.lit(s).alias("step"), "node"
            )
        )
    return out


def fastrp_projection(
    nodes: DataFrame, dim: int = 8, s: int = 3
) -> DataFrame:
    """Achlioptas sparse random projection for FastRP (Chen et al. 2019,
    "Fast and Accurate Network Embeddings via Very Sparse Random
    Projection"): r[node, j] ∈ {+√s, -√s, 0} with P(±) = 1/(2s),
    DETERMINISTIC from md5_48(node∥j) — the projection (and therefore
    the whole embedding) replays bit-identically across runs, executors
    and engines. Zero entries are dropped (the matrix is sparse by
    construction: 2/3 zeros at s=3). -> (node, j, r)."""
    import math

    js = F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("j")
    base = nodes.select("node", js)
    bucket = _hash48(F.concat_ws("\x1f", F.col("node"), F.col("j"))) % (2 * s)
    r = (
        F.when(bucket == 0, F.lit(math.sqrt(s)))
        .when(bucket == 1, F.lit(-math.sqrt(s)))
        .otherwise(F.lit(0.0))
    )
    return base.withColumn("r", r).filter(F.col("r") != 0.0)


def fastrp_embeddings(
    edges: DataFrame,
    dim: int = 8,
    weights: tuple = (1.0, 2.0),
) -> DataFrame:
    """FastRP node embeddings: emb = w1·(D⁻¹A)R + w2·(D⁻¹A)²R over a
    directed edge set (symmetrize first for undirected graphs) ->
    (node, j, value) long format, value rounded to 6 dp.

    Everything is joins + groupBy sums — each propagation hop is one
    equi-join of the edge list against the previous (node, j, v) table
    keyed on the neighbor, then a (src, j) sum; no vectors ever sit on
    the driver, and dim multiplies rows (dim·|V| working set), not
    shuffle count. Being hash-deterministic, the embedding VALUES are
    oracle-checkable in SQL — unusual for an embedding method and the
    reason FastRP (not SGD-trained TransE) is the in-engine default;
    negative_samples/random_walks above feed external trainers for the
    learned alternatives.
    """
    w1, w2 = float(weights[0]), float(weights[1])
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    proj = fastrp_projection(nodes, dim=dim)

    def hop(prev: DataFrame, val_col: str) -> DataFrame:
        return (
            edges.join(
                prev.withColumnRenamed("node", "dst"), "dst"
            )
            .join(deg, "src")
            .groupBy(F.col("src").alias("node"), "j")
            .agg(F.sum(F.col(val_col) / F.col("_deg")).alias("v"))
        )

    e1 = hop(proj, "r")
    e2 = hop(e1.withColumnRenamed("v", "r"), "r")
    return (
        e1.withColumnRenamed("v", "_v1")
        .join(e2.withColumnRenamed("v", "_v2"), ["node", "j"], "full_outer")
        .select(
            "node",
            "j",
            F.round(
                w1 * F.coalesce(F.col("_v1"), F.lit(0.0))
                + w2 * F.coalesce(F.col("_v2"), F.lit(0.0)),
                6,
            ).alias("value"),
        )
    )


def verbalize_triples(
    triples: DataFrame,
    labels: DataFrame | None = None,
    templates: dict[str, str] | None = None,
    default_template: str = "{s} {p} {o}.",
    group_by_subject: bool = True,
) -> DataFrame:
    """KG-to-text verbalization (the KELM/TEKGEN recipe, Agarwal et al.
    NAACL 2021, distilled to its deterministic template stage): render
    every triple as a sentence and optionally concatenate each subject's
    sentences into one synthetic document — the canonical way a
    KG-construction pipeline feeds its OWN output back into an LLM
    pretraining mix, and the inverse of pipeline/triples.py (text ->
    triples there, triples -> text here).

    ``templates`` maps predicate -> template string with ``{s}``/``{p}``/
    ``{o}`` placeholders (unmapped predicates use ``default_template``);
    ``labels`` is an optional (uri, label) table substituting
    human-readable names for subject/object URIs (misses keep the URI).
    -> ``group_by_subject=True``: (subj, text, n_facts) with sentences
    in lexicographic order joined by a space (deterministic, engine-
    replayable); False: (subj, pred, obj, sentence) one row per triple.

    Scale shape: the template dim is tiny and BROADCAST; labels join the
    corpus twice (subject, object) as plain equi-joins; placeholder
    substitution is a codegen replace chain; the per-subject rollup is
    ONE groupBy with array_sort(collect_list) — bounded by per-entity
    fact counts, the same skew profile as entity_digest.
    """
    spark = triples.sparkSession
    tpl = spark.createDataFrame(
        sorted((templates or {}).items()) or [("", "")],
        "pred string, _tpl string",
    ).filter(F.col("pred") != "")
    t = triples.select("subj", "pred", "obj").join(
        F.broadcast(tpl), "pred", "left"
    ).withColumn("_tpl", F.coalesce(F.col("_tpl"), F.lit(default_template)))
    if labels is not None:
        lab_s = labels.select(
            F.col("uri").alias("subj"), F.col("label").alias("_sl")
        )
        lab_o = labels.select(
            F.col("uri").alias("obj"), F.col("label").alias("_ol")
        )
        t = (
            t.join(lab_s, "subj", "left")
            .join(lab_o, "obj", "left")
            .withColumn("_sname", F.coalesce(F.col("_sl"), F.col("subj")))
            .withColumn("_oname", F.coalesce(F.col("_ol"), F.col("obj")))
            .drop("_sl", "_ol")
        )
    else:
        t = t.withColumn("_sname", F.col("subj")).withColumn(
            "_oname", F.col("obj")
        )
    sentence = F.replace(
        F.replace(
            F.replace(F.col("_tpl"), F.lit("{s}"), F.col("_sname")),
            F.lit("{p}"),
            F.col("pred"),
        ),
        F.lit("{o}"),
        F.col("_oname"),
    )
    per_triple = t.select(
        "subj", "pred", "obj", sentence.alias("sentence")
    )
    if not group_by_subject:
        return per_triple
    return per_triple.groupBy("subj").agg(
        F.array_join(
            F.array_sort(F.collect_list("sentence")), " "
        ).alias("text"),
        F.count("*").alias("n_facts"),
    )


def contrastive_triplets(
    embeddings: DataFrame,
    links: DataFrame,
    k_neg: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(anchor, positive, hard-negative) training triplets for
    contrastive representation learning (the SimCSE/SBERT mining
    recipe, and the standard fine-tuning diet for entity-linking
    encoders): positives are asserted links (sameAs candidates,
    anchor-text pairs, co-click pairs — caller-provided (a, b) rows);
    hard negatives are each anchor's top-`k_neg` cosine neighbors that
    are NOT linked to it (either direction) and not itself — the
    near-misses that actually move a contrastive loss, vs easy random
    negatives.

    -> (anchor, pos_id, neg_id, neg_rank, neg_cosine[round 4]), one row
    per (link x negative); anchors absent from `embeddings` drop out.

    Scale shape: scoring delegates to similarity.brute_force_topk —
    the labeled exact baseline (anchor dim broadcast, one Arrow cosine
    pass, per-anchor window) — over-fetching k_neg + max-degree
    candidates so the post-hoc link anti-join cannot starve the top-k;
    at corpus scale swap the scorer for lsh_topk/ivf_topk (same
    (query_id, cand_id, cosine) contract). The link exclusion is one
    anti-join on bare id pairs; max link degree is computed as ONE
    scalar aggregate (the only collect).
    """
    from .similarity import brute_force_topk

    lk = links.select(
        F.col(links.columns[0]).alias("a"), F.col(links.columns[1]).alias("b")
    )
    sym = lk.unionByName(
        lk.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    anchors = sym.select(F.col("a").alias(id_col)).distinct().join(
        embeddings.select(id_col, vec_col), id_col
    )
    max_deg = (
        sym.groupBy("a").agg(F.count("*").alias("d"))
        .agg(F.max("d"))
        .collect()[0][0]
        or 0
    )
    scored = brute_force_topk(
        embeddings,
        anchors,
        k=k_neg + max_deg,
        id_col=id_col,
        vec_col=vec_col,
    )
    negs = (
        scored.join(
            sym.select(
                F.col("a").alias("query_id"), F.col("b").alias("cand_id")
            ),
            ["query_id", "cand_id"],
            "left_anti",
        )
        .withColumn(
            "neg_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("cand_id").asc()
                )
            ),
        )
        .filter(F.col("neg_rank") <= k_neg)
    )
    return (
        lk.join(
            embeddings.select(F.col(id_col).alias("a")).distinct(), "a"
        )
        .select(F.col("a").alias("query_id"), F.col("b").alias("pos_id"))
        .join(negs, "query_id")
        .select(
            F.col("query_id").alias("anchor"),
            "pos_id",
            F.col("cand_id").alias("neg_id"),
            "neg_rank",
            F.round("cosine", 4).alias("neg_cosine"),
        )
    )
