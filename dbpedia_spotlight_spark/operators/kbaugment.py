"""Knowledge-base augmentation operators — the post-linking KG-construction
steps downstream pipelines run over the annotate output.

The reference stops at emitting per-mention (uri, confidence) annotations
(core/.../outputs/ — SURVEY.md §2.1 S11/S12). Production KG construction
adds two standard steps on top:

* ``entity_salience`` — per-(document, entity) salience features and a
  combined score (Dunietz & Gillick, "A New Entity Salience Task with
  Millions of Training Examples", EACL 2014: mention frequency and
  first-mention position are the two dominant features). Salient-entity
  triples ("doc mentions X saliently") are what KG consumers index.

* ``emerging_entities`` — NIL clustering / emerging-entity discovery
  (the TAC-KBP "NIL clustering" task): mentions the linker could NOT
  confidently resolve are grouped by normalized surface form and minted
  a deterministic new KB identifier, so unknown real-world entities
  become first-class nodes instead of dropped rows.

Scale shape: both are single groupBy aggregations over the annotation
table (map-side combinable; no window, no driver state). Deterministic
arithmetic on counts → exact SQL twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_salience(occs: DataFrame) -> DataFrame:
    """Per-(doc_id, uri) salience features + score.

    ``occs``: (doc_id, pos, uri) mention rows, pos = token position.
    Returns (doc_id, uri, n_mentions, first_pos, mention_frac, score):
      mention_frac = n_mentions / doc total mentions,
      pos_ratio    = first_pos / (last mention pos + 1),
      score        = round(mention_frac · (1 − pos_ratio), 6)
    — frequent AND early entities score high, the D&G'14 feature pair
    combined multiplicatively. All inputs are integer counts, so the
    float math replays exactly in any engine."""
    per = occs.groupBy("doc_id", "uri").agg(
        F.count("*").alias("n_mentions"),
        F.min("pos").alias("first_pos"),
    )
    doc = occs.groupBy("doc_id").agg(
        F.count("*").alias("_doc_mentions"),
        F.max("pos").alias("_max_pos"),
    )
    return (
        per.join(doc, "doc_id")
        .select(
            "doc_id",
            "uri",
            "n_mentions",
            "first_pos",
            F.round(
                F.col("n_mentions") / F.col("_doc_mentions"), 6
            ).alias("mention_frac"),
            F.round(
                (F.col("n_mentions") / F.col("_doc_mentions"))
                * (
                    F.lit(1.0)
                    - F.col("first_pos") / (F.col("_max_pos") + F.lit(1))
                ),
                6,
            ).alias("score"),
        )
    )


def emerging_entities(
    annotations: DataFrame,
    score_col: str = "prior",
    threshold: float = 0.5,
    id_prefix: str = "NEW:",
) -> DataFrame:
    """NIL clustering: mint deterministic KB ids for unresolvable mentions.

    ``annotations``: mention rows with a ``surface_form`` column and a
    linker confidence ``score_col``. Mentions below ``threshold`` are
    NIL; they cluster by normalized surface form (lowercase, trimmed,
    inner whitespace collapsed — the TAC-KBP NIL-clustering baseline,
    which surface-form normalization alone nearly saturates). Each
    cluster becomes one new entity: id = ``id_prefix`` + normal form.

    Returns the new-entity dimension (entity_id, surface_form_norm,
    n_mentions, n_docs) — join it back on the normal form to rewrite
    mention rows. One filter + one groupBy; map-side combinable."""
    norm = F.regexp_replace(
        F.lower(F.trim(F.col("surface_form"))), r"\s+", " "
    )
    nil = annotations.filter(F.col(score_col) < F.lit(threshold))
    return (
        nil.withColumn("surface_form_norm", norm)
        .groupBy("surface_form_norm")
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .select(
            F.concat(F.lit(id_prefix), F.col("surface_form_norm")).alias(
                "entity_id"
            ),
            "surface_form_norm",
            "n_mentions",
            "n_docs",
        )
    )


def align_entities(
    new_entities: DataFrame,
    kb_entities: DataFrame,
    new_name: str = "surface_form_norm",
    kb_name: str = "name",
    max_edits: int = 2,
) -> DataFrame:
    """sameAs alignment: best KB match for each emerging entity — the KB-
    fusion step after NIL clustering (link the discovered entities back
    before minting duplicates; the blocked edit-distance baseline of the
    entity-resolution literature, e.g. Koudas et al., SIGMOD 2006
    tutorial).

    Blocking: candidate pairs must share the first character and differ
    in length by at most 1 — the quadratic verify only ever runs inside
    a (char, ±1 length) block, never corpus × KB. Verify: levenshtein
    <= max_edits. Best match per new entity = min distance, ties to the
    lexicographically smallest KB name (deterministic).

    Returns (new_name, kb_match, edit_distance); unmatched entities are
    absent (left to mint new ids)."""
    n = new_entities.select(F.col(new_name).alias("_new")).distinct()
    k = kb_entities.select(F.col(kb_name).alias("_kb")).distinct()
    blocked = n.join(
        k,
        (F.substring("_new", 1, 1) == F.substring("_kb", 1, 1))
        & (
            F.abs(F.length("_new") - F.length("_kb")) <= F.lit(1)
        ),
    )
    verified = blocked.withColumn(
        "edit_distance", F.levenshtein("_new", "_kb")
    ).filter(F.col("edit_distance") <= F.lit(max_edits))
    w = Window.partitionBy("_new").orderBy(
        F.asc("edit_distance"), F.asc("_kb")
    )
    return (
        verified.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_new").alias(new_name),
            F.col("_kb").alias("kb_match"),
            "edit_distance",
        )
    )


def predicate_alignment(
    kb1: DataFrame,
    kb2: DataFrame,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Cross-KB predicate matching (the relation-alignment half of PARIS,
    Suchanek et al., VLDB 2012 §5.2, simplified to instance-pair Jaccard):
    two predicates align when they relate largely the same (subj, obj)
    pairs — the signal that lets a merged KB collapse kb1:<locatedIn>
    onto kb2:<inNation> without schema input.

    -> (pred1, pred2, overlap, n1, n2, jaccard) for pairs with
    jaccard >= min_jaccard.

    Scale shape: one shuffle on (subj, obj) for the instance-pair
    equi-join — never pred x pred; predicates that share no instance
    pair never meet. Per-predicate pair counts are a map-side-combinable
    groupBy, broadcast back onto the (tiny) alignment result.
    """
    p1 = kb1.select(
        F.col("pred").alias("pred1"), "subj", "obj"
    ).distinct()
    p2 = kb2.select(
        F.col("pred").alias("pred2"), "subj", "obj"
    ).distinct()
    inter = (
        p1.join(p2, ["subj", "obj"])
        .groupBy("pred1", "pred2")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    n1 = p1.groupBy("pred1").agg(F.count(F.lit(1)).alias("n1"))
    n2 = p2.groupBy("pred2").agg(F.count(F.lit(1)).alias("n2"))
    return (
        inter.join(F.broadcast(n1), "pred1")
        .join(F.broadcast(n2), "pred2")
        .withColumn(
            "_j",
            F.col("overlap") / (F.col("n1") + F.col("n2") - F.col("overlap")),
        )
        # gate on the RAW ratio, round only for output — a value that
        # rounds up across the threshold must not flip the decision
        .filter(F.col("_j") >= F.lit(min_jaccard))
        .select(
            "pred1", "pred2", "overlap", "n1", "n2",
            F.round(F.col("_j"), 6).alias("jaccard"),
        )
    )


def subsumption_mining(
    triples: DataFrame,
    type_pred: str = "rdf:type",
    min_support: int = 2,
    min_confidence: float = 0.95,
) -> DataFrame:
    """Class-subsumption induction from instance overlap (the schema-
    discovery step of ontology learning, Völker & Niepert "Statistical
    Schema Induction", ESWC 2011): B ⊑ A is proposed when nearly every
    instance of B is also typed A — conf = |B ∩ A| / |B| — turning flat
    extraction types into a class hierarchy without a hand ontology.

    -> (subcls, supercls, support, confidence) with support = |B ∩ A|,
    conf >= min_confidence, support >= min_support, B != A. Symmetric
    pairs (conf 1.0 both ways) surface as two rows — equivalence, the
    caller's call.

    Scale shape: one self-equi-join of the type table on the INSTANCE
    key (never class x class), then a class-pair groupBy; class
    cardinalities broadcast. Type tables are the smallest fact slice of
    any KB, and instances with t types emit t² join rows — bounded by
    the type-set size, not the KB.
    """
    inst = (
        triples.filter(F.col("pred") == type_pred)
        .select(F.col("subj").alias("_i"), F.col("obj").alias("cls"))
        .distinct()
    )
    sizes = inst.groupBy("cls").agg(F.count(F.lit(1)).alias("_n"))
    pairs = (
        inst.select("_i", F.col("cls").alias("subcls"))
        .join(inst.select("_i", F.col("cls").alias("supercls")), "_i")
        .filter(F.col("subcls") != F.col("supercls"))
        .groupBy("subcls", "supercls")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("cls").alias("subcls"), "_n")),
            "subcls",
        )
        .withColumn("_c", F.col("support") / F.col("_n"))
        # gate on the RAW ratio, round only for output (same rule as
        # predicate_alignment)
        .filter(
            (F.col("support") >= F.lit(min_support))
            & (F.col("_c") >= F.lit(min_confidence))
        )
        .select(
            "subcls", "supercls", "support",
            F.round(F.col("_c"), 6).alias("confidence"),
        )
    )


def best_labels(
    triples: DataFrame,
    label_pred: str = "rdfs:label",
    lang_priority: tuple[str, ...] = ("en",),
) -> DataFrame:
    """One display label per entity by language preference — the
    DBpedia-export convention (every resource page shows exactly one
    rdfs:label, chosen by the requester's language chain) applied to a
    multilingual literal table: rank = first RFC-4647 range in
    ``lang_priority`` the label's tag matches (functions/rdfterm.
    lang_matches), untagged/unmatched labels rank after every preferred
    range; ties (two en labels) break on the lexicographic term so the
    winner is deterministic across runs and engines.

    One window row_number per subject — the standard top-1-per-key
    shape, shuffle keyed on the entity, no global sort.
    -> (subj, label, lang) with the literal content unquoted.
    """
    from ..functions.rdfterm import lang_matches, term_lang, term_value

    labels = triples.filter(F.col("pred") == label_pred).select(
        "subj",
        term_value(F.col("obj")).alias("label"),
        term_lang(F.col("obj")).alias("lang"),
        F.col("obj").alias("_term"),
    )
    rank = F.lit(len(lang_priority))
    for i, rng in reversed(list(enumerate(lang_priority))):
        rank = F.when(lang_matches(F.col("lang"), rng), F.lit(i)).otherwise(
            rank
        )
    w = Window.partitionBy("subj").orderBy(rank.asc(), F.col("_term").asc())
    return (
        labels.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("subj", "label", "lang")
    )


def nil_context_clusters(
    annotations: DataFrame,
    score_col: str = "prior",
    threshold: float = 0.5,
    min_shared_tokens: int = 2,
    id_prefix: str = "NEW:",
) -> DataFrame:
    """Context-aware NIL clustering — the refinement of
    emerging_entities' surface-form-only baseline: two NIL mentions of
    the SAME normalized surface form are the same new entity only when
    their document contexts share >= min_shared_tokens distinct tokens
    (the TAC-KBP NIL-clustering task: "Paris" the person must not merge
    with "Paris" the city just because the strings match). Pairs come
    ONLY from the (surface, token) blocked self-join — never mention ×
    mention — then union-find via the pointer-doubling min-label
    components (datapipe.dedup.connected_components, O(log diameter)
    rounds), so the shape survives a mention table of any size with
    bounded per-(surface, token) blocks.

    ``annotations``: mention rows with doc_id, pos, surface_form, a
    toks array column (the mention's context tokens) and ``score_col``;
    rows below ``threshold`` are the NIL mentions.

    -> (mention_id, doc_id, pos, surface_form_norm, cluster_id) — one
    row per NIL mention; cluster_id = id_prefix + surface + '#' + the
    lexicographically least mention id of its component (singletons
    label themselves), deterministic across runs and engines.
    """
    from ..datapipe.dedup import connected_components

    norm = F.regexp_replace(
        F.lower(F.trim(F.col("surface_form"))), r"\s+", " "
    )
    nil = (
        annotations.filter(F.col(score_col) < F.lit(threshold))
        .select(
            F.concat_ws("\x1f", F.col("doc_id"), F.col("pos")).alias(
                "mention_id"
            ),
            "doc_id",
            "pos",
            norm.alias("surface_form_norm"),
            F.array_distinct(F.col("toks")).alias("_toks"),
        )
    )
    mt = nil.select(
        "mention_id",
        "surface_form_norm",
        F.explode("_toks").alias("_tok"),
    )
    pairs = (
        mt.alias("a")
        .join(
            mt.alias("b"),
            (F.col("a.surface_form_norm") == F.col("b.surface_form_norm"))
            & (F.col("a._tok") == F.col("b._tok"))
            & (F.col("a.mention_id") < F.col("b.mention_id")),
        )
        .groupBy(
            F.col("a.mention_id").alias("a"),
            F.col("b.mention_id").alias("b"),
        )
        .agg(F.count("*").alias("_shared"))
        .filter(F.col("_shared") >= min_shared_tokens)
        .select("a", "b")
    )
    comp = connected_components(pairs).select(
        F.col("doc_id").alias("mention_id"), F.col("component")
    )
    return (
        nil.join(comp, "mention_id", "left")
        .select(
            "mention_id",
            "doc_id",
            "pos",
            "surface_form_norm",
            F.concat(
                F.lit(id_prefix),
                F.col("surface_form_norm"),
                F.lit("#"),
                F.coalesce(F.col("component"), F.col("mention_id")),
            ).alias("cluster_id"),
        )
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    key_col: str = "label",
    id_col: str = "uri",
    window: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernández &
    Stolfo, SIGMOD '95): sort all records by a blocking key (normalized
    name, sort-key concatenation, ...) and emit every pair closer than
    `window` positions in that global order — the classic complement to
    the equality blocking in align_entities, catching near-misses whose
    keys are unequal but ADJACENT ('Jon Smith' | 'John Smith').

    -> (a, b, key_a, key_b, gap) with rank(a) < rank(b), gap = rank
    difference in [1, window).

    Scale shape: the global rank is a distributed prefix sum (the
    prefix_token_offsets idiom — range repartition on (key, id),
    per-partition row_number, plus per-partition offsets collected as P
    scalars), NEVER a single-partition global window; candidate pairs
    come from TWO equi-joins on floor(rank/window) (own block + next
    block — every pair closer than `window` spans at most one boundary)
    filtered to the rank band, so the join fan-out per record is
    bounded by 2·window regardless of corpus size or key skew.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    sess = records.sparkSession
    if partitions is None:
        partitions = int(sess.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = (
        records.select(
            F.col(id_col).alias("_id"), F.col(key_col).alias("_key")
        )
        .distinct()
        .repartitionByRange(partitions, F.col("_key"), F.col("_id"))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sums = dict(parts.groupBy("_pid").agg(F.count("*").alias("n")).collect())
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    offset_expr = (
        F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
                F.col("_pid"),
            ),
            F.lit(0),
        )
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_pid").orderBy("_key", "_id")
    ranked = parts.withColumn(
        "_rank",
        (F.row_number().over(w) - 1 + offset_expr).cast("long"),
    ).withColumn("_blk", F.floor(F.col("_rank") / F.lit(window)))
    a = ranked.select(
        F.col("_id").alias("a"), F.col("_key").alias("key_a"),
        F.col("_rank").alias("_ra"), F.col("_blk").alias("_ba"),
    )
    b = ranked.select(
        F.col("_id").alias("b"), F.col("_key").alias("key_b"),
        F.col("_rank").alias("_rb"), F.col("_blk").alias("_bb"),
    )
    same = a.join(b, a["_ba"] == b["_bb"])
    nxt = a.join(b, a["_ba"] + 1 == b["_bb"])
    return (
        same.unionByName(nxt)
        .withColumn("gap", F.col("_rb") - F.col("_ra"))
        .filter((F.col("gap") > 0) & (F.col("gap") < window))
        .select("a", "b", "key_a", "key_b", "gap")
    )


def edit_distance_join(
    records: DataFrame,
    name_col: str = "label",
    id_col: str = "uri",
    max_edits: int = 1,
    q: int = 2,
) -> DataFrame:
    """LOSSLESS edit-distance self-join via q-gram prefix filtering
    (Ed-Join, Xiao/Wang/Lin VLDB '08 + the Vernica/Chaudhuri prefix
    principle): all (a, b) pairs with levenshtein(name_a, name_b)
    <= max_edits — the exact upgrade over align_entities' first-char
    blocking, which silently loses any match whose FIRST character was
    the edit.

    Why it is lossless: pad each name with q-1 sentinels, take its
    DISTINCT q-gram set; one edit destroys at most q gram types, so
    tau edits leave |G(a) \\ G(b)| <= tau*q — each string's signature =
    its (tau*q + 1) globally RAREST grams (one global frequency
    ordering), and any within-distance pair must share a signature
    gram. Candidates therefore form only on rare grams (the skew
    resistance of prefix_filter_jaccard_join, same design), then
    levenshtein verifies exactly; a length filter prunes first.

    -> (a, b, name_a, name_b, dist) with a < b by id.

    Scale shape: grams explode (len+q-1 per name), ONE frequency
    groupBy, a per-name window keeps tau*q+1 rarest (constant!), the
    candidate equi-join keys on signature grams, pairs dedupe on bare
    ids, and the verify is codegen levenshtein on the joined-back
    names. No all-pairs stage anywhere; common grams never create
    buckets by construction.
    """
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1")
    if q < 2:
        raise ValueError("q must be >= 2")
    sig_len = max_edits * q + 1
    pad = "\x01" * (q - 1)
    base = records.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_name")
    ).distinct()
    padded = base.withColumn(
        "_p", F.concat(F.lit(pad), F.col("_name"), F.lit(pad))
    )
    grams = padded.select(
        "_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(_p) - {q - 1}), "
                    f"i -> substr(_p, i, {q}))"
                )
            )
        ).alias("gram"),
    )
    freq = grams.groupBy("gram").agg(F.count("*").alias("_gf"))
    w = Window.partitionBy("_id").orderBy(F.asc("_gf"), F.asc("gram"))
    sig = (
        grams.join(freq, "gram")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= sig_len)
        .select("_id", "gram")
    )
    cand = (
        sig.select(F.col("_id").alias("a"), "gram")
        .join(sig.select(F.col("_id").alias("b"), "gram"), "gram")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    na = base.select(F.col("_id").alias("a"), F.col("_name").alias("name_a"))
    nb = base.select(F.col("_id").alias("b"), F.col("_name").alias("name_b"))
    return (
        cand.join(na, "a")
        .join(nb, "b")
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_edits
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_edits)
        .select("a", "b", "name_a", "name_b", "dist")
    )


def fellegi_sunter_score(
    pairs: DataFrame,
    fields: list[str],
    m: dict[str, float],
    u: dict[str, float],
    threshold: float | None = None,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA 1969 — the
    decision layer every serious ER system still runs on top of its
    blockers): each candidate pair carries per-field agreement flags;
    its match weight is the sum of log-likelihood ratios, ln(m_i/u_i)
    for agreeing fields and ln((1-m_i)/(1-u_i)) for disagreeing ones
    (m_i = P(agree | match), u_i = P(agree | non-match) — estimate u
    from random pairs, m from labeled pairs or EM upstream).

    ``pairs``: (a, b, <field>_agree boolean ...) — the output shape of
    the blockers above (edit_distance_join / sorted_neighborhood_pairs
    feed it after per-field comparison); ``fields``: comparison names;
    ``m``/``u``: per-field probabilities in (0,1), validated.
    ``threshold``: if set, keep only pairs with weight >= threshold.

    -> (a, b, <field>_agree ..., weight round 6).

    Scale shape: PURE per-row codegen — a constant-folded CASE sum, no
    join, no shuffle, no collect; the expensive part of ER stays in
    the blockers, exactly where the literature puts it.
    """
    import math

    if not fields:
        raise ValueError("fellegi_sunter_score needs >= 1 field")
    for f in fields:
        for d, nm in ((m, "m"), (u, "u")):
            v = d.get(f)
            if v is None or not (0.0 < v < 1.0):
                raise ValueError(f"{nm}[{f!r}] must be in (0, 1)")
    w = F.lit(0.0)
    for f in fields:
        agree = math.log(m[f] / u[f])
        disagree = math.log((1.0 - m[f]) / (1.0 - u[f]))
        w = w + F.when(F.col(f"{f}_agree"), F.lit(agree)).otherwise(
            F.lit(disagree)
        )
    out = pairs.withColumn("weight", F.round(w, 6))
    if threshold is not None:
        out = out.filter(F.col("weight") >= threshold)
    return out
