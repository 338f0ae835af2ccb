"""RDF structural forms: collections (rdf:first/rdf:rest lists) and
statement reification (rdf:Statement) — the two RDF 1.1 idioms a KG
construction pipeline meets when ingesting real RDF (ordered author
lists, provenance-annotated facts).

Reference context: the reference emits and consumes plain triples
(core/src/main/scala/org/dbpedia/spotlight/model/Factory.scala builds
flat resource objects; its NIF output is unordered). Collections and
reification are the standard W3C encodings (RDF 1.1 Concepts §5.2,
RDF Schema §5.3) a Spotlight user hits the moment their KB carries
ordered structures, so the engine supports both directions natively.

Scale shape: list flattening is min-plus repeated squaring over the
rdf:rest successor relation — a length-L list costs O(log L) self-join
rounds, never L — and reification is a generate-only projection
(4 rows per fact, no shuffle beyond the final distinct). Everything is
whole-stage-codegen column ops; no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_FIRST = "rdf:first"
RDF_REST = "rdf:rest"
RDF_NIL = "rdf:nil"
RDF_TYPE = "rdf:type"
RDF_STATEMENT = "rdf:Statement"
RDF_SUBJECT = "rdf:subject"
RDF_PREDICATE = "rdf:predicate"
RDF_OBJECT = "rdf:object"


def rdf_list_members(
    triples: DataFrame,
    first: str = RDF_FIRST,
    rest: str = RDF_REST,
    nil: str = RDF_NIL,
    max_iterations: int = 16,
) -> DataFrame:
    """Flatten every rdf:first/rdf:rest collection in a (subj, pred, obj)
    triple table to (head, pos, member) rows, pos 0-based from the list
    head cons cell.

    Plan: the rdf:rest successor edges form disjoint chains; min-plus
    repeated squaring ((a,b,d) ∪ min(d1+d2) over the composed relation)
    reaches every (cell, descendant-cell, distance) pair of a length-L
    list in ceil(log2 L) join rounds. Heads are cells that are not the
    object of any rest edge (left-anti join); positions come from the
    head->cell distance joined with that cell's rdf:first member.
    Malformed cyclic lists converge too (distances are min-aggregated),
    but their rows are dropped with the heads anti-join — a cycle has no
    head. Bounded at 2**max_iterations elements.
    """
    rest_e = (
        triples.filter((F.col("pred") == rest) & (F.col("obj") != nil))
        .select(F.col("subj").alias("a"), F.col("obj").alias("b"))
        .distinct()
    )
    first_e = triples.filter(F.col("pred") == first).select(
        F.col("subj").alias("cell"), F.col("obj").alias("member")
    )

    # identity (cell reaches itself at distance 0) seeds the closure so a
    # head's own rdf:first lands at pos 0 without a special case
    cells = (
        rest_e.select(F.col("a").alias("cell"))
        .unionByName(rest_e.select(F.col("b").alias("cell")))
        .unionByName(first_e.select("cell"))
        .distinct()
    )
    reach = cells.select(
        F.col("cell").alias("a"), F.col("cell").alias("b"), F.lit(0).alias("d")
    ).unionByName(rest_e.withColumn("d", F.lit(1)))

    for _ in range(max_iterations):
        stepped = (
            reach.alias("x")
            .join(
                reach.select(
                    F.col("a").alias("_m"),
                    F.col("b").alias("b2"),
                    F.col("d").alias("d2"),
                ).alias("y"),
                F.col("x.b") == F.col("y._m"),
            )
            .select(
                F.col("x.a").alias("a"),
                F.col("y.b2").alias("b"),
                (F.col("x.d") + F.col("y.d2")).alias("d"),
            )
        )
        nxt = (
            reach.unionByName(stepped)
            .groupBy("a", "b")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == reach.count():
            reach = nxt
            break
        reach = nxt

    heads = cells.join(
        rest_e.select(F.col("b").alias("cell")).distinct(), "cell", "left_anti"
    )
    return (
        heads.select(F.col("cell").alias("head"))
        .join(reach, F.col("head") == F.col("a"))
        .join(first_e, reach["b"] == first_e["cell"])
        .select(
            "head", F.col("d").cast("int").alias("pos"), "member"
        )
    )


def reify_statements(triples: DataFrame, id_prefix: str = "stmt:") -> DataFrame:
    """Encode each distinct (subj, pred, obj) fact as the four standard
    reification triples (RDF Schema §5.3): the statement node gets a
    deterministic content-addressed id (md5 of the fact with unit
    separators, collision-free for terms without 0x1f), so reification
    is idempotent and reproducible across runs/partitions."""
    base = triples.select("subj", "pred", "obj").distinct()
    sid = F.concat(
        F.lit(id_prefix),
        F.md5(F.concat_ws("\x1f", F.col("subj"), F.col("pred"), F.col("obj"))),
    ).alias("subj")

    def leg(p: str, o) -> DataFrame:
        return base.select(sid, F.lit(p).alias("pred"), o.alias("obj"))

    return (
        leg(RDF_TYPE, F.lit(RDF_STATEMENT))
        .unionByName(leg(RDF_SUBJECT, F.col("subj")))
        .unionByName(leg(RDF_PREDICATE, F.col("pred")))
        .unionByName(leg(RDF_OBJECT, F.col("obj")))
    )


def unreify_statements(reified: DataFrame) -> DataFrame:
    """Invert reify_statements: collapse rdf:subject/predicate/object legs
    back to (subj, pred, obj) facts. One groupBy on the statement node
    (map-side combinable max-of-when pivot, no join); statements missing
    any of the three legs are dropped, so partial/foreign reifications
    can't fabricate facts."""
    legs = reified.filter(
        F.col("pred").isin(RDF_SUBJECT, RDF_PREDICATE, RDF_OBJECT)
    )
    pivot = legs.groupBy(F.col("subj").alias("stmt")).agg(
        F.max(F.when(F.col("pred") == RDF_SUBJECT, F.col("obj"))).alias("subj"),
        F.max(F.when(F.col("pred") == RDF_PREDICATE, F.col("obj"))).alias("pred"),
        F.max(F.when(F.col("pred") == RDF_OBJECT, F.col("obj"))).alias("obj"),
    )
    return (
        pivot.filter(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        .select("subj", "pred", "obj")
        .distinct()
    )
