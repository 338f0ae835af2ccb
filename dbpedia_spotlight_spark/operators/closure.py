"""Redirect transitive closure + disambiguation-page exclusion — M8/M9 in
SURVEY.md §2.6 (canonicalization; core to the north rule).

Reference: WikipediaToDBpediaClosure
(index/src/main/scala/org/dbpedia/spotlight/db/WikipediaToDBpediaClosure.scala):
  - getEndOfChainURI follows redirect chains to a fixpoint, cycle-safe via a
    visited-set (:106-116)
  - URIs in disambiguations.nt are invalid link targets (:100-103)

Spark design: iterative self-join to fixpoint. Redirect chains are short
(<10 hops on Wikipedia), so the loop runs O(log chain) pointer-doubling
iterations; each iteration is one broadcast-able equi-join. Cycle guard: a
node whose chain re-enters itself keeps its last pre-cycle target (the
reference returns the URI seen before revisiting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def redirect_closure(redirects: DataFrame, max_iterations: int = 16) -> DataFrame:
    """redirects(src_uri, dst_uri) -> closure(src_uri, final_uri).

    Pointer doubling: repeatedly rewrite dst with dst's own target until no
    row changes. A cycle member's final target settles on some member of the
    cycle (deterministic; flagged via the `in_cycle` column).
    """
    cur = redirects.select(
        F.col("src_uri"), F.col("dst_uri").alias("final_uri")
    ).withColumn("in_cycle", F.lit(False))

    for _ in range(max_iterations):
        nxt = cur.alias("a").join(
            cur.select(
                F.col("src_uri").alias("_src"),
                F.col("final_uri").alias("_next"),
            ).alias("b"),
            F.col("a.final_uri") == F.col("b._src"),
            "left",
        )
        # cycle guard: if following the chain would return to src, stop there
        stepped = nxt.select(
            F.col("a.src_uri").alias("src_uri"),
            F.when(
                F.col("b._next").isNull() | (F.col("b._next") == F.col("a.src_uri")),
                F.col("a.final_uri"),
            )
            .otherwise(F.col("b._next"))
            .alias("final_uri"),
            (
                F.col("a.in_cycle")
                | (F.coalesce(F.col("b._next"), F.lit("")) == F.col("a.src_uri"))
            ).alias("in_cycle"),
        )
        stepped = stepped.localCheckpoint(eager=True)
        changed = (
            stepped.alias("n")
            .join(cur.alias("o"), "src_uri")
            .filter(F.col("n.final_uri") != F.col("o.final_uri"))
            .limit(1)
            .count()
        )
        cur = stepped
        if changed == 0:
            break
    return cur.select("src_uri", "final_uri", "in_cycle")


def resolve_uris(
    df: DataFrame,
    closure: DataFrame,
    uri_col: str = "uri",
    disambiguations: DataFrame | None = None,
    drop_disambiguations: bool = True,
) -> DataFrame:
    """Canonicalize a URI column through the redirect closure; optionally drop
    rows whose final target is a disambiguation page (ref :100-103 throws
    NotADBpediaResourceException -> the sources skip those rows)."""
    cl = F.broadcast(
        closure.select(
            F.col("src_uri").alias("_cl_src"), F.col("final_uri").alias("_cl_dst")
        )
    )
    out = (
        df.join(cl, df[uri_col] == F.col("_cl_src"), "left")
        .withColumn(uri_col, F.coalesce(F.col("_cl_dst"), F.col(uri_col)))
        .drop("_cl_src", "_cl_dst")
    )
    if disambiguations is not None and drop_disambiguations:
        dis = disambiguations.select(F.col(disambiguations.columns[0]).alias(uri_col))
        out = out.join(F.broadcast(dis), uri_col, "left_anti")
    return out
