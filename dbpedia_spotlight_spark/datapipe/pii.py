"""PII scrubbing for training-data pipelines — masks emails, URLs, IPv4
addresses and phone numbers with typed placeholder tokens, plus per-doc
match counts. Pure `regexp_replace` / `regexp_extract_all` column chains
(JVM-side, whole-stage codegen) — no UDFs, so the scrub runs at scan
speed and pushes down through Catalyst like any other projection.

Pattern notes for the 100-TB path:
  - All patterns are RE2-safe (no lookarounds/backrefs), so the exact same
    strings run under Java regex (Spark) and RE2 (DuckDB oracle) with
    identical match semantics — the driver hash-checks this.
  - Replacement ORDER is load-bearing: URLs first (an email-shaped string
    inside a URL path must become part of <URL>, not <EMAIL>), then
    emails, then IPv4 (before phones — a dotted quad contains digit runs a
    phone pattern would otherwise swallow), then phones.
  - Masking is idempotent: placeholder tokens contain no characters any
    pattern matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — applied in order; see module docstring.
PII_PATTERNS = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}([ -][0-9]{2,4})?", "<PHONE>"),
]


def scrub_pii(text: Column) -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict:
    """{kind: count-column} of matches per category, counted on the text as
    it looks when that pattern runs in the scrub chain (so an email inside
    a URL counts as URL, not email — counts always agree with the scrub)."""
    counts = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, repl)
    return counts


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, n_url, n_email, n_ipv4, n_phone, scrubbed). One narrow
    projection; at 100 TB this fuses into whatever scan feeds it."""
    t = F.col(text_col)
    counts = pii_counts(t)
    return df.select(
        F.col(id_col),
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
        scrub_pii(t).alias("scrubbed"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """Privacy audit of a release candidate (Sweeney 2002; Machanavajjhala
    et al. 2007) -> one row per quasi-identifier equivalence class:
    (quasi_cols..., class_size, k_anonymous, l_diversity, l_diverse).

    An equivalence class is the set of rows sharing all quasi-identifier
    values; the table is k-anonymous iff every class has >= k rows, and a
    class is l-diverse (distinct-l-diversity) iff its sensitive column
    takes >= l distinct values (reported l = the class's distinct count,
    `l_diverse` against l = 2 — the homogeneity-attack floor). The two
    checks a training-data pipeline runs before releasing any
    user-derived table.

    One groupBy on the quasi-identifier tuple, count + count_distinct —
    map-side-combinable, one shuffle, no UDF. At 100 TB the class count
    is bounded by the QI-domain product, not the row count.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").cast("long").alias("class_size"),
            F.countDistinct(sensitive_col).cast("long").alias("l_diversity"),
        )
        .select(
            *quasi_cols,
            "class_size",
            (F.col("class_size") >= k).alias("k_anonymous"),
            "l_diversity",
            (F.col("l_diversity") >= 2).alias("l_diverse"),
        )
    )


def k_suppress(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    placeholder: str = "*",
) -> DataFrame:
    """Enforce k-anonymity by SUPPRESSION: rows whose quasi-identifier
    class has fewer than k members get every (string-cast) quasi column
    replaced by `placeholder`, merging them into one opaque class; rows
    in large-enough classes pass through unchanged. The simplest of the
    standard mechanisms (suppression vs. generalization hierarchies) and
    the one that needs no per-column taxonomy.

    Plan: the under-k class list is an aggregate bounded by the class
    count, broadcast back as a left-semi-style membership flag via a
    left join on the QI tuple — the input is scanned once and never
    shuffled (the small side moves). Column order is preserved; quasi
    columns come back as strings (the shared suppressed domain).

    The join is NULL-SAFE on every quasi column (eqNullSafe): groupBy
    keeps NULL-valued QI groups, so an under-k class whose key contains
    NULL must match its rows back — a null-unsafe join would let exactly
    those rows through unmasked while k_anonymity_report still counts
    them as violations (r4 advisory).
    """
    classes = (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") < k)
        .select(
            *[F.col(c).alias(f"_qi_{c}") for c in quasi_cols],
            F.lit(True).alias("_suppress"),
        )
    )
    cond = F.lit(True)
    for c in quasi_cols:
        cond = cond & df[c].eqNullSafe(F.col(f"_qi_{c}"))
    joined = df.join(F.broadcast(classes), cond, "left")
    out_cols = []
    for c in df.columns:
        if c in quasi_cols:
            out_cols.append(
                F.when(F.col("_suppress"), F.lit(placeholder))
                .otherwise(df[c].cast("string"))
                .alias(c)
            )
        else:
            out_cols.append(df[c])
    return joined.select(*out_cols)
