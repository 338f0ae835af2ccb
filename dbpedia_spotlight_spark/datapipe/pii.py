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
