"""PII detection and redaction for training corpora — the scrub step of
every production LLM data pipeline (Dolma's pii taggers, CCNet/BigScience
PII filters): count and mask emails, IPv4 addresses, US-SSN-shaped ids,
and phone-shaped digit runs.

Pattern discipline: Java regex (Spark), RE2 (DuckDB twin), and Python
`re` must all agree, so patterns use ONLY the portable subset — character
classes, bounded repetition, non-capturing groups, `\\b` — no lookaround,
no backreferences. Detection is pattern-shaped by design (exactly like
the deployed pipelines): a 16-digit run redacts whether or not it
Luhn-validates; precision tuning is corpus policy, the operator is the
mechanism.

Scale shape: both ops are stateless whole-stage-codegen column
expressions — zero shuffle, zero Python, a 10^12-row scrub is one map
pass. Redaction order is pinned (email → ssn → ipv4 → phone, most- to
least-specific) so the greedy phone pattern can never eat an address
that a more specific pattern owns; counts are computed BEFORE any
masking, all from the same projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_DP = 5

# (name, pattern, replacement) — order is the REDACTION order (most to
# least specific); patterns restricted to the Java∩RE2∩Python subset
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\-]{7,14}\d\b", "<PHONE>"),
)


def pii_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc PII hit counts: (doc_id, n_email, n_ssn, n_ipv4, n_phone,
    n_pii). Counts are measured on the ORIGINAL text per pattern (a doc's
    email also containing digits is one email, not also a phone — each
    count is independent, matching how pipeline audits report them)."""
    cols = [F.col(id_col).alias("doc_id")]
    total = F.lit(0)
    for name, pat, _ in PII_PATTERNS:
        c = F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        cols.append(c.cast("long").alias(f"n_{name}"))
        total = total + c
    cols.append(total.cast("long").alias("n_pii"))
    return df.select(*cols)


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Mask every PII hit with its typed placeholder, in the pinned
    most-specific-first order. Returns the input columns with ``out_col``
    (default: ``text_col`` replaced in place) holding the scrubbed text."""
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    out = out_col or text_col
    return df.withColumn(out, scrubbed)


def pii_counts_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``pii_counts`` — same patterns, RE2 dialect."""
    cols = [f"{id_col} AS doc_id"]
    total = []
    for name, pat, _ in PII_PATTERNS:
        c = f"len(regexp_extract_all({text_col}, '{pat}'))"
        cols.append(f"{c}::BIGINT AS n_{name}")
        total.append(c)
    cols.append(f"({' + '.join(total)})::BIGINT AS n_pii")
    return f"SELECT {', '.join(cols)} FROM {table}"


def redact_pii_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``redact_pii`` (global-flag regexp_replace, same
    pinned order)."""
    expr = text_col
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"SELECT {id_col} AS doc_id, {expr} AS text FROM {table}"
