"""PII detection and redaction — the privacy pass of a training-data
pipeline (count PII occurrences per document, rewrite text with typed
placeholder tokens before the corpus ships).

100% Spark built-ins (`regexp_count` / `regexp_replace`, JVM-side,
one narrow stage, no shuffle) and fully SQL-expressible, so the
DuckDB oracle replays it bit-for-bit. Every pattern is RE2-safe (no
lookbehind, no pattern-side backrefs) because the SAME string runs in
Java regex (Spark) and RE2 (DuckDB) — the repo-wide oracle-regex rule.

Pattern scope is deliberately conservative/deterministic (regex
families, not ML NER): emails, IPv4 literals, US-style SSNs and phone
numbers, 16-digit payment-card shapes. False positives are expected
and fine for a redaction pass; recall on these shapes is exact.

Frozen semantics:
- counts are non-overlapping left-to-right matches per family,
  counted INDEPENDENTLY on the original text (family A's redaction
  never hides family B's count);
- redaction applies the families in FAMILY_ORDER, each replacing all
  of its matches with ``[<FAMILY>]``; because earlier replacements
  insert ``[`` / ``]`` (never digits/@), later families cannot match
  across a placeholder, so order only matters where raw patterns
  overlap (SSN vs phone differ in group widths and cannot co-match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# family -> RE2-safe pattern (shared verbatim with the DuckDB oracle)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
}

# redaction application order (frozen; counts are order-independent)
FAMILY_ORDER: tuple[str, ...] = ("email", "ipv4", "ssn", "phone", "card")


def redacted_col(text: Column) -> Column:
    """Text with every PII family replaced by its ``[FAMILY]`` token."""
    out = text
    for fam in FAMILY_ORDER:
        out = F.regexp_replace(
            out, PII_PATTERNS[fam], f"[{fam.upper()}]"
        )
    return out


def pii_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_ssn, n_phone, n_card, has_pii) —
    per-family non-overlapping match counts on the raw text."""
    c = F.col(text_col)
    counts = {
        fam: F.regexp_count(c, F.lit(pat)).cast("long")
        for fam, pat in PII_PATTERNS.items()
    }
    total = None
    for fam in FAMILY_ORDER:
        total = counts[fam] if total is None else total + counts[fam]
    return df.select(
        id_col,
        *[counts[fam].alias(f"n_{fam}") for fam in FAMILY_ORDER],
        (total > 0).alias("has_pii"),
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, text_redacted) — typed-placeholder rewrite, one narrow
    projection (the 100 TB shape: no shuffle, no UDF, codegen'd)."""
    return df.select(
        id_col, redacted_col(F.col(text_col)).alias("text_redacted")
    )
