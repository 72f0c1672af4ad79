"""O82 — PII detection and redaction for training-data pipelines.

Standard pre-training scrub (emails, phone numbers, IPv4, SSN-shaped
ids — the pattern families the public C4 / Dolma / FineWeb pipelines
redact).  Everything is `regexp_replace` / `regexp_count` on JVM-side
columns: whole-stage codegen, no UDF, linear in bytes scanned — at
100 TB the scrub rides the same single pass as extraction.

Pattern discipline: RE2-compatible (no lookaround, no backreferences in
the MATCH side), so the same pattern string runs identically under
Spark's Java regex, DuckDB's RE2 (the oracle), and Go/Rust scrubbers —
oracle-gating the redacted STRINGS would be impossible otherwise.
Replacement syntax differs per engine (Java ``$1`` vs RE2 ``\\1``);
callers of the oracle SQL write theirs, this module writes Java's.

Redaction policy (documented, deliberate):
- emails → ``<EMAIL>``  (full drop: usernames are identifying)
- IPv4   → ``<IP>``     (full drop)
- SSN-shaped ``ddd-dd-dddd`` → ``<SSN>``
- phones ``ddd-ddd-dddd`` keep the LAST 4 (``XXX-XXX-1234``) — the
  common CS/debugging compromise; pass ``keep_last4=False`` to drop.
Order matters and is fixed: SSN before phone (a phone pattern must not
eat an SSN's tail), email before IP (emails can embed dotted quads).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# match-side patterns: identical semantics in Java regex and RE2
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-(\d{4})\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}

# application order (see module docstring)
_ORDER = ("email", "ssn", "phone", "ipv4")


def pii_count(col: Column | str, kind: str) -> Column:
    """Match count for one pattern family (exact integer, hash-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind]))


def pii_redact(col: Column | str, keep_last4: bool = True) -> Column:
    """All four families redacted in the fixed order."""
    c = F.col(col) if isinstance(col, str) else col
    repl = {
        "email": "<EMAIL>",
        "ssn": "<SSN>",
        "phone": "XXX-XXX-$1" if keep_last4 else "<PHONE>",
        "ipv4": "<IP>",
    }
    for kind in _ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[kind], repl[kind])
    return c


def with_pii_stats(df, text_col: str, out_col: str = "text_redacted"):
    """Scrub ``text_col`` and attach per-family match counts — the
    audit columns a pipeline persists alongside the cleaned text."""
    return df.withColumn(out_col, pii_redact(text_col)).select(
        "*",
        *(pii_count(text_col, k).alias(f"n_{k}") for k in _ORDER),
    )
