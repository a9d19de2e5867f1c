"""PII scrubbing — the standard pre-training redaction pass (emails,
IPv4 addresses, phone numbers) as pure-codegen expressions.

Patterns are RE2-safe by construction (no lookaround, no backreferences,
ASCII classes only) so the DuckDB oracle runs the IDENTICAL patterns;
replacement is sequential in a fixed documented order (email -> ipv4 ->
phone) in BOTH engines, which makes overlap behavior deterministic
(digits inside an already-redacted email/IP can't re-match as a phone).

Map-only, row-local, no shuffle, no Python — at 100 TB this is a free
rider on whatever scan already touches the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters and is part of the contract
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
)


def scrub_pii(text: Column | str = "text") -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    s = F.col(text) if isinstance(text, str) else text
    for _, pattern, repl in PII_PATTERNS:
        s = F.regexp_replace(s, pattern, repl)
    return s


def pii_counts(text: Column | str = "text") -> dict[str, Column]:
    """Per-kind match counts over the ORIGINAL text (before scrubbing),
    keyed by pattern name."""
    s = F.col(text) if isinstance(text, str) else text
    return {
        name: F.size(F.regexp_extract_all(s, F.lit(pattern), 0))
        for name, pattern, _ in PII_PATTERNS
    }


def scrub_docs(documents: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone, scrubbed_md5) per document."""
    counts = pii_counts(text)
    return documents.select(
        "doc_id",
        *[counts[name].alias(f"n_{name}") for name, _, _ in PII_PATTERNS],
        F.md5(scrub_pii(text)).alias("scrubbed_md5"),
    )


def _sql_quote(pattern: str) -> str:
    # DuckDB single-quoted literals treat backslash literally (standard
    # conforming strings) — only quotes need doubling
    return pattern.replace("'", "''")


def scrub_pii_sql(expr: str) -> str:
    """DuckDB rendering of the identical sequential replacement."""
    s = expr
    for _, pattern, repl in PII_PATTERNS:
        s = f"regexp_replace({s}, '{_sql_quote(pattern)}', '{repl}', 'g')"
    return s


def scrub_docs_sql(text_select: str) -> str:
    """Oracle over ``text_select`` (SELECT producing doc_id + text)."""
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{_sql_quote(p)}')) AS n_{name}"
        for name, p, _ in PII_PATTERNS
    )
    return f"""
SELECT doc_id, {counts}, md5({scrub_pii_sql('text')}) AS scrubbed_md5
FROM ({text_select}) ORDER BY doc_id
"""
