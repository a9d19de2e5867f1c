"""C4-style blocklist-word gate.

C4 (Raffel et al. 2020) drops any page containing a word from a public
blocklist ("List of Dirty, Naughty, Obscene..."); every successor
pipeline (MassiveText, RefinedWeb, FineWeb) keeps some form of the
gate. The operator contract is a word-boundary match over a
configurable list — the vendored default is a small adult/spam-marker
subset; production callers pass the full list of their policy.

Implementation is one ``regexp_count`` over the lowered text with a
single alternation pattern — pure JVM whole-stage codegen, zero
shuffle, and the pattern is RE2-safe (no backreferences, ASCII ``\\b``)
so the DuckDB oracle runs the IDENTICAL pattern (the ``ops.pii`` /
``ops.boilerplate`` cross-engine recipe). Scale shape: map-only;
at 100 TB this is scan-bound like every other gate in
``pipeline/run.prepare_docs``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# adult/spam markers, C4-gate style; deterministic order
DEFAULT_BLOCKLIST = (
    "casino",
    "escort",
    "jackpot",
    "nude",
    "porn",
    "viagra",
    "xxx",
)


def badword_pattern(words=None) -> str:
    ws = sorted(set(words or DEFAULT_BLOCKLIST))
    for w in ws:
        if re.escape(w) != w:
            raise ValueError(f"blocklist word needs escaping: {w!r}")
    return r"\b(" + "|".join(ws) + r")\b"


def badword_stats(
    documents: DataFrame, words=None, text: str = "text"
) -> DataFrame:
    """Input columns + ``badword_count`` (word-boundary matches over the
    lowered text; 0 for null text) and ``keep`` (C4 semantics: any hit
    drops the page)."""
    pat = badword_pattern(words)
    cnt = F.coalesce(
        F.regexp_count(F.lower(F.col(text)), F.lit(pat)), F.lit(0)
    ).cast("bigint")
    return documents.withColumn("badword_count", cnt).withColumn(
        "keep", F.col("badword_count") == 0
    )


def badword_stats_sql(
    source_select: str, words=None, text: str = "text"
) -> str:
    """DuckDB oracle: the IDENTICAL pattern via regexp_extract_all."""
    pat = badword_pattern(words)
    return f"""
SELECT src.*,
       cast(CASE WHEN {text} IS NULL THEN 0 ELSE
         len(regexp_extract_all(lower({text}), '{pat}')) END AS bigint)
         AS badword_count,
       (CASE WHEN {text} IS NULL THEN 0 ELSE
         len(regexp_extract_all(lower({text}), '{pat}')) END) = 0 AS keep
FROM ({source_select}) src
"""
