"""S1 — byte-identical text extraction (html -> text), vectorized.

Contract (BASELINE.json input_hint): for every url the extracted text is
byte-identical across runs and across parallelism levels. Everything here is
a pure function of the html bytes: a deterministic tag-strip + entity decode
+ whitespace normalization implemented over Arrow batches with pandas'
vectorized string kernels — no locale, no hash-order, no per-row Python UDF.

Rows that already carry ``text`` keep it verbatim (the reference never
re-extracts what the source provides); ``html``-only rows get the extracted
form. Output adds ``text_extracted`` provenance.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType
from pyspark.sql.window import Window

_SCRIPT_RE = re.compile(r"(?is)<(script|style|head)\b.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched html->text — the Python reference implementation the
    JVM expression path is verified byte-identical against."""
    s = html.map(
        lambda b: b.decode("utf-8", errors="replace") if b is not None else None
    )
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, ch in _ENTITIES.items():
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s


def extract_text_expr(html: F.Column) -> F.Column:
    """Pure-JVM html->text: the same deterministic strip as the pandas UDF,
    as a regexp_replace chain inside whole-stage codegen — NO Python in the
    hot path (input_hint). ``(?U)`` makes Java's \\s unicode-aware to match
    Python's semantics; byte-identity of the two paths is enforced by
    tests/test_webtext_pipeline.py::test_extract_paths_byte_identical.

    Non-UTF-8 bytes (real crawls: Latin-1/Shift-JIS pages, binary
    payloads) must not abort the job under ANSI mode the way
    ``decode(html,'UTF-8')`` does: ``cast(binary as string)`` wraps the
    bytes unvalidated and ``make_valid_utf8`` replaces each invalid
    sequence with U+FFFD — verified byte-identical to Python's
    ``errors="replace"`` incl. truncated multi-byte sequences
    (tests/test_webtext_pipeline.py::test_extract_non_utf8_lossy)."""
    s = F.make_valid_utf8(html.cast("string"))
    s = F.regexp_replace(s, r"(?is)<(script|style|head)\b.*?</\1>", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES.items():
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, r"(?U)\s+", " ")
    return F.trim(s)


def with_extracted_text(
    webtext: DataFrame, jvm: bool = True, main_content: bool = False
) -> DataFrame:
    """S1: fill null ``text`` from ``html``; stamp extraction provenance.

    jvm=True (default) uses the codegen expression path; jvm=False the
    Arrow/pandas reference path.

    main_content=True swaps the full-page flatten for block-level
    boilerplate removal (ops.boilerplate.extract_main_text — nav/footer
    blocks dropped by link density). The DEFAULT stays the byte-identical
    full-page contract, which mention offsets and the parity gates
    depend on; opt in per pipeline for training-data curation.
    """
    if main_content:
        from esmarc_spark.ops.boilerplate import extract_main_text

        extractor = extract_main_text(
            F.make_valid_utf8(F.col("html").cast("string"))
        )
    elif jvm:
        extractor = extract_text_expr(F.col("html"))
    else:
        extractor = extract_text_udf(F.col("html"))
    extracted = F.when(F.col("text").isNull() & F.col("html").isNotNull(), extractor)
    return webtext.withColumn(
        "text_extracted", F.col("text").isNull() & F.col("html").isNotNull()
    ).withColumn("text", F.coalesce(F.col("text"), extracted))


def dedup_by_url(webtext: DataFrame) -> DataFrame:
    """Exactly-one-row-per-url: keep the newest crawl (max warc_ts), ties
    broken deterministically by preferring rows that carry text, then by
    text hash.

    Implemented as max_by over a composite rank struct rather than a
    row_number window: the groupBy gets a map-side partial aggregate (each
    input partition reduces to one candidate row per url before the
    shuffle), where a window would shuffle + sort the full corpus. The
    survivor choice is a pure function of row content — deterministic under
    any partitioning (dropDuplicates would keep an arbitrary first row and
    break the byte-identity contract).
    """
    cols = webtext.columns
    # maximize (warc_ts, has_text, ~hash) == orderBy(ts desc, null last,
    # hash asc); bitwise NOT is the overflow-safe monotone negation
    rank = F.struct(
        F.col("warc_ts"),
        F.col("text").isNotNull().cast("int"),
        F.bitwise_not(F.coalesce(F.xxhash64("text"), F.lit(0))),
        F.bitwise_not(F.coalesce(F.xxhash64("html"), F.lit(0))),
    )
    picked = webtext.groupBy("url").agg(
        F.max_by(F.struct(*[c for c in cols if c != "url"]), rank).alias("_row")
    )
    return picked.select("url", *[F.col(f"_row.{c}").alias(c) for c in cols if c != "url"])
