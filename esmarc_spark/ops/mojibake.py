"""Mojibake repair: undo UTF-8-bytes-read-as-cp1252 corruption, pure JVM.

The single most common encoding defect in web corpora is text whose
UTF-8 bytes were decoded as windows-1252 somewhere upstream ("Ã©" where
"é" was meant, "â€™" for a right quote). The ftfy library's core case.
The reference pipeline never has to deal with this (MARC ships its own
encoding discipline); a Common-Crawl-scale corpus hits it constantly —
cf. the charset-aware S1 stage (pipeline/extract_text.py), which
prevents *us* introducing it but cannot fix damage already baked into
the source bytes.

Design: a fixed, ordered table of (mojibake sequence -> intended char)
rewritten as one chained ``replace`` expression. Both sides of the
correctness gate are generated from the SAME table by
:func:`repair_expr_sql` — the SQL text is dialect-neutral (``replace``
has identical semantics in Spark and DuckDB), so the chain order IS the
contract, exactly like ops/pii.py's sequential redaction.

The table covers the WHATWG windows-1252 decode (the 5 bytes strict
cp1252 leaves undefined map to their C1 control chars, as every browser
does) of the UTF-8 encodings of:

* U+00A0-U+00FF — Latin-1 Supplement (all Western-European accents);
* common General-Punctuation / currency chars (curly quotes, dashes,
  ellipsis, bullet, daggers, permille, guillemets, euro, trademark).

Longest sequences first, then lexicographic: a 3-byte sequence
("â€™") must be rewritten before any 2-byte rule could split it.

Semantics and limits (documented, ftfy-identical tradeoffs):

* One pass repairs ONE level of corruption; doubly-encoded text
  ("ÃƒÂ©") needs two applications (first pass yields "Ã©").
* Text that legitimately contains a mojibake-looking sequence is
  rewritten too — at web scale the prior overwhelmingly favors repair.

Scale shape: map-only, zero shuffle, whole-stage-codegen chain of
StringReplace ops; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# WHATWG windows-1252: the 5 strict-cp1252 holes decode to C1 controls
_CP1252_HOLES = {0x81, 0x8D, 0x8F, 0x90, 0x9D}

_PUNCT = "‘’‚“”„†‡•…‰‹›€™–—"


def _w1252_decode(bs: bytes) -> str:
    return "".join(
        chr(b) if b in _CP1252_HOLES else bytes([b]).decode("cp1252") for b in bs
    )


def mojibake_table() -> list[tuple[str, str]]:
    """Ordered (sequence, char) rules — longest first, then lexicographic.
    Pure function of the Unicode tables above; no I/O, no environment."""
    targets = [chr(c) for c in range(0xA0, 0x100)] + list(_PUNCT)
    rules = [(_w1252_decode(ch.encode("utf-8")), ch) for ch in targets]
    rules.sort(key=lambda p: (-len(p[0]), p[0]))
    return rules


def repair_expr_sql(inner: str) -> str:
    """Chained-``replace`` SQL over an input expression — dialect-neutral
    text accepted verbatim by both Spark's and DuckDB's parsers (single
    source of truth for engine parity). Sequences/chars never contain
    ASCII quotes (every byte involved is >= 0x80), so no escaping."""
    e = inner
    for seq, ch in mojibake_table():
        e = f"replace({e}, '{seq}', '{ch}')"
    return e


def repair_mojibake(col: Column | str) -> Column:
    """The repair chain as a Spark Column (parsed JVM-side in one
    F.expr — 113 py4j literal round-trips would dominate plan build,
    the measured trap in BENCH/r3_ab_notes.md)."""
    name = col if isinstance(col, str) else None
    if name is None:
        raise TypeError("repair_mojibake takes a column NAME (it builds SQL text)")
    return F.expr(repair_expr_sql(f"`{name}`"))


def fix_mojibake(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Repair ``text_col`` in place (or into ``out_col``), adding
    ``n_repaired`` = number of rewritten sequences (every rule collapses
    k>=2 chars to 1, so the code-point length drop counts rewrites
    weighted by k-1; exact enough for gating and portable across
    engines: length() is code-point semantics in Spark AND DuckDB)."""
    out = out_col or text_col
    fixed = repair_mojibake(text_col)
    return df.withColumn("n_repaired", (F.length(F.col(text_col)) - F.length(fixed)).cast("long")).withColumn(out, fixed)


def fix_mojibake_sql(inner: str, alias: str = "text") -> str:
    """SELECT-list fragment for the DuckDB oracle: repaired text +
    the identical n_repaired length delta."""
    return (
        f"CAST(length({inner}) - length({repair_expr_sql(inner)}) AS BIGINT)"
        f" AS n_repaired, {repair_expr_sql(inner)} AS {alias}"
    )


def fix_mojibake_deep(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    passes: int = 2,
) -> DataFrame:
    """Multi-round repair for MULTIPLY-encoded damage (round 7 — VERDICT
    r6 item 3): real crawls contain text that took the UTF-8-as-cp1252
    round trip more than once ("ÃƒÂ©" where "é" was meant — one pass
    only gets it back to "Ã©"). Applies the identical ordered chain
    ``passes`` times, adding one ``n_repaired_p<k>`` length-delta column
    per pass (same counting semantics as :func:`fix_mojibake`).

    The per-pass counters are the fixpoint check: the chain strictly
    shortens text whenever it rewrites anything, so
    ``n_repaired_p<last> = 0`` proves the LAST pass was an identity —
    the text is stable and more passes cannot change it. Rows with a
    non-zero last-pass counter carry >= ``passes``-deep damage; gate on
    the counter (or raise ``passes``) rather than trusting the output.
    Two passes cover everything observed outside adversarial input —
    each extra encode round multiplies byte length ~1.5-2x, so deeper
    damage dies in length-based curation gates anyway.

    Each pass is one staged projection (the measured Janino discipline:
    113 chained replaces per stage, never ``passes * 113`` in one
    expression tree); still map-only, zero shuffle, no Python."""
    if passes < 1:
        raise ValueError("passes must be >= 1")
    out = out_col or text_col
    cur = text_col
    for k in range(1, passes + 1):
        stage = f"__mj{k}"
        df = df.withColumn(stage, F.expr(repair_expr_sql(f"`{cur}`")))
        df = df.withColumn(
            f"n_repaired_p{k}",
            (F.length(F.col(cur)) - F.length(F.col(stage))).cast("long"),
        )
        cur = stage
    df = df.withColumn(out, F.col(cur))
    return df.drop(*[f"__mj{k}" for k in range(1, passes + 1) if f"__mj{k}" != out])


def fix_mojibake_deep_sql(
    source_select: str,
    text_expr: str = "text",
    passes: int = 2,
    extra_cols: str = "doc_id",
    alias: str = "text",
) -> str:
    """DuckDB oracle for :func:`fix_mojibake_deep`: the same chain text
    applied through ``passes`` nested subqueries (each pass's chain
    appears exactly once, mirroring the Spark side's staged
    projections), same per-pass length-delta counters."""
    sql = f"SELECT {extra_cols}, {text_expr} AS __mj0 FROM ({source_select})"
    for k in range(1, passes + 1):
        sql = (
            f"SELECT *, {repair_expr_sql(f'__mj{k - 1}')} AS __mj{k} "
            f"FROM ({sql})"
        )
        sql = (
            f"SELECT *, CAST(length(__mj{k - 1}) - length(__mj{k}) AS BIGINT)"
            f" AS n_repaired_p{k} FROM ({sql})"
        )
    counters = ", ".join(f"n_repaired_p{k}" for k in range(1, passes + 1))
    # column order matches the Spark side (the repaired text replaces the
    # input column IN PLACE, so it precedes the per-pass counters)
    return (
        f"SELECT {extra_cols}, __mj{passes} AS {alias}, {counters} FROM ({sql})"
    )


def double_mojibake(ch: str) -> str:
    """The twice-encoded mojibake of ``ch`` (fixture helper: what "é"
    looks like after TWO UTF-8-as-cp1252 round trips)."""
    once = _w1252_decode(ch.encode("utf-8"))
    return _w1252_decode(once.encode("utf-8"))
