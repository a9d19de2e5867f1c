"""ExactSubstr-style duplicated-span removal (within-corpus substring
dedup).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2022) removes every >= 50-token span that occurs verbatim more than
once in the corpus — the spans exact *document* dedup cannot reach
(boilerplate paragraphs, licence blocks, quoted chunks embedded in
otherwise-unique pages). The reference engine has no analogue; this is
part of the LLM-curation surface the graft adds on top of SURVEY.md §2
(like ``ops.dedup`` / ``ops.line_dedup``, which handle the document-
and line-granularity versions of the same problem).

The paper builds a corpus-wide suffix array — inherently single-machine.
The distributed re-expression used here detects duplication at a fixed
k-token granularity instead:

* every k-token shingle (stride 1) is hashed with the repo's
  hashed-shingle construction (ONE md5 per token, polynomial combine —
  the ``ops.dedup`` design measured 12.7x faster than hashing shingle
  strings) widened to TWO independent 31-bit lanes (62-bit space):
  unlike LSH candidates, a collision here deletes text outright, so
  the space must survive web-scale shingle counts (see _span_hashes);
* a global count over the int64 shingle hash finds hashes occurring
  ``>= min_count`` times corpus-wide (this includes a document repeating
  its own span — ExactSubstr semantics);
* each duplicated occurrence marks tokens ``[p, p+k)`` covered; the
  union of covered positions is cut from the document and the survivor
  text re-joined.

Any duplicated run of length ``L >= k`` is removed in full (every
window inside it is duplicated too, so coverage is contiguous); runs
shorter than ``k`` are kept — k is the resolution limit, the documented
divergence from the suffix-array formulation (which uses a 50-token
threshold anyway; set ``k`` to that threshold and semantics match for
maximal runs).

Scale shape: tokenize/hash/shingle are map-only in-row; the only wide
exchanges are a partial-aggregated count over int64 hashes and the
seed join back (both key-uniform — hashes, not strings; text never
shuffles: documents are re-joined by id). Coverage expansion and the
cut are in-row: covered positions via ``array_except`` over a
``sequence(1, n)`` (hash-set based, O(n + s)), survivor tokens by
index lookup. Per-row cost is linear in document length, which
curation pipelines bound upstream (``ops.text`` repetition metrics cap
at 2048 lines for the same reason).

Tokenization is the corpus contract used everywhere else in the repo:
split on a single space, empties preserved, so the re-joined survivor
text is byte-lossless for the uncovered portion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops.dedup import MINHASH_P, SHINGLE_A


def _span_hashes(toks: F.Column, k: int) -> F.Column:
    """62-bit shingle hashes: two independent 31-bit rolling-hash lanes
    from ONE md5 per token (hex chars 1-8 and 9-16), combined as
    ``lane1 * 2^31 + lane2``.

    The LSH machinery's 31-bit shingle space is fine THERE because a
    collision only creates a candidate pair that Jaccard verification
    rejects; here a collision directly deletes k tokens of innocent
    text, so the space must be big enough that the corpus never
    saturates it (observed at bench scale: 26M shingles in a 2^31
    space produced measurable false removals; 2^62 puts the expected
    false-pair count at ~1e-4 even for 10^12-shingle corpora)."""
    md = F.transform(toks, F.md5)

    # closure factories: pyspark HOF lambdas must not carry default args
    # or loop-captured vars (each becomes an extra lambda variable)
    def lane_fn(off):
        return lambda m: F.conv(F.substring(m, off, 8), 16, 10).cast("long")

    def comb_fn(th, mult):
        def comb(i):
            h = F.element_at(th, i)
            for j in range(1, k):
                h = (h * mult + F.element_at(th, (i + j).cast("int"))) % MINHASH_P
            return h

        return comb

    lanes = []
    for off, mult in ((1, SHINGLE_A), (9, SHINGLE_A + 2)):
        th = F.transform(md, lane_fn(off))
        n = F.size(th)
        idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
            F.array().cast("array<int>")
        )
        lanes.append(F.transform(idx, comb_fn(th, mult)))
    return F.zip_with(
        lanes[0], lanes[1], lambda a, b: a * F.lit(2**31) + b
    )


def _span_hashes_sql(k: int) -> str:
    """DuckDB mirror of _span_hashes (expects ``toks``)."""
    parts = []
    for off, mult in ((1, SHINGLE_A), (9, SHINGLE_A + 2)):
        th = (
            f"list_transform(toks, x -> cast('0x' || substr(md5(x), {off}, 8)"
            " AS bigint))"
        )
        expr = "th[i]"
        for j in range(1, k):
            expr = f"(({expr}) * {mult} + th[i+{j}]) % {MINHASH_P}"
        parts.append(
            f"(SELECT list_transform(range(1, len(th) - {k - 2}), i -> {expr})"
            f" FROM (SELECT {th} AS th) __l{off})"
        )
    return (
        f"list_transform(list_zip({parts[0]}, {parts[1]}),"
        f" z -> z[1] * {2**31} + z[2])"
    )


def duplicated_span_seeds(
    documents: DataFrame,
    k: int = 13,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_expr: F.Column | None = None,
) -> DataFrame:
    """(id, seed) rows: 1-based token positions where a corpus-duplicated
    k-shingle starts. ``min_count`` counts occurrences corpus-wide,
    including repeats inside one document.

    ``group_expr`` (a Column over the document row) scopes the corpus:
    occurrences are counted per group, so the batch backfill's one-job
    counts equal the per-day loop's (ADVICE r6 #2)."""
    toks = F.split(F.col(text_col), " ")
    gcols = [group_expr.alias("__g")] if group_expr is not None else []
    gkeys = ["__g"] if group_expr is not None else []
    pos = documents.select(
        F.col(id_col),
        *gcols,
        F.posexplode(_span_hashes(toks, k)).alias("pos0", "sh"),
    )
    dup_sh = (
        pos.groupBy(*gkeys, "sh")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .select(*gkeys, "sh")
    )
    return pos.join(dup_sh, [*gkeys, "sh"]).select(
        id_col, (F.col("pos0") + 1).alias("seed")
    )


def remove_duplicate_spans(
    documents: DataFrame,
    k: int = 13,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_expr: F.Column | None = None,
) -> DataFrame:
    """Input columns + ``clean_text`` (the document with every
    corpus-duplicated k-token span cut out) and ``n_removed_tokens``.
    Documents with no duplicated span keep ``text`` byte-identical
    (including null). ``group_expr`` scopes duplication counting per
    group (see duplicated_span_seeds)."""
    seeds = (
        duplicated_span_seeds(
            documents, k, min_count, id_col, text_col, group_expr
        )
        .groupBy(id_col)
        .agg(F.collect_set("seed").alias("__seeds"))
    )
    out = documents.join(seeds, id_col, "left")
    toks = F.split(F.col(text_col), " ")
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("__seeds"),
                lambda p: F.sequence(p, p + F.lit(k - 1)),
            )
        )
    )
    kept_pos = F.array_except(F.sequence(F.lit(1), F.size(toks)), covered)
    clean = F.array_join(
        F.transform(kept_pos, lambda i: F.element_at(toks, i)), " "
    )
    has = F.col("__seeds").isNotNull()
    return out.select(
        *[F.col(c) for c in documents.columns],
        F.when(has, clean).otherwise(F.col(text_col)).alias("clean_text"),
        F.when(has, F.size(covered))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_removed_tokens"),
    )


def remove_duplicate_spans_sql(
    source_select: str,
    k: int = 13,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: str = "",
) -> str:
    """DuckDB oracle: identical hashing (8-hex-md5 base hash, polynomial
    shingle combine) and identical coverage semantics, expressed as
    unnest + GROUP BY + list ops — a different algorithm shape on
    purpose. ``extra_cols`` adds passthrough columns (comma-led)."""
    return f"""
WITH src AS ({source_select}),
t AS (
  SELECT src.*, string_split({text_col}, ' ') AS toks FROM src
),
h AS (
  SELECT t.*, {_span_hashes_sql(k)} AS shs FROM t
),
pos AS (
  SELECT {id_col}, unnest(shs) AS sh, generate_subscripts(shs, 1) AS i
  FROM h
),
dup AS (SELECT sh FROM pos GROUP BY sh HAVING count(*) >= {min_count}),
seeds AS (
  SELECT {id_col}, list(i) AS seedl
  FROM (SELECT DISTINCT {id_col}, i FROM pos JOIN dup USING (sh))
  GROUP BY {id_col}
),
j AS (
  SELECT h.*, seeds.seedl,
         CASE WHEN seeds.seedl IS NULL THEN NULL ELSE
           list_distinct(flatten(list_transform(seedl,
             p -> range(p, p + {k})))) END AS covered
  FROM h LEFT JOIN seeds USING ({id_col})
)
SELECT {id_col}{extra_cols},
  CASE WHEN seedl IS NULL THEN {text_col} ELSE
    coalesce(array_to_string(list_transform(
      list_filter(range(1, len(toks) + 1),
                  i -> NOT list_contains(covered, i)),
      i -> toks[i]), ' '), '')
  END AS clean_text,
  CASE WHEN seedl IS NULL THEN 0
       ELSE cast(len(covered) AS bigint) END AS n_removed_tokens
FROM j
"""
