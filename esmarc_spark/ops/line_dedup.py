"""Cross-document line-level deduplication (RefinedWeb/CCNet-style).

Web boilerplate survives document-level dedup: a nav bar, cookie
banner, or footer repeats on millions of PAGES while every page stays
globally unique as a document. The standard curation counter-move
(RefinedWeb §"line-wise corrections", CCNet's paragraph hashing) is
corpus-level: count how many distinct documents each exact line occurs
in, and strip lines above a repetition threshold from every document.
This is a different axis from `ops/boilerplate.extract_main_text`
(within-page structural heuristic) and from `ops/text.repetition_stats`
(within-document repetition): it needs corpus-wide state.

Scale shape (the 100-TB read):

* lines travel as their 60-bit portable hash the moment they are
  exploded — the count shuffle and the removal anti-join carry
  (hash, doc_id) longs, never line strings;
* the frequency count is distinct-(doc, line) then count — both stages
  partial-aggregate map-side, so the billion-document boilerplate line
  arrives at its reducer as one row per upstream partition, not one row
  per document;
* the removal join is a left-anti on the hash; the frequent-line
  relation is the small side (lines repeated across >= min_docs docs),
  and hot keys on the probe side are plain AQE-handled skew;
* reassembly is a per-document sort of its own surviving lines
  (array_sort over collect_list bounded by document size — row-local,
  no window function over the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops.hashing import portable_hash, portable_hash_sql


def duplicate_line_keys(
    documents: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    group_expr: F.Column | None = None,
) -> DataFrame:
    """(lk, n_docs): portable hash of every line occurring in >=
    min_docs distinct documents. Empty lines are excluded up front
    (they would always "repeat" and their removal is a formatting
    decision, not a dedup one).

    ``group_expr`` (a Column over the document row) scopes the corpus:
    frequencies are counted per group and the output gains the ``__g``
    column. The batch backfill passes the pday url prefix here so its
    one-job counts equal the per-day loop's (ADVICE r6 #2)."""
    cols = ["doc_id"] + (
        [group_expr.alias("__g")] if group_expr is not None else []
    )
    lines = documents.select(
        *cols,
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).where(F.col("line") != "")
    gkeys = ["__g"] if group_expr is not None else []
    return (
        lines.select(
            *gkeys, portable_hash(F.col("line")).alias("lk"), "doc_id"
        )
        .distinct()
        .groupBy(*gkeys, "lk")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_duplicate_lines(
    documents: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_expr: F.Column | None = None,
) -> DataFrame:
    """(id_col, text, kept_lines): every document with its
    corpus-frequent lines removed (order of surviving lines preserved;
    empty lines dropped). Documents reduced to nothing keep a row with
    text='' and kept_lines=0 — downstream length gates decide their
    fate, not this operator. ``id_col`` must be row-unique (duplicate
    ids would merge their documents' lines into one garbled text).

    ``group_expr`` scopes frequency counting per group (see
    duplicate_line_keys); it is evaluated against the ORIGINAL frame's
    columns."""
    if id_col != "doc_id":
        extra = [group_expr.alias("__gsrc")] if group_expr is not None else []
        out = remove_duplicate_lines(
            documents.select(
                F.col(id_col).alias("doc_id"), text_col, *extra
            ),
            min_docs,
            text_col,
            group_expr=F.col("__gsrc") if group_expr is not None else None,
        )
        return out.select(F.col("doc_id").alias(id_col), "text", "kept_lines")
    keys = duplicate_line_keys(documents, min_docs, text_col, group_expr)
    return _strip_lines(
        documents,
        keys.select(*(["__g"] if group_expr is not None else []), "lk"),
        text_col,
        group_expr,
    )


def _strip_lines(
    documents: DataFrame,
    keys: DataFrame,
    text_col: str,
    group_expr: F.Column | None = None,
) -> DataFrame:
    """Remove every line whose hash is in ``keys`` (one ``lk`` column,
    plus ``__g`` when ``group_expr`` scopes the corpus) from
    doc_id-keyed ``documents``; rebuild order-preserved text."""
    gcols = [group_expr.alias("__g")] if group_expr is not None else []
    gkeys = ["__g"] if group_expr is not None else []
    lines = documents.select(
        "doc_id",
        *gcols,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).where(F.col("line") != "")
    kept = lines.withColumn("lk", portable_hash(F.col("line"))).join(
        keys, [*gkeys, "lk"], "left_anti"
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    return (
        documents.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_text", F.lit("")).alias("text"),
            F.coalesce("_kept", F.lit(0)).cast("long").alias("kept_lines"),
        )
    )


def remove_duplicate_lines_sql(
    docs_select: str, min_docs: int = 2
) -> str:
    """DuckDB mirror: identical hash key, count-distinct-docs gate,
    order-preserving string_agg reassembly."""
    return f"""
WITH _docs AS ({docs_select}),
_split AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM _docs),
_lines AS (
  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
  FROM _split
),
_ne AS (SELECT doc_id, pos, line, {portable_hash_sql("line")} AS lk
        FROM _lines WHERE line <> ''),
_freq AS (
  SELECT lk FROM (SELECT DISTINCT lk, doc_id FROM _ne)
  GROUP BY lk HAVING COUNT(*) >= {min_docs}
),
_kept AS (SELECT * FROM _ne WHERE lk NOT IN (SELECT lk FROM _freq)),
_rebuilt AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY pos) AS _text,
         CAST(COUNT(*) AS BIGINT) AS _kept
  FROM _kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(r._text, '') AS text,
       COALESCE(r._kept, 0) AS kept_lines
FROM _docs d LEFT JOIN _rebuilt r ON d.doc_id = r.doc_id
"""


# ---------------------------------------------------------------------------
# incremental line dedup across dumps (round 6)
# ---------------------------------------------------------------------------
#
# The same accumulated-state move as ops/dedup_incremental: a daily
# crawl must strip boilerplate against the WHOLE history's line
# frequencies without recounting the history. State is a per-dump
# (lk, n_docs) parquet directory plus an atomic _STATE manifest through
# pipeline/fsio (counts commit first, marker last — a crash between the
# two leaves the previous manifest intact and the orphan counts dir is
# overwritten deterministically on retry).
#
# Contract (matches dedup_incremental's): HISTORICAL documents are
# immutable — they were emitted when their dump was cleaned. The new
# dump is cleaned against history + itself, which provably equals the
# from-scratch cleaning of that dump's documents over the cumulative
# corpus (the frequency of a line is a sum over dumps either way;
# tested in tests/test_line_dedup.py).

import json as _json

from pyspark.sql import SparkSession

from esmarc_spark.pipeline import fsio


class LineFreqState:
    """Persisted per-dump line-frequency index."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def manifest(self) -> dict:
        raw = fsio.read_text(fsio.join(self.root, "_STATE"))
        if raw is None:
            return {"dumps": []}
        return _json.loads(raw)

    def counts(self, spark: SparkSession) -> DataFrame | None:
        dumps = self.manifest()["dumps"]
        if not dumps:
            return None
        return spark.read.parquet(
            *[fsio.join(self.root, "counts", f"dump={d}") for d in dumps]
        )

    def _publish(self, dumps: list[str]) -> None:
        fsio.write_text_atomic(
            fsio.join(self.root, "_STATE"), _json.dumps({"dumps": dumps})
        )


def dedup_lines_incremental_dump(
    spark: SparkSession,
    documents: DataFrame,
    state_root: str,
    dump_id: str,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Clean a NEW dump against the accumulated line-frequency index
    (history + this dump), committing this dump's counts. Returns the
    cleaned (doc_id, text, kept_lines) for the new dump only. Replaying
    an already-committed dump_id recomputes the same result without
    recommitting (idempotent)."""
    st = LineFreqState(state_root)
    if dump_id not in st.manifest()["dumps"]:
        duplicate_line_keys(documents, min_docs=1, text_col=text_col).write.mode(
            "overwrite"
        ).parquet(fsio.join(st.root, "counts", f"dump={dump_id}"))
        st._publish(st.manifest()["dumps"] + [dump_id])
    merged = st.counts(spark)
    frequent = (
        merged.groupBy("lk")
        .agg(F.sum("n_docs").alias("n"))
        .where(F.col("n") >= min_docs)
        .select("lk")
    )
    return _strip_lines(documents, frequent, text_col)
