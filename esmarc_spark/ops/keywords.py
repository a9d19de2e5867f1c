"""Per-document keyword extraction by corpus-weighted term scoring —
the classic tf-idf family, in the exact-integer dialect this repo's
cross-engine contract requires.

Curation stacks use per-doc keywords for topic routing, search-index
seeding, and cheap document fingerprints (the reference's analogue is
its subject/topic field extraction, esmarc.py getentity/handle_about —
but web pages have no cataloged subjects, so the corpus statistics ARE
the cataloger). Scoring is ``score_scaled = floor(1e6 * tf / df)`` —
corpus-frequency-inverse weighting (tf-icf). This is deliberately NOT
the textbook ``tf * log(N/df)``: a float log cannot hash-match across
engines, while the integer ratio is bit-identical at any parallelism,
and both weightings agree on the decisions that matter here (function
words with df ~ N sink to the bottom; rare-but-repeated terms rise).

Scale shape: tokenize/normalize is map-only codegen; ``tf`` is one
partial-agg groupBy on (doc_id, term); ``df`` REUSES the tf relation
(already distinct per doc-term, pinned by a compressed-columnar
persist so Catalyst cannot plan a second corpus scan) with a second
partial-agg groupBy — the corpus is scanned once, text never shuffles,
only (doc_id, term, count) triples do. The join back is term-keyed (vocabulary-sized side,
Zipf-headed but partial aggs absorbed the heavy keys already); the
top-k window partitions by doc_id over that doc's distinct terms —
bounded per key, never a corpus sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# strip leading/trailing non-alphanumerics from whitespace tokens; one
# canonical pattern shared with the oracle (Java regex and RE2 read it
# identically; ASCII classes keep the two engines' case tables out)
_EDGE_PUNCT = "^[^a-z0-9]+|[^a-z0-9]+$"
_SCALE = 1_000_000


def doc_terms(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """(doc_id, term) occurrences: lowercased whitespace tokens with
    edge punctuation stripped, shorter than ``min_len`` dropped."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_t"),
    ).select(
        "doc_id",
        F.regexp_replace("_t", F.lit(_EDGE_PUNCT), F.lit("")).alias("term"),
    )
    return toks.where(F.length("term") >= min_len)


# the most recent persisted tf intermediate (one per session): repeated
# extract_keywords / ingest_keywords_dump calls in a long-lived session —
# the per-dump ingest loop — would otherwise accumulate cached blocks
# until executor storage evicts them (ADVICE r7). Unpersisting a cached
# frame never changes results (Spark recomputes from lineage); by the
# time the NEXT call runs, the previous call's result has been
# materialized by any sane caller, so the release costs nothing.
_LIVE_TF: list[DataFrame] = []


def _persist_tf(tf: DataFrame) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    while _LIVE_TF:
        try:
            _LIVE_TF.pop().unpersist(blocking=False)
        except Exception:
            pass  # previous frame's session may already be stopped
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_TF.append(tf)
    return tf


def extract_keywords(
    documents: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """Top-``k`` keywords per document: (doc_id, term, tf, df,
    score_scaled, rank) with rank 1..k ordered (score DESC, term ASC —
    ties pinned bytewise, a pure function of the corpus)."""
    tf = _persist_tf(
        doc_terms(documents, text_col, id_col, min_len)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        # without this, Catalyst plans the df branch as a SECOND full
        # scan + tokenize of the corpus (verified via explain). persist
        # (compressed columnar, spills to disk) rather than
        # localCheckpoint (uncompressed UnsafeRow blocks): at 2M docs
        # the checkpoint variant OOMed an 8g heap while the columnar
        # cache fits in a fraction of the space (measured, BENCH/
        # keywords.json run log)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.expr(f"(tf * {_SCALE}) div df").alias("score_scaled"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_scaled").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def extract_keywords_sql(
    source_select: str, k: int = 5, min_len: int = 3
) -> str:
    """DuckDB oracle over a relation with (doc_id, text): identical
    normalization pattern, counts, integer scoring, and tie-break."""
    return f"""
WITH _toks AS (
  SELECT doc_id,
         regexp_replace(t, '{_EDGE_PUNCT}', '', 'g') AS term
  FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
    FROM ({source_select})
  )
),
_tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM _toks WHERE length(term) >= {min_len}
  GROUP BY 1, 2
),
_df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM _tf GROUP BY 1
),
_scored AS (
  SELECT doc_id, term, tf, df,
         (tf * {_SCALE}) // df AS score_scaled
  FROM _tf JOIN _df USING (term)
)
SELECT doc_id, term, tf, df, score_scaled,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_scaled DESC, term ASC)
            AS BIGINT) AS rank
FROM _scored
QUALIFY rank <= {k}
"""


# ---------------------------------------------------------------------------
# incremental document-frequency state across dumps (round 7)
# ---------------------------------------------------------------------------
#
# A growing corpus should not re-tokenize history to score a new dump:
# df is additive across dumps (each doc lives in exactly one dump, so
# per-dump df counts sum losslessly), which makes the persisted state a
# tiny (term, df) relation per dump — vocabulary-sized, ~6 orders of
# magnitude below the text corpus. Contract (documented, tested):
# ingesting dump N returns THAT dump's keywords scored against the df
# accumulated over dumps 1..N — byte-identical to from-scratch
# extract_keywords over the concatenated dumps restricted to dump N's
# documents. Keywords published for EARLIER dumps are point-in-time
# snapshots (their df was smaller); a global re-rank is one
# from-scratch run when a release wants it. Same _STATE-marker
# atomicity/idempotence as ops.dedup_incremental.


class DfState:
    """Persisted per-dump document-frequency deltas under ``root``:

    * ``df/dump=<id>/`` parquet (term, df) — the dump's per-term
      distinct-doc counts
    * ``_STATE``        JSON {"dumps": [...]} — atomic commit point
    """

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def manifest(self) -> dict:
        import json

        from esmarc_spark.pipeline import fsio

        raw = fsio.read_text(fsio.join(self.root, "_STATE"))
        return {"dumps": []} if raw is None else json.loads(raw)

    def df(self, spark) -> DataFrame | None:
        """Merged (term, df) over every committed dump."""
        from esmarc_spark.pipeline import fsio

        dumps = self.manifest()["dumps"]
        if not dumps:
            return None
        paths = [fsio.join(self.root, "df", f"dump={d}") for d in dumps]
        return (
            spark.read.parquet(*paths)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )

    def _publish(self, dumps: list[str]) -> None:
        import json

        from esmarc_spark.pipeline import fsio

        fsio.write_text_atomic(
            fsio.join(self.root, "_STATE"), json.dumps({"dumps": dumps})
        )


def ingest_keywords_dump(
    spark,
    documents: DataFrame,
    state_root: str,
    dump_id: str,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 3,
) -> DataFrame:
    """Commit one dump's df delta and return the dump's top-``k``
    keywords scored against the ACCUMULATED corpus df (see module
    section note for the exact equality contract). Replaying a
    committed dump_id re-scores it against current state without
    re-committing; a crash between the delta write and the marker is
    healed by the deterministic rerun overwriting the orphan dir."""
    from esmarc_spark.pipeline import fsio

    st = DfState(state_root)
    manifest = st.manifest()
    tf = _persist_tf(
        doc_terms(documents, text_col, id_col, min_len)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if dump_id not in manifest["dumps"]:
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).write.mode(
            "overwrite"
        ).parquet(fsio.join(st.root, "df", f"dump={dump_id}"))
        st._publish(manifest["dumps"] + [dump_id])
    scored = tf.join(st.df(spark), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.expr(f"(tf * {_SCALE}) div df").alias("score_scaled"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_scaled").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def corpus_stopwords(
    documents: DataFrame,
    k: int = 30,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 1,
) -> DataFrame:
    """Data-driven stopword discovery: the top-``k`` terms per language
    by document frequency — (lang, term, df, rank), rank ordered
    (df DESC, term ASC). The vendored ``lookups.stopwords`` dim covers
    15 languages; real crawls meet the other ~185 plus domain-specific
    function words, and the corpus itself is the only reliable source
    for those. Shapes: the per-(lang, doc, term) distinct + count are
    partial-agg; the rank window runs per language over its vocabulary
    (never the corpus)."""
    per = (
        documents.select(
            F.coalesce(F.col(lang_col), F.lit("")).alias("lang"),
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_t"),
        )
        .select(
            "lang",
            "doc_id",
            F.regexp_replace("_t", F.lit(_EDGE_PUNCT), F.lit("")).alias("term"),
        )
        .where(F.length("term") >= min_len)
        .distinct()
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    return (
        per.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def corpus_stopwords_sql(source_select: str, k: int = 30, min_len: int = 1) -> str:
    """DuckDB oracle over (doc_id, text, lang)."""
    return f"""
WITH _toks AS (
  SELECT lang, doc_id,
         regexp_replace(t, '{_EDGE_PUNCT}', '', 'g') AS term
  FROM (
    SELECT coalesce(lang, '') AS lang, doc_id,
           unnest(string_split(lower(text), ' ')) AS t
    FROM ({source_select})
  )
),
_df AS (
  SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT lang, doc_id, term FROM _toks
        WHERE length(term) >= {min_len})
  GROUP BY 1, 2
)
SELECT lang, term, df,
       CAST(row_number() OVER (PARTITION BY lang
                               ORDER BY df DESC, term ASC) AS BIGINT) AS rank
FROM _df
QUALIFY rank <= {k}
"""
