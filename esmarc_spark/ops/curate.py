"""End-to-end training-data curation: the composition a 100 TB pretraining
pipeline actually runs, as one declarative DataFrame chain.

    curate(docs) = quality gate -> exact dedup (fingerprint survivor)
                   -> near-dup removal (MinHash-LSH candidates + Jaccard
                      verify, keep the min-id doc of every dup pair)

Plan shape at scale:
  * quality gate: map-only expressions (ops.text), pipelines into the scan;
  * exact dedup: one shuffle on the 128-bit fingerprint (uniform keys);
  * near-dup stage: the bounded LSH self-join from ops.dedup — never
    all-pairs; the loser set is tiny, removed with a broadcast-able
    left-anti join.

Every stage is ANSI-expressible, so the WHOLE composition is value-hash
verified against DuckDB (curate_sql) — not just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops import dedup
from esmarc_spark.ops.text import quality_score

DEFAULT_MIN_QUALITY = 0.5
DEFAULT_JACCARD = 0.8


def curate(
    documents: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    jaccard_threshold: float = DEFAULT_JACCARD,
    shingle_k: int = 3,
) -> DataFrame:
    """Surviving (doc_id, n_tokens, quality) rows after the three gates."""
    gated = documents.where(quality_score() >= min_quality)
    exact = dedup.dedup_exact(gated)
    pairs = dedup.ngram_jaccard(
        exact, dedup.lsh_candidate_pairs(exact, shingle_k=shingle_k),
        shingle_k=shingle_k,
    ).where(F.col("jaccard") >= jaccard_threshold)
    # drop the larger id of every verified near-dup pair (min-id survivor,
    # the same deterministic rule as the exact stage)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = exact.join(losers, "doc_id", "left_anti")
    return survivors.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        quality_score().alias("quality"),
    )


def curate_sql(
    min_quality: float = DEFAULT_MIN_QUALITY,
    jaccard_threshold: float = DEFAULT_JACCARD,
    shingle_k: int = 3,
) -> str:
    """DuckDB rendering of the identical composition."""
    from esmarc_spark.ops.dedup import jaccard_pairs_sql
    from esmarc_spark.ops.text import QUALITY_SCORE_SQL

    # the candidate/verify stage runs over the exact-dedup survivors, so
    # every table reference inside the vendored pairs SQL is rebased
    jacc = jaccard_pairs_sql(shingle_k=shingle_k).replace(
        "FROM documents", "FROM exact"
    )
    return f"""
WITH gated AS (
  SELECT * FROM documents WHERE {QUALITY_SCORE_SQL} >= {min_quality}
),
exact AS (
  SELECT d.* FROM gated d
  JOIN (
    SELECT min(doc_id) AS doc_id
    FROM gated
    GROUP BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
  ) s USING (doc_id)
),
jacc AS ({jacc}),
losers AS (
  SELECT DISTINCT doc_b AS doc_id FROM jacc WHERE jaccard >= {jaccard_threshold}
)
SELECT e.doc_id,
       cast(len(string_split(e.text, ' ')) AS bigint) AS n_tokens,
       {QUALITY_SCORE_SQL.replace("text", "e.text")} AS quality
FROM exact e
WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)
"""
