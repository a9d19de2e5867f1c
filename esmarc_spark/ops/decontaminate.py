"""Benchmark decontamination — remove training documents that overlap
an evaluation set (the step every serious LLM data pipeline runs so
benchmark answers don't leak into training data).

Same machinery as the near-dup suite (hashed-shingle MinHash + LSH
banding + exact-Jaccard verify), but CROSS-corpus: corpus buckets join
benchmark buckets, never corpus x corpus — cost scales with
|corpus| + |benchmark| + candidate pairs, and the benchmark side (small
by definition: eval sets are thousands of docs) broadcasts end to end.

Recall is the LSH banding curve (P[candidate] = 1-(1-j^r)^b), identical
to the dedup path and identically mirrored in the DuckDB oracle — the
cross-check verifies the algorithm; the banding parameters are the knob
a deployment tunes for its recall target (raise num_hashes/bands for
near-1 recall at lower thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops.dedup import (
    jaccard_pairs_sql,
    lsh_buckets,
    minhash_signatures,
    shingles_col,
)

# oracle-side id rebase that puts benchmark ids above every possible
# corpus id, so the vendored self-join SQL's `doc_a < doc_b` orientation
# always reads (corpus, benchmark). Both sides are widened to HUGEINT:
# corpus ids stay in bigint range [-2^63, 2^63), benchmark ids shift by
# 2^64 into [2^64-2^63, 2^64+2^63) — disjoint for ANY bigint id on
# either side (negative or hash-derived included, the ranges dedup's
# order-preserving offset trick also has to cover), with 2^63 as the
# orientation boundary.
_BENCH_ID_OFFSET = 1 << 64
_SIDE_BOUNDARY = 1 << 63


def contamination_pairs(
    documents: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, bench_id, jaccard) for corpus docs overlapping a
    benchmark doc at >= threshold. Both inputs need (doc_id, text)."""
    rows_per_band = num_hashes // bands
    b_docs = lsh_buckets(
        minhash_signatures(documents, num_hashes, shingle_k),
        bands,
        rows_per_band,
    )
    b_bench = lsh_buckets(
        minhash_signatures(benchmark, num_hashes, shingle_k),
        bands,
        rows_per_band,
    ).withColumnRenamed("doc_id", "bench_id")
    pairs = (
        b_docs.join(F.broadcast(b_bench), ["band", "band_key"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    sh_docs = documents.select(
        "doc_id", F.array_distinct(shingles_col(k=shingle_k)).alias("sh_a")
    )
    sh_bench = benchmark.select(
        F.col("doc_id").alias("bench_id"),
        F.array_distinct(shingles_col(k=shingle_k)).alias("sh_b"),
    )
    return (
        pairs.join(sh_docs, "doc_id")
        .join(F.broadcast(sh_bench), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Corpus minus contaminated docs (left-anti join on the verified
    contamination pairs). Full input schema preserved."""
    bad = contamination_pairs(
        documents, benchmark, threshold, num_hashes, bands, shingle_k
    ).select("doc_id")
    return documents.join(bad, "doc_id", "left_anti")


def contamination_pairs_sql(
    corpus_select: str,
    bench_select: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> str:
    """DuckDB oracle: the dedup suite's mirrored LSH+Jaccard SQL, rebased
    from its self-join over ``documents`` to corpus x benchmark by
    unioning the two sides under GUARANTEED-DISJOINT HUGEINT ids (see
    ``_BENCH_ID_OFFSET`` — valid for any bigint id on either side, so
    ``doc_a < doc_b`` orientation is always (corpus, benchmark));
    corpus-corpus and bench-bench pairs are filtered out, and the
    rebase is undone (back to BIGINT, matching the Spark schema)."""
    base = jaccard_pairs_sql(num_hashes, bands, shingle_k).replace(
        "FROM documents", "FROM __side"
    )
    return f"""
WITH __side AS (
  SELECT CAST(doc_id AS HUGEINT) AS doc_id, text FROM ({corpus_select})
  UNION ALL
  SELECT CAST(doc_id AS HUGEINT) + {_BENCH_ID_OFFSET} AS doc_id, text
  FROM ({bench_select})
)
SELECT CAST(p.doc_a AS BIGINT) AS doc_id,
       CAST(p.doc_b - {_BENCH_ID_OFFSET} AS BIGINT) AS bench_id,
       p.jaccard
FROM ({base}) p
WHERE p.doc_a < {_SIDE_BOUNDARY}
  AND p.doc_b >= {_SIDE_BOUNDARY}
  AND p.jaccard >= {threshold}
"""


# ---------------------------------------------------------------------------
# exact n-gram contamination (round 6)
# ---------------------------------------------------------------------------
#
# The OTHER standard decontamination flavor (GPT-3 appendix C / PaLM):
# a training doc is contaminated if it shares ANY exact n-gram (n~13)
# with an eval example — catches verbatim quotation of a benchmark
# passage inside an otherwise-unrelated page, which Jaccard-over-the-
# whole-doc misses (a 13-gram quote in a 5k-token page moves doc-level
# Jaccard by ~0.003, far under any threshold).
#
# Scale shape: n-grams are the dedup suite's HASHED shingles (one md5
# per token, integer polynomial combine — never n-gram strings), the
# eval side is array_distinct'ed, exploded, and broadcast, so the join
# is a broadcast hash join against the exploded corpus side with NO
# shuffle before the (doc_id, bench_id) partial-agg count. Collisions
# of the 31-bit shingle hash can in principle produce a spurious match;
# the oracle runs the identical construction, and a production caller
# worried about the ~1-in-2^31 false flag verifies survivors with the
# string n-grams (candidates-only, same pattern as ngram_jaccard).


def exact_ngram_contamination(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_matches: int = 1,
) -> DataFrame:
    """(doc_id, bench_id, n_shared): corpus docs sharing >= min_matches
    distinct exact (hashed) n-grams with a benchmark doc. Inputs need
    (doc_id, text)."""
    from esmarc_spark.ops.dedup import _shingle_hashes, base_hash32
    from esmarc_spark.ops.text import tokens_col

    th = F.transform(tokens_col(), lambda t: base_hash32(t))
    corp = documents.select(
        "doc_id",
        F.explode(F.array_distinct(_shingle_hashes(th, n))).alias("sh"),
    )
    ben = benchmark.select(
        F.col("doc_id").alias("bench_id"),
        F.explode(F.array_distinct(_shingle_hashes(th, n))).alias("sh"),
    )
    return (
        corp.join(F.broadcast(ben), "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_matches)
    )


def decontaminate_exact(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_matches: int = 1,
) -> DataFrame:
    """Corpus minus exact-n-gram-contaminated docs (schema preserved)."""
    bad = exact_ngram_contamination(documents, benchmark, n, min_matches)
    return documents.join(bad.select("doc_id").distinct(), "doc_id", "left_anti")


def contamination_fraction(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
) -> DataFrame:
    """Per-doc contamination FRACTION — the thresholded form the GPT-3 /
    Gopher decontamination rule actually applies (a page quoting one
    benchmark line is dirty; a page that *is* mostly benchmark text is a
    different, worse class): for each corpus doc, the share of its
    distinct (hashed) n-grams that appear anywhere in the benchmark set.

    Returns (doc_id, n_ngrams, n_contaminated, frac_permyriad) with
    ``frac_permyriad`` an exact integer floor(1e4 * hits / total), so
    the result hash-matches across engines and parallelism (no float
    division). Docs shorter than ``n`` tokens have no n-grams and are
    absent (nothing to measure). Scale shape: the benchmark shingle SET
    is deduped then broadcast; the corpus side never shuffles before
    the per-doc partial-agg count."""
    from esmarc_spark.ops.dedup import _shingle_hashes, base_hash32
    from esmarc_spark.ops.text import tokens_col

    th = F.transform(tokens_col(), lambda t: base_hash32(t))
    corp = documents.select(
        "doc_id",
        F.explode(F.array_distinct(_shingle_hashes(th, n))).alias("sh"),
    )
    ben_set = (
        benchmark.select(
            F.explode(F.array_distinct(_shingle_hashes(th, n))).alias("sh")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        corp.join(F.broadcast(ben_set), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
        .withColumn(
            "frac_permyriad",
            F.expr("(10000 * n_contaminated) div n_ngrams"),
        )
    )


def contamination_fraction_sql(
    corpus_select: str,
    bench_select: str,
    n: int = 13,
) -> str:
    """DuckDB mirror of :func:`contamination_fraction` (``//`` is
    DuckDB's integer division — same floor-for-positives semantics as
    Spark's ``div``)."""
    from esmarc_spark.ops.dedup import _shingle_hashes_sql

    return f"""
WITH _csh AS (
  SELECT doc_id, unnest(list_distinct({_shingle_hashes_sql(n)})) AS sh
  FROM (SELECT doc_id, {_TH_SQL} AS th FROM ({corpus_select}))
),
_bset AS (
  SELECT DISTINCT unnest(list_distinct({_shingle_hashes_sql(n)})) AS sh2
  FROM (SELECT doc_id, {_TH_SQL} AS th FROM ({bench_select}))
),
_agg AS (
  SELECT c.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_ngrams,
         CAST(SUM(CASE WHEN b.sh2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated
  FROM _csh c LEFT JOIN _bset b ON c.sh = b.sh2
  GROUP BY c.doc_id
)
SELECT doc_id, n_ngrams, n_contaminated,
       (10000 * n_contaminated) // n_ngrams AS frac_permyriad
FROM _agg
"""


_TH_SQL = (
    "list_transform(string_split(text, ' '), "
    "t -> cast('0x' || substr(md5(t), 1, 8) AS bigint))"
)


def exact_ngram_sql(
    corpus_select: str,
    bench_select: str,
    n: int = 13,
    min_matches: int = 1,
) -> str:
    """DuckDB mirror: identical per-token md5 + polynomial shingle
    hashes, distinct per side, equi-joined and counted."""
    from esmarc_spark.ops.dedup import _shingle_hashes_sql

    return f"""
WITH _csh AS (
  SELECT doc_id, unnest(list_distinct({_shingle_hashes_sql(n)})) AS sh
  FROM (SELECT doc_id, {_TH_SQL} AS th FROM ({corpus_select}))
),
_bsh AS (
  SELECT doc_id AS bench_id, unnest(list_distinct({_shingle_hashes_sql(n)})) AS sh
  FROM (SELECT doc_id, {_TH_SQL} AS th FROM ({bench_select}))
)
SELECT c.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM _csh c JOIN _bsh b ON c.sh = b.sh
GROUP BY c.doc_id, b.bench_id
HAVING COUNT(*) >= {min_matches}
"""
