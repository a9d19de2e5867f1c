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


def auto_lsh_bits(
    n_rows: int, target_bucket: int = 256, lo: int = 4, hi: int = 24
) -> int:
    """Signature width that keeps EXPECTED bucket occupancy near
    ``target_bucket`` (n / 2^bits): per-bucket scoring is quadratic, so a
    fixed width that is fine at 10^5 rows melts at 10^8. Clamped so tiny
    corpora keep enough buckets for recall math and the signature stays
    int-addressable."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(n_rows, 1) / target_bucket + 1))))


def auto_ivf_centroids(n_rows: int, lo: int = 16, hi: int = 65536) -> int:
    """sqrt(n) coarse-quantizer size (the standard IVF rule: ~sqrt(n)
    lists of ~sqrt(n) vectors balances probe cost against list scans),
    clamped so the broadcast codebook stays contractually small."""
    import math

    return max(lo, min(hi, math.isqrt(max(n_rows, 1))))


def embedding_near_dups_bucketed(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_bits: int | None = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """THE scale path for near-dup pairs (the round-1 default was an
    all-pairs broadcast join — O(n²) score + full-table broadcast, a
    scale-killer past ~10⁵ vectors; it is now the oracle harness only).

    Multi-table hyperplane LSH: ``n_tables`` independent ``n_bits``-bit
    signatures; candidate pairs are vectors sharing a bucket in ANY table
    (self-equi-join on (table, signature) — never a cross product, bucket
    populations ~uniform so no skew); pairs are deduped and then verified
    with the same exact cosine math as the brute-force path. Recall for a
    pair at cosine c is 1-(1-p^b)^T with p = 1-acos(c)/π — at c≥0.9,
    b=4, T=8 that is >0.999 (pytest asserts ≥0.9 vs brute force).
    Cost: shuffle carries each vector n_tables times; per-bucket scoring is
    quadratic only within a bucket (2^b buckets per table, tunable).

    ``n_bits=None`` derives the width from the corpus row count
    (auto_lsh_bits: expected occupancy ~256) at the price of one count()
    job at planning time; oracle-checked callers pass it explicitly so
    the static SQL mirror stays in lockstep."""
    if n_bits is None:
        n_bits = auto_lsh_bits(embeddings.count())
    emb = embeddings.select("vec_id", "embedding")
    sig_cols = [
        hyperplane_signature(F.col("embedding"), n_bits, dim, salt=t + 1).alias(
            f"_s{t}"
        )
        for t in range(n_tables)
    ]
    tables = F.array(
        *[
            F.struct(F.lit(t).alias("t"), F.col(f"_s{t}").alias("sig"))
            for t in range(n_tables)
        ]
    )
    buckets = (
        emb.select("vec_id", "embedding", *sig_cols)
        .select("vec_id", "embedding", F.explode(tables).alias("b"))
        .select(
            "vec_id", "embedding", F.col("b.t").alias("t"), F.col("b.sig").alias("sig")
        )
    )
    a = buckets.select(
        F.col("t"), F.col("sig"),
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"),
    )
    b = buckets.select(
        F.col("t"), F.col("sig"),
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"),
    )
    cand = (
        a.join(b, ["t", "sig"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])  # agree in >1 table -> score once
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (
        _norm(F.col("emb_a")) * _norm(F.col("emb_b"))
    )
    return cand.select(
        "vec_a", "vec_b", F.round(cos, ROUND_N).alias("cosine")
    ).where(F.col("cosine") >= threshold)


def embedding_near_dups_bucketed_sql(
    threshold: float = 0.95,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> str:
    """DuckDB rendering of the SAME bucketed plan — identical sign matrices,
    bucket ids, candidate set, and verify math, so the driver's value-hash
    compare checks the LSH bucketing logic itself, not just the verify."""

    def sig_expr(salt: int) -> str:
        bits = []
        for bpos, row in enumerate(sign_matrix(n_bits, dim, salt)):
            arr = "[" + ", ".join(f"{s:.1f}" for s in row) + "]"
            proj = (
                f"list_sum(list_transform(range(1, {dim} + 1), "
                f"i -> cast(embedding[i] AS double) * ({arr})[i]))"
            )
            bits.append(f"(CASE WHEN {proj} > 0 THEN {2 ** bpos} ELSE 0 END)")
        return " + ".join(bits)

    sig_cols = ",\n         ".join(
        f"{sig_expr(t + 1)} AS s{t}" for t in range(n_tables)
    )
    bucket_union = "\n  UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, s{t} AS sig FROM sigs"
        for t in range(n_tables)
    )
    return f"""
WITH sigs AS (
  SELECT vec_id,
         {sig_cols}
  FROM embeddings
),
buckets AS (
  {bucket_union}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b ON a.t = b.t AND a.sig = b.sig
  WHERE a.vec_id < b.vec_id
),
scored AS (
  SELECT c.vec_a, c.vec_b,
         round(
           list_sum(list_transform(range(1, len(ea.embedding) + 1),
                    i -> cast(ea.embedding[i] AS double) * cast(eb.embedding[i] AS double)))
           / (sqrt(list_sum(list_transform(range(1, len(ea.embedding) + 1),
                    i -> cast(ea.embedding[i] AS double) * cast(ea.embedding[i] AS double))))
            * sqrt(list_sum(list_transform(range(1, len(eb.embedding) + 1),
                    i -> cast(eb.embedding[i] AS double) * cast(eb.embedding[i] AS double))))),
         6) AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.vec_a
  JOIN embeddings eb ON eb.vec_id = c.vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {threshold}
"""


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


def sign_matrix(n_bits: int, dim: int, salt: int = 0) -> list[list[float]]:
    """±1 hyperplane components c_{b,d}, chosen by the parity of the same
    60-bit portable md5 hash Spark-side expressions use — computed once in
    Python so both the Spark plan and the DuckDB oracle inline the identical
    constants (and the plan stays small: 1 literal per component instead of
    a folded when(md5(...)) tree). ``salt`` yields independent tables."""
    import hashlib

    rows = []
    for b in range(n_bits):
        row = []
        for d in range(dim):
            key = f"hp:{b}:{d}" if salt == 0 else f"hp{salt}:{b}:{d}"
            h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
            row.append(1.0 if h & 1 else -1.0)
        rows.append(row)
    return rows


def hyperplane_signature(
    emb_col, n_bits: int = 8, dim: int = 64, salt: int = 0
) -> F.Column:
    """B-bit random-hyperplane bucket id from pure expressions.

    sign(h_b · v) per bit, signs from ``sign_matrix`` — deterministic and
    engine-portable (the DuckDB oracle reproduces the identical bucket ids).
    """
    sig = None
    for b, row in enumerate(sign_matrix(n_bits, dim, salt)):
        signs = F.array(*[F.lit(s) for s in row])
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
    n_bits: int | None = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's bucket.

    Recall/cost dial: fewer bits -> bigger buckets -> higher recall, more
    compute. Bucket populations are ~uniform because hyperplanes are random.
    ``n_bits=None`` derives the width from the corpus size (auto_lsh_bits).
    """
    from pyspark.sql.window import Window

    if n_bits is None:
        n_bits = auto_lsh_bits(embeddings.count())
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-coarse-quantizer scale path, the
# companion to the hyperplane-LSH variant above (task brief: "an IVF or
# LSH-bucketed variant as the scale path"; this engine ships both).
# ---------------------------------------------------------------------------


def ivf_build(
    embeddings: DataFrame, n_centroids: int = 16, iters: int = 2
) -> DataFrame:
    """Coarse quantizer (centroid_id, centroid array<double>) via Lloyd
    iterations expressed as DataFrame ops:

    * init: the ``n_centroids`` lowest vec_ids (deterministic);
    * assign: vectors x broadcast(centroids) -> max_by cosine — the k-way
      fan-out is bounded by n_centroids, the shuffle is the groupBy(vec_id)
      partial max;
    * update: posexplode(embedding) -> avg per (centroid, dim) ->
      re-assembled arrays (sort_array of (pos, mean) structs).

    The codebook is small by construction (n_centroids x dim doubles) —
    broadcasting it is the IVF contract, not a scale hazard.
    """
    emb = embeddings.select("vec_id", "embedding")
    centroids = (
        emb.orderBy("vec_id")
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(__import__("pyspark").sql.window.Window.orderBy("vec_id"))
            .alias("centroid_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = assign_ivf(emb, centroids)
        centroids = (
            assigned.select(
                "centroid_id", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
        )
        centroids = centroids.localCheckpoint(eager=True)
    return centroids


def assign_ivf(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, centroid_id): nearest centroid by cosine."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "embedding",
        "centroid_id",
        (
            _dot(F.col("embedding"), F.col("centroid"))
            / (_norm(F.col("embedding")) * _norm(F.col("centroid")))
        ).alias("_cos"),
    )
    return scored.groupBy("vec_id").agg(
        F.max_by(F.struct("centroid_id", "embedding"), F.col("_cos")).alias("_best")
    ).select(
        "vec_id",
        F.col("_best.embedding").alias("embedding"),
        F.col("_best.centroid_id").alias("centroid_id"),
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int | None = 16,
    nprobe: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Approximate top-k: each query scores only vectors whose cell is among
    its ``nprobe`` nearest centroids. Recall/cost dial: nprobe/n_centroids.
    Join is an equi-join on centroid_id — bounded fan-out, no cross product.
    ``n_centroids=None`` derives the codebook size from the corpus
    (auto_ivf_centroids: ~sqrt(n) lists of ~sqrt(n) vectors).
    """
    from pyspark.sql.window import Window

    if n_centroids is None:
        n_centroids = auto_ivf_centroids(embeddings.count())
    centroids = ivf_build(embeddings, n_centroids, iters)
    cells = assign_ivf(embeddings, centroids)

    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    q_scored = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "q_emb",
        "centroid_id",
        (
            _dot(F.col("q_emb"), F.col("centroid"))
            / (_norm(F.col("q_emb")) * _norm(F.col("centroid")))
        ).alias("_cos"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q_scored.withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= nprobe)
        .select("query_id", "q_emb", "centroid_id")
    )

    joined = probes.join(cells, "centroid_id").where(
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
