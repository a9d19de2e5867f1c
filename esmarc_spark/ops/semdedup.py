"""SemDeDup — semantic (embedding-space) deduplication.

"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" (Abbas et al. 2023) removes documents that are
*semantically* redundant even when no token overlaps: cluster the
embedding space with k-means, then inside each cluster drop all but
one member of every group whose pairwise cosine exceeds a threshold.
It is the third granularity of the repo's dedup ladder — exact bytes
(``ops.dedup.dedup_exact``), near-verbatim tokens (MinHash/LSH +
Jaccard), and now meaning (embeddings) — and closes the "embedding
cosine near-dup" family named in the graft brief with a *pruning*
operator rather than just pair detection (``similarity.embedding_near_dups``).

Re-expression on Spark:

* the coarse quantizer is ``similarity.ivf_build`` (deterministic
  lowest-id seeds, optional Lloyd refinement). The oracle-checked
  configuration pins ``iters=0`` so every arithmetic step is rational
  double math the DuckDB twin replays bit-for-bit; production callers
  can pass ``iters>0`` or a pre-trained ``centroids`` frame (the paper
  trains k-means offline — the operator contract only needs an
  assignment function);
* assignment fans out n_clusters rows per vector against the broadcast
  codebook and keeps the argmax-cosine cluster (rounded to 6, ties to
  the lowest cluster id — deterministic at any parallelism);
* pruning is a within-cluster self-join (pairs ``a.id < b.id``): a
  vector is dropped when a lower-id cluster-mate sits within the
  cosine threshold. Deterministic keep-lowest-id stands in for the
  paper's keep-farthest-from-centroid rule (documented divergence —
  the paper itself reports the choice of survivor barely matters).

Scale shape: the codebook broadcast is the IVF contract (n_clusters x
dim doubles); assignment is one partial-aggregated shuffle keyed by
vector id (uniform). The pairwise stage shuffles on cluster_id and
costs O(sum c_i^2) — bounded by sizing n_clusters so clusters stay
O(sqrt n) (``similarity.auto_ivf_centroids``), exactly the published
SemDeDup regime; a degenerate cluster (everything identical) is the
same failure mode as an oversized LSH bucket and the same star-link
cap applies if measured necessary (``ops.dedup.lsh_candidate_pairs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops.similarity import ROUND_N, _dot, _norm, ivf_build


def assign_clusters(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cluster_id): argmax-cosine cluster, cosine rounded to 6
    and ties broken to the LOWEST cluster id, so the assignment is
    deterministic at any parallelism (unlike raw ``max_by`` on floats)."""
    cos = F.round(
        _dot(F.col(vec_col), F.col("centroid"))
        / (_norm(F.col(vec_col)) * _norm(F.col("centroid"))),
        ROUND_N,
    )
    scored = embeddings.select(id_col, vec_col).crossJoin(
        F.broadcast(centroids)
    ).select(
        id_col, vec_col, "centroid_id", cos.alias("_cos")
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.max_by(
                F.struct(F.col("centroid_id"), F.col(vec_col)),
                F.struct(F.col("_cos"), (-F.col("centroid_id")).alias("_t")),
            ).alias("_best")
        )
        .select(
            id_col,
            F.col(f"_best.{vec_col}").alias(vec_col),
            F.col("_best.centroid_id").alias("cluster_id"),
        )
    )


def semdedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    iters: int = 0,
) -> DataFrame:
    """(id, cluster_id, keep): ``keep = false`` iff a lower-id member of
    the same cluster lies within ``threshold`` cosine. Survivors of
    every semantic-duplicate group are exactly its lowest ids."""
    if centroids is None:
        centroids = ivf_build(
            embeddings.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
            ),
            n_clusters,
            iters,
        )
    assigned = assign_clusters(embeddings, centroids, id_col, vec_col)
    a = assigned.select(
        F.col(id_col).alias("_aid"),
        F.col(vec_col).alias("_avec"),
        "cluster_id",
    )
    b = assigned.select(
        F.col(id_col).alias("_bid"),
        F.col(vec_col).alias("_bvec"),
        "cluster_id",
    )
    cos = F.round(
        _dot(F.col("_avec"), F.col("_bvec"))
        / (_norm(F.col("_avec")) * _norm(F.col("_bvec"))),
        ROUND_N,
    )
    removed = (
        a.join(b, "cluster_id")
        .where(F.col("_aid") < F.col("_bid"))
        .where(cos >= threshold)
        .select(F.col("_bid").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.join(removed, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


_COS_SQL = """round(
  list_sum(list_transform(range(1, len({a}) + 1),
           i -> cast({a}[i] AS double) * cast({b}[i] AS double)))
  / (sqrt(list_sum(list_transform(range(1, len({a}) + 1),
           i -> cast({a}[i] AS double) * cast({a}[i] AS double))))
   * sqrt(list_sum(list_transform(range(1, len({b}) + 1),
           i -> cast({b}[i] AS double) * cast({b}[i] AS double))))),
  6)"""


def semdedup_sql(
    n_clusters: int = 8,
    threshold: float = 0.95,
    source_select: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """DuckDB oracle for the ``iters=0`` configuration: identical seed
    rule (lowest ids), identical rounded-cosine argmax assignment and
    tie-break, identical lowest-id-survivor pruning."""
    cos_ec = _COS_SQL.format(a="e.embedding", b="c.centroid")
    cos_ab = _COS_SQL.format(a="a.embedding", b="b.embedding")
    return f"""
WITH e AS ({source_select}),
c AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS centroid_id,
         list_transform(embedding, x -> cast(x AS double)) AS centroid
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT {n_clusters})
),
scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id, {cos_ec} AS cos
  FROM e CROSS JOIN c
),
assigned AS (
  SELECT vec_id, embedding, centroid_id AS cluster_id
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, centroid_id ASC) AS rn
        FROM scored)
  WHERE rn = 1
),
removed AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {cos_ab} >= {threshold}
)
SELECT vec_id, cluster_id,
       (vec_id NOT IN (SELECT vec_id FROM removed)) AS keep
FROM assigned
"""
