"""Deterministic negative sampling for KG-embedding training data.

A knowledge graph feeds embedding models (TransE/DistMult-style), and
those need corrupted triples: for every positive (subj, pred, obj),
k negatives (subj, pred, obj') with obj' drawn from the entity
vocabulary, minus any accidental true edge. The reference stops at
emitting positives (its JSON-LD sink); this closes the loop to
trainable data — squarely the "operations a large-scale training-data
pipeline would need" charter.

Everything is a pure function of the input (no RNG): candidate draws
use the repo's portable 60-bit md5 hash (ops.sampling), so reruns,
repartitions, AND the DuckDB oracle pick the IDENTICAL negatives.

Scale shape — the interesting part is the dense entity id:

* a global ``row_number()`` over the vocabulary is the classic
  single-task window bottleneck at 10^8 entities. Instead ids are
  assigned two-level (the ops/packing.py prefix-sum pattern): hash
  entities into ``n_buckets``, rank within each bucket (bounded
  window groups), cumsum the tiny bucket-count relation for offsets,
  broadcast the offsets back. id = offset(bucket) + rank - 1.
* the candidate join is a plain equi-join on ent_id; the accidental-
  positive filter is a left-anti join on the (subj, pred, obj) key.
  Nothing is quadratic, nothing funnels through one task.
* one driver-side scalar (`vocab.count()`) sizes the modulus — the
  same bounded-lineage-scalar class as pagerank's node count.

Collisions with true edges are DROPPED, not re-drawn (the standard
"filtered negatives" setting): per-positive negative counts may be
< k; re-draw loops would make output depend on iteration order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ph(col: Column) -> Column:
    """Portable 60-bit md5 hash (== DuckDB cast('0x'||substr(md5,1,15)))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def entity_ids(vocab: DataFrame, col: str = "obj", n_buckets: int = 1024) -> DataFrame:
    """(entity, ent_id): dense 0..n-1 ids, deterministic, no global window.
    Order is (hash-bucket, entity) — a bijection is all downstream needs."""
    bucketed = vocab.select(
        F.col(col).alias("entity"),
        F.pmod(_ph(F.col(col)), F.lit(n_buckets)).alias("_b"),
    )
    per_bucket = Window.partitionBy("_b").orderBy("entity")
    ranked = bucketed.withColumn("_rn", F.row_number().over(per_bucket))
    counts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    # tiny relation (n_buckets rows): the cumsum window is bounded
    off_w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_c").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .select("entity", (F.col("_off") + F.col("_rn") - 1).alias("ent_id"))
    )


def negative_samples(
    positives: DataFrame, k: int = 2, n_buckets: int = 1024
) -> DataFrame:
    """(subj, pred, obj, neg_idx, obj_neg) — k deterministic corruption
    draws per distinct positive edge, accidental true edges anti-joined
    away. The source positive's ``obj`` stays in the row: training
    consumes (positive, negative) PAIRS, and it makes (subj, pred, obj,
    neg_idx) a unique key of the output."""
    pos = positives.select("subj", "pred", "obj").distinct()
    vocab = pos.select("obj").distinct()
    # materialized once (the count action), reused by the candidate join
    ids = entity_ids(vocab, "obj", n_buckets).localCheckpoint(eager=False)
    n_entities = ids.count()  # bounded scalar, sizes the modulus
    draws = pos.select(
        "subj", "pred", "obj",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx"),
    ).select(
        "subj", "pred", "obj",
        F.col("neg_idx").cast("long").alias("neg_idx"),
        F.pmod(
            _ph(
                F.concat_ws("|", F.col("subj"), F.col("pred"), F.col("obj"),
                            F.col("neg_idx").cast("string"))
            ),
            F.lit(n_entities),
        ).alias("ent_id"),
    )
    cand = draws.join(ids, "ent_id").select(
        "subj", "pred", "obj", "neg_idx", F.col("entity").alias("obj_neg")
    )
    return cand.join(
        pos.select("subj", "pred", F.col("obj").alias("obj_neg")),
        ["subj", "pred", "obj_neg"],
        "anti",
    ).select("subj", "pred", "obj", "neg_idx", "obj_neg")


def negative_samples_sql(
    positives_sql: str, k: int = 2, n_buckets: int = 1024
) -> str:
    """DuckDB oracle: identical two-level id assignment, identical md5
    candidate draws, identical NOT-EXISTS filtering."""
    ph = "cast('0x' || substr(md5({x}), 1, 15) AS bigint)"
    return f"""
WITH _pos AS (SELECT DISTINCT subj, pred, obj FROM ({positives_sql})),
_vocab AS (SELECT DISTINCT obj AS entity FROM _pos),
_bucketed AS (
  SELECT entity, {ph.format(x="entity")} % {n_buckets} AS _b FROM _vocab
),
_ranked AS (
  SELECT entity, _b,
         row_number() OVER (PARTITION BY _b ORDER BY entity) AS _rn
  FROM _bucketed
),
_offsets AS (
  SELECT _b,
         COALESCE(SUM(COUNT(*)) OVER (
           ORDER BY _b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS _off
  FROM _bucketed GROUP BY _b
),
_ids AS (
  SELECT r.entity, CAST(o._off + r._rn - 1 AS BIGINT) AS ent_id
  FROM _ranked r JOIN _offsets o USING (_b)
),
_n AS (SELECT COUNT(*) AS n FROM _ids),
_draws AS (
  SELECT subj, pred, obj,
         CAST(neg_idx AS BIGINT) AS neg_idx,
         {ph.format(x="subj || '|' || pred || '|' || obj || '|' || CAST(neg_idx AS VARCHAR)")}
           % (SELECT n FROM _n) AS ent_id
  FROM (SELECT subj, pred, obj, unnest(range(0, {k})) AS neg_idx FROM _pos)
),
_cand AS (
  SELECT d.subj, d.pred, d.obj, d.neg_idx, i.entity AS obj_neg
  FROM _draws d JOIN _ids i USING (ent_id)
)
SELECT subj, pred, obj, neg_idx, obj_neg
FROM _cand c
WHERE NOT EXISTS (
  SELECT 1 FROM _pos p
  WHERE p.subj = c.subj AND p.pred = c.pred AND p.obj = c.obj_neg
)
"""
