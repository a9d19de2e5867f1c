"""Graph-feature host gate: compose link-graph analysis into curation
policy (round 7 — VERDICT r6 #4).

The round-6 tier computes the features (``ops.linkgraph``: PageRank
authority, local clustering coefficient, LPA communities) and the
policy rollup (``ops.host_rollup.community_quality_rollup``); this
module wires them into ONE per-host verdict the way production web
curation actually uses them:

* **authority floor** — hosts below ``min_rank_scaled`` PageRank are
  dropped (the existing prepare_docs 1b gate, folded in so one verdict
  relation carries everything);
* **link-farm check** — a farm manufactures in-degree with star-shaped
  endorsement: many edges, near-zero triangle closure. Hosts with
  ``deg >= farm_min_deg`` whose clustering coefficient falls below
  ``farm_max_coef_scaled`` are dropped. Low-degree hosts are exempt
  (deg 1 closes nothing and proves nothing);
* **ring check** — a link ring is the opposite failure: dense mutual
  linking (HIGH clustering) among junk hosts. Individually each member
  hovers past per-host thresholds; their LPA community's mean document
  quality gives the ring away (``community_quality_rollup``). Hosts in
  communities below ``min_community_quality`` are dropped. Hosts absent
  from the link graph form singleton communities of themselves, so an
  unlinked host is judged purely on its own documents.

Scale shape: everything inherits the component bounds (degree-ordered
triangles, checkpointed PageRank/LPA on int64-scaled values, partial-
aggregated rollups); the verdict relation is one row per host (~10^8 at
100 TB — an equi-join dim, broadcast when small, AQE beyond), and the
document gate is a semi-join on the uniform host key. Every feature is
exact-integer or boundary-rounded, so the verdict hash-matches the
DuckDB oracle at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops.host_rollup import (
    community_quality_rollup,
    community_quality_rollup_sql,
)
from esmarc_spark.ops.linkgraph import (
    clustering_coefficient,
    clustering_coefficient_sql,
    label_propagation,
    label_propagation_sql,
    pagerank,
    pagerank_sql,
)


def graph_gate_hosts(
    documents: DataFrame,
    edges: DataFrame,
    host_col: str = "host",
    text: str = "text",
    min_rank_scaled: int = 0,
    farm_min_deg: int = 8,
    farm_max_coef_scaled: int = 1_000,
    min_community_quality: float = 0.6,
    pagerank_iterations: int = 5,
    lpa_iterations: int = 4,
) -> DataFrame:
    """One verdict row per DOCUMENT host: (host, rank_scaled, deg,
    coef_scaled, community, community_quality, keep). Hosts outside the
    link graph carry rank/deg/coef 0 and their own name as community —
    they pass the authority floor only if ``min_rank_scaled == 0``
    (strictness about unlinked hosts stays the caller's choice, exactly
    like prepare_docs' keep_unranked)."""
    ranks = pagerank(edges, pagerank_iterations)
    coef = clustering_coefficient(edges).select("host", "deg", "coef_scaled")
    comm = label_propagation(edges, lpa_iterations)
    docs = documents.select(F.col(host_col).alias("host"), F.col(text))
    cq = community_quality_rollup(
        docs, comm, min_mean_quality=min_community_quality
    ).select(
        "community", F.col("mean_quality").alias("community_quality")
    )
    hosts = docs.select("host").distinct()
    feats = (
        hosts.join(ranks, "host", "left")
        .join(coef, "host", "left")
        .join(comm, "host", "left")
        .select(
            "host",
            F.coalesce("rank_scaled", F.lit(0)).cast("long").alias("rank_scaled"),
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.coalesce("coef_scaled", F.lit(0)).cast("long").alias("coef_scaled"),
            F.coalesce("community", F.col("host")).alias("community"),
        )
        .join(cq, "community", "left")
    )
    is_farm = (F.col("deg") >= farm_min_deg) & (
        F.col("coef_scaled") < farm_max_coef_scaled
    )
    keep = (
        (F.col("rank_scaled") >= min_rank_scaled)
        & ~is_farm
        & (F.col("community_quality") >= min_community_quality)
    )
    return feats.select(
        "host",
        "rank_scaled",
        "deg",
        "coef_scaled",
        "community",
        "community_quality",
        keep.alias("keep"),
    )


def gate_docs_by_graph(
    documents: DataFrame,
    edges: DataFrame,
    host_col: str = "host",
    **thresholds,
) -> DataFrame:
    """Documents surviving the composed graph verdict (semi-join on the
    kept hosts)."""
    verdict = (
        graph_gate_hosts(documents, edges, host_col=host_col, **thresholds)
        .where("keep")
        .select(F.col("host").alias(host_col))
    )
    return documents.join(verdict, host_col, "semi")


def graph_gate_hosts_sql(
    docs_select: str,
    edges_sql: str,
    host_col: str = "host",
    min_rank_scaled: int = 0,
    farm_min_deg: int = 8,
    farm_max_coef_scaled: int = 1_000,
    min_community_quality: float = 0.6,
    pagerank_iterations: int = 5,
    lpa_iterations: int = 4,
) -> str:
    """DuckDB oracle: the component SQL generators chained stage into
    stage (the web_curation_pipeline replay pattern), identical joins
    and verdict expression."""
    return f"""
WITH _docs AS (SELECT {host_col} AS host, text FROM ({docs_select})),
_ranks AS ({pagerank_sql(edges_sql, pagerank_iterations)}),
_coef AS ({clustering_coefficient_sql(edges_sql)}),
_comm AS ({label_propagation_sql(edges_sql, lpa_iterations)}),
_cq AS ({community_quality_rollup_sql(
        "SELECT host, text FROM _docs",
        "SELECT host, community FROM _comm",
        min_mean_quality=min_community_quality,
    )}),
_hosts AS (SELECT DISTINCT host FROM _docs),
_feats AS (
  SELECT h.host,
         CAST(COALESCE(r.rank_scaled, 0) AS BIGINT) AS rank_scaled,
         CAST(COALESCE(c.deg, 0) AS BIGINT) AS deg,
         CAST(COALESCE(c.coef_scaled, 0) AS BIGINT) AS coef_scaled,
         COALESCE(m.community, h.host) AS community
  FROM _hosts h
  LEFT JOIN _ranks r ON r.host = h.host
  LEFT JOIN _coef c ON c.host = h.host
  LEFT JOIN _comm m ON m.host = h.host
)
SELECT f.host, f.rank_scaled, f.deg, f.coef_scaled, f.community,
       q.mean_quality AS community_quality,
       (f.rank_scaled >= {min_rank_scaled}
        AND NOT (f.deg >= {farm_min_deg}
                 AND f.coef_scaled < {farm_max_coef_scaled})
        AND q.mean_quality >= {min_community_quality}) AS keep
FROM _feats f LEFT JOIN _cq q ON q.community = f.community
"""
