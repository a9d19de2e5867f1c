"""Host/source-level quality rollup and gating.

Web curation decides at TWO granularities: per-document gates
(``ops.text``, ``ops.quality_model``, ``ops.badwords``) and per-host
policy — a domain whose pages are on average junk gets dropped
wholesale even though individual pages squeak past the gates
(RefinedWeb and FineWeb both carry a domain-level filter stage; the
reference's analogue is the ISIL/branch-level filters that drop whole
institutions, mapping/nodes.py DE-14 offers). This operator aggregates
a per-document quality signal to the host and produces a keep/drop
verdict per host plus a gated document stream.

Cross-engine float parity: the per-doc quality score (already rounded
to 6 by ``ops.text.quality_score``) is scaled to an exact integer
(x1e6, bigint) BEFORE the distributed sum, so the aggregation is exact
integer math in any partitioning; the mean divides once at the
boundary and rounds (the repo's decimal-sums-then-round recipe).

Scale shape: one partial-aggregated groupBy on the host key (Zipf host
skew is absorbed map-side exactly as in ``ops.linkgraph`` — measured
in BENCH/pagerank.json), then a broadcast-sized verdict relation joins
the documents back. At 100 TB the rollup relation is ~10^7 hosts — if
it outgrows broadcast, the join key is still the uniform host hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops.text import QUALITY_SCORE_SQL, quality_score


def host_quality_rollup(
    documents: DataFrame,
    host_col: str = "source",
    text: str = "text",
    min_mean_quality: float = 0.6,
) -> DataFrame:
    """One row per host: ``n_docs``, ``mean_quality`` (exact-int sum,
    rounded to 6 at the boundary), ``keep``."""
    q6 = F.round(quality_score(text) * 1e6).cast("bigint")
    return (
        documents.select(F.col(host_col).alias("host"), q6.alias("_q6"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_q6").alias("_sq6"),
        )
        .select(
            "host",
            "n_docs",
            F.round(F.col("_sq6").cast("double") / F.col("n_docs") / 1e6, 6)
            .alias("mean_quality"),
        )
        .withColumn("keep", F.col("mean_quality") >= min_mean_quality)
    )


def gate_hosts_by_quality(
    documents: DataFrame,
    host_col: str = "source",
    text: str = "text",
    min_mean_quality: float = 0.6,
) -> DataFrame:
    """Documents surviving the host verdict (inner join on kept hosts —
    broadcastable at dim scale, uniform-hash equi-join beyond)."""
    verdict = host_quality_rollup(
        documents, host_col, text, min_mean_quality
    ).where("keep").select(F.col("host").alias(host_col))
    return documents.join(verdict, host_col)


def host_quality_rollup_sql(
    source_select: str,
    host_col: str = "source",
    min_mean_quality: float = 0.6,
) -> str:
    """DuckDB oracle: identical exact-integer aggregation (sum cast to
    bigint first — DuckDB sums integers into HUGEINT)."""
    return f"""
WITH src AS ({source_select}),
q AS (
  SELECT {host_col} AS host,
         cast(round({QUALITY_SCORE_SQL} * 1e6) AS bigint) AS q6
  FROM src
),
r AS (
  SELECT host, count(*) AS n_docs,
         cast(sum(q6) AS bigint) AS sq6
  FROM q GROUP BY host
)
SELECT host, n_docs,
       round(cast(sq6 AS double) / n_docs / 1e6, 6) AS mean_quality,
       round(cast(sq6 AS double) / n_docs / 1e6, 6) >= {min_mean_quality}
         AS keep
FROM r
"""


def community_quality_rollup(
    documents: DataFrame,
    communities: DataFrame,
    host_col: str = "host",
    text: str = "text",
    min_mean_quality: float = 0.6,
) -> DataFrame:
    """Quality policy one level above the host: roll the per-document
    signal up to the LINK COMMUNITY (ops.linkgraph.label_propagation) —
    the granularity at which spam actually organizes (a link ring's
    members individually hover near any per-host threshold; their
    community mean gives the ring away; RefinedWeb-style curation
    applies exactly this domain-cluster policy).

    (community, n_hosts, n_docs, mean_quality, keep). Hosts absent from
    the link graph form singleton communities of themselves (left join
    + coalesce) — an unlinked host is its own policy unit.

    Scale shape: the doc->community attachment is an equi-join on the
    uniform host hash (community dim ~#hosts; broadcast when small,
    AQE decides); the rollup is one partial-aggregated groupBy on the
    community key. Exact-int sums as in host_quality_rollup, so the
    mean is bit-identical at any parallelism and in the oracle.
    """
    q6 = F.round(quality_score(text) * 1e6).cast("bigint")
    d = documents.select(F.col(host_col).alias("host"), q6.alias("_q6"))
    j = d.join(communities, "host", "left").withColumn(
        "community", F.coalesce("community", F.col("host"))
    )
    return (
        j.groupBy("community")
        .agg(
            F.count_distinct("host").alias("n_hosts"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_q6").alias("_sq6"),
        )
        .select(
            "community",
            "n_hosts",
            "n_docs",
            F.round(F.col("_sq6").cast("double") / F.col("n_docs") / 1e6, 6)
            .alias("mean_quality"),
        )
        .withColumn("keep", F.col("mean_quality") >= min_mean_quality)
    )


def community_quality_rollup_sql(
    source_select: str,
    communities_sql: str,
    host_col: str = "host",
    min_mean_quality: float = 0.6,
) -> str:
    """DuckDB oracle: identical attachment + exact-integer rollup; the
    communities relation is typically a label_propagation_sql chain."""
    return f"""
WITH src AS ({source_select}),
comm AS ({communities_sql}),
q AS (
  SELECT src.{host_col} AS host,
         COALESCE(comm.community, src.{host_col}) AS community,
         cast(round({QUALITY_SCORE_SQL} * 1e6) AS bigint) AS q6
  FROM src LEFT JOIN comm ON comm.host = src.{host_col}
),
r AS (
  SELECT community,
         count(DISTINCT host) AS n_hosts,
         count(*) AS n_docs,
         cast(sum(q6) AS bigint) AS sq6
  FROM q GROUP BY community
)
SELECT community, n_hosts, n_docs,
       round(cast(sq6 AS double) / n_docs / 1e6, 6) AS mean_quality,
       round(cast(sq6 AS double) / n_docs / 1e6, 6) >= {min_mean_quality}
         AS keep
FROM r
"""


# ---------------------------------------------------------------------------
# per-host language mix (round 7)
# ---------------------------------------------------------------------------
#
# Machine-translated content farms publish the SAME site in dozens of
# languages under one host; organic hosts concentrate on one or two.
# The language-mix rollup (language count + dominant-language share) is
# the cheap host-level signal curation stacks use to route such hosts
# into per-language gates or drop them outright. All-integer outputs
# (top share as exact permyriad) so the rollup hash-matches at any
# parallelism. Scale shape: groupBy(host, lang) partial-agg count
# (bounded by hosts x languages, not rows), then a per-host fold over
# the tiny (host, lang) relation.


def host_language_mix(
    documents: DataFrame,
    host_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """One row per host: ``n_docs``, ``n_langs``, ``top_lang`` (ties ->
    bytewise-min language, a pure function of the input), and
    ``top_share_permyriad`` = floor(1e4 * top-language count / n_docs).
    NULL languages are excluded (no language evidence)."""
    per = (
        documents.where(F.col(lang_col).isNotNull())
        .groupBy(
            F.col(host_col).alias("host"), F.col(lang_col).alias("_lang")
        )
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    # min of (-count, lang): the max-count language, min-lang tie-break
    top = F.min(
        F.struct((-F.col("_cnt")).alias("_nc"), F.col("_lang").alias("_l"))
    ).alias("_top")
    return (
        per.groupBy("host")
        .agg(
            F.sum("_cnt").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            top,
        )
        .select(
            "host",
            "n_docs",
            "n_langs",
            F.col("_top._l").alias("top_lang"),
            F.expr("(10000 * -_top._nc) div n_docs").alias(
                "top_share_permyriad"
            ),
        )
    )


def host_language_mix_sql(
    source_select: str,
    host_col: str = "source",
    lang_col: str = "lang",
) -> str:
    """DuckDB oracle: identical counts; the top language via a
    row_number window ordered (count DESC, lang ASC) — a different
    formulation of the same deterministic pick."""
    return f"""
WITH src AS ({source_select}),
per AS (
  SELECT {host_col} AS host, {lang_col} AS lang, COUNT(*) AS cnt
  FROM src WHERE {lang_col} IS NOT NULL
  GROUP BY 1, 2
),
ranked AS (
  SELECT host, lang, cnt,
         row_number() OVER (PARTITION BY host
                            ORDER BY cnt DESC, lang ASC) AS rn,
         CAST(SUM(cnt) OVER (PARTITION BY host) AS BIGINT) AS n_docs,
         CAST(COUNT(*) OVER (PARTITION BY host) AS BIGINT) AS n_langs
  FROM per
)
SELECT host, n_docs, n_langs, lang AS top_lang,
       (10000 * cnt) // n_docs AS top_share_permyriad
FROM ranked WHERE rn = 1
"""
