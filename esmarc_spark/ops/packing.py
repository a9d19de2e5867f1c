"""Token-budget sharding — distributed prefix sum over document order.

Training-data preparation ends by cutting the curated corpus into
shards of ~equal TOKEN mass (not file count: doc lengths are Zipf, so
count-balanced shards are token-skewed and straggle the training job).
The assignment everyone uses is sequential: walk documents in a
deterministic order, accumulate token counts, start shard k at the
first document whose running total crosses k*budget. That running
total is a PREFIX SUM — the textbook "inherently sequential" shape —
so the point of this module is the distributed formulation:

  1. bucket documents by a dense order key (floor(doc_id / bucket));
  2. one partial agg: per-bucket token sums (map-side combined);
  3. prefix-sum the BUCKET sums — thousands of rows, not billions —
     with a single-partition window over the tiny bucket relation;
  4. broadcast-join the bucket offsets back and finish with a
     within-bucket running sum (window partitioned BY BUCKET, so the
     sort is bounded by bucket size, never global).

No global sort, no single-partition window over the corpus: the only
all-rows shuffle keys on the bucket id. This is the same two-level
scan/prefix decomposition GPU scan kernels use, expressed in
DataFrame ops.

Shard semantics: a document lands entirely in shard
floor(tokens_before / budget) — shards may overrun by at most one
document's tokens (documents are never split; splitting is
``ops.chunking``'s job upstream). All arithmetic is exact int64, so
the assignment is bit-identical at any parallelism and in the DuckDB
oracle's plain windowed cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKET = 8192  # docs per prefix-sum bucket (stage-3 window bound)


def assign_token_shards(
    documents: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    bucket: int = DEFAULT_BUCKET,
) -> DataFrame:
    """(doc_id, n_tokens, tokens_before, shard): sequential token-budget
    shard assignment in doc_id order. ``documents`` needs (doc_id,
    tokens_col) with int64-safe token counts.

    ``bucket`` trades the two stage bounds: the bucket relation has
    ~n/bucket rows (stage-2 single-partition window + broadcast) and
    each stage-4 window sorts <= bucket rows. The default suits up to
    ~10^9 docs; at 10^12 raise bucket to ~10^6 so the bucket relation
    stays broadcastable — both windows remain bounded."""
    toks = documents.select(
        "doc_id",
        F.col(tokens_col).cast("long").alias("n_tokens"),
        (F.col("doc_id") - F.pmod("doc_id", F.lit(bucket)))
        .alias("_bucket"),
    )
    # per-bucket totals (partial agg), then prefix over the tiny bucket
    # relation — the ONLY unbounded-order window runs over ~n/bucket rows
    bucket_offsets = (
        toks.groupBy("_bucket")
        .agg(F.sum("n_tokens").alias("_bsum"))
        .withColumn(
            "_before_bucket",
            F.coalesce(
                F.sum("_bsum").over(
                    Window.orderBy("_bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bucket", "_before_bucket")
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        toks.join(F.broadcast(bucket_offsets), "_bucket")
        .withColumn(
            "tokens_before",
            F.col("_before_bucket") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
        )
        .select(
            "doc_id",
            "n_tokens",
            "tokens_before",
            ((F.col("tokens_before") - F.pmod("tokens_before", F.lit(budget))) / budget)
            .cast("long")
            .alias("shard"),
        )
    )


def assign_token_shards_sql(docs_select: str, budget: int) -> str:
    """DuckDB oracle: the semantics stated directly — one windowed
    cumsum in doc_id order (the oracle may be sequential; the Spark
    side must only MATCH it)."""
    return f"""
WITH _d AS ({docs_select}),
_c AS (
  SELECT doc_id,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tokens_before
  FROM _d
)
SELECT doc_id, n_tokens, tokens_before,
       CAST((tokens_before - tokens_before % {budget}) / {budget} AS BIGINT) AS shard
FROM _c
"""


# ---------------------------------------------------------------------------
# per-host contribution caps
# ---------------------------------------------------------------------------


def cap_host_tokens(
    documents: DataFrame,
    budget: int,
    host_col: str = "source",
    text: str = "text",
) -> DataFrame:
    """Cap each host's contribution to the training mix at ``budget``
    tokens, keeping its BEST documents first (FineWeb-style domain
    balancing: without a cap, a handful of mega-hosts dominate the
    token mass even after per-doc quality gates).

    Per host: rank documents by quality (exact 1e6-scaled integer, the
    ``ops.host_rollup`` parity recipe) descending, doc_id ascending as
    the total tie-break; keep a document iff the tokens kept before it
    are still under budget (so the cap may overrun by at most one
    document, matching ``assign_token_shards`` semantics — documents
    are never split here).

    Scale shape: the only shuffle keys on the host; each window sorts
    one host's docs. Post-curation host fan-out is bounded (~10^5-10^6
    docs for the largest hosts), and a pathological host can be
    pre-trimmed by composing ``ops.host_rollup.gate_hosts_by_quality``
    or a per-(host, hash-bucket) pre-cap upstream; ordering by quality
    makes the cumulative sum inherently per-host-sequential, so a
    two-level prefix decomposition would still need the per-host sort.
    All ranking and accumulation is int64, bit-identical at any
    parallelism and in the oracle."""
    from esmarc_spark.ops.text import quality_score, token_count

    q6 = F.round(quality_score(text) * 1e6).cast("long")
    d = documents.select(
        F.col(host_col).alias("host"),
        "doc_id",
        q6.alias("q6"),
        token_count(text).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("host")
        .orderBy(F.col("q6").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.withColumn(
            "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .where(F.col("tokens_before") < budget)
        .select("host", "doc_id", "q6", "n_tokens", "tokens_before")
    )


def cap_host_tokens_sql(
    docs_select: str, budget: int, host_col: str = "source"
) -> str:
    """DuckDB oracle: identical quality-ordered windowed cumsum per
    host (quality/token SQL shared from ``ops.text``)."""
    from esmarc_spark.ops.text import QUALITY_SCORE_SQL, TOKEN_COUNT_SQL

    return f"""
WITH _d AS ({docs_select}),
_q AS (
  SELECT {host_col} AS host, doc_id,
         CAST(round({QUALITY_SCORE_SQL} * 1e6) AS BIGINT) AS q6,
         CAST({TOKEN_COUNT_SQL} AS BIGINT) AS n_tokens
  FROM _d
),
_c AS (
  SELECT host, doc_id, q6, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY host ORDER BY q6 DESC, doc_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tokens_before
  FROM _q
)
SELECT host, doc_id, q6, n_tokens, tokens_before
FROM _c WHERE tokens_before < {budget}
"""


def shard_manifest(shards: DataFrame) -> DataFrame:
    """Integrity manifest over :func:`assign_token_shards` output — the
    sidecar a training release publishes so a consumer can verify every
    shard it downloads: (shard, n_docs, n_tokens, content_md5) where
    ``content_md5`` hashes the comma-joined ascending doc_id list.

    The digest makes silent truncation/reordering detectable without
    re-reading any text: a missing or duplicated document changes the
    md5. Per-shard doc lists are bounded by the token budget (a shard
    holds ~budget/min-doc-tokens docs), so the collect_list + sort is a
    bounded per-key fold, never corpus-sized."""
    return (
        shards.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda d: d.cast("string"),
                    ),
                )
            ).alias("content_md5"),
        )
    )


def shard_manifest_sql(shards_sql: str) -> str:
    """DuckDB replay: identical join order via ORDER BY inside
    string_agg."""
    return f"""
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
         AS content_md5
FROM ({shards_sql})
GROUP BY shard
"""
