"""Exact distribution quantiles, distributed — corpus profiling that is
bit-identical at any parallelism.

Curation thresholds (length cut-offs, perplexity bands, per-language
budget floors) are usually set from corpus quantiles. Spark's
``percentile_approx`` is sketch-based (answer depends on merge order)
and exact ``percentile`` interpolates in floating point — neither
hash-matches an oracle. This module computes exact DISCRETE quantiles
(percentile_disc semantics: the smallest value whose cumulative count
reaches ``ceil(q * n)``) with integer-only arithmetic:

  1. the only full-data shuffle is ``groupBy(group, value)`` counts —
     partial-aggregated, its output bounded by value cardinality, not
     row count (token/char counts have ~10^4 distinct values at any
     corpus size);
  2. a per-group window over the DISTINCT-VALUE relation builds the
     cumulative counts (sort bounded by distinct values per group);
  3. quantile fractions are permyriad integers, thresholds are exact
     int64 ceilings — no float crosses an engine boundary.

The reference's analogue is its stats endpoints' count summaries; the
quantile formulation is the training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_QS = (2500, 5000, 7500, 9000, 9900)  # permyriad (q * 10000)


def _ceil_div(a: Column, b: int) -> Column:
    """Exact int64 ceil(a / b) for non-negative a."""
    num = a + F.lit(b - 1)
    return ((num - F.pmod(num, F.lit(b))) / b).cast("long")


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs_permyriad: tuple[int, ...] = DEFAULT_QS,
) -> DataFrame:
    """(group, q_permyriad, value): exact discrete quantiles of
    ``value_col`` per ``group_col``. NULL values are excluded (they
    have no order position)."""
    vc = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"), F.col(value_col).alias("val")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("grp")
    cum = vc.select(
        "grp",
        "val",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    qs = F.explode(
        F.array(*[F.lit(int(q)).cast("long") for q in qs_permyriad])
    ).alias("q_permyriad")
    hit = cum.select("grp", "val", "cum", "n", qs).where(
        F.col("cum") >= _ceil_div(F.col("n") * F.col("q_permyriad"), 10000)
    )
    return (
        hit.groupBy(F.col("grp").alias(group_col), "q_permyriad")
        .agg(F.min("val").alias("value"))
    )


def exact_quantiles_sql(
    source_select: str,
    value_col: str,
    group_col: str,
    qs_permyriad: tuple[int, ...] = DEFAULT_QS,
) -> str:
    """DuckDB oracle: the identical distinct-value cumulative counts
    and integer-ceiling thresholds, stated directly."""
    qlist = ", ".join(str(int(q)) for q in qs_permyriad)
    return f"""
WITH _src AS ({source_select}),
_vc AS (
  SELECT {group_col} AS grp, {value_col} AS val, COUNT(*) AS cnt
  FROM _src WHERE {value_col} IS NOT NULL
  GROUP BY 1, 2
),
_cum AS (
  SELECT grp, val,
         CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY val
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM _vc
),
_hit AS (
  SELECT grp, val, q_permyriad
  FROM _cum CROSS JOIN (SELECT unnest([{qlist}]) AS q_permyriad) _q
  WHERE cum >= CAST(((n * q_permyriad + 9999) - (n * q_permyriad + 9999) % 10000) / 10000 AS BIGINT)
)
SELECT grp AS {group_col}, CAST(q_permyriad AS BIGINT) AS q_permyriad,
       MIN(val) AS value
FROM _hit GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# exact AUC (round 7)
# ---------------------------------------------------------------------------
#
# Model-based curation (quality_model, lm perplexity, DSIR) needs its
# gatekeeper models EVALUATED on corpus-scale held-out labels, and a
# sampled sklearn AUC is neither reproducible nor cheap to audit. The
# Mann-Whitney rank-sum identity makes AUC exact and distributed: with
# average-rank tie handling,
#
#   2*R_pos = sum over distinct scores of p*(2*cum_below + t + 1)
#   2U      = 2*R_pos - n_pos*(n_pos+1)
#   AUC     = U / (n_pos * n_neg)
#
# all integers. The only full-data shuffle is groupBy(group, score)
# counts (partial-agged, bounded by score cardinality like
# exact_quantiles above); the cumulative window runs over the
# DISTINCT-SCORE relation. Products go through decimal(38,0) before the
# final floor division, so the result is bit-identical at any
# parallelism and row count (n_pos*n_neg overflows int64 past ~3e9
# rows per class).


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
) -> DataFrame:
    """(group, n_pos, n_neg, auc_permyriad): exact ROC AUC of an
    integer ``score_col`` against a boolean/0-1 ``label_col``, per
    ``group_col`` (evaluation slices — language, source). Average-rank
    ties (the standard Mann-Whitney convention); groups with a single
    class are dropped (AUC undefined), NULL scores are excluded (no
    order position — also keeps NULL ordering, which the engines
    disagree on, out of the window). ``auc_permyriad`` is the exact
    floor of 1e4 * AUC."""
    dec = "decimal(38,0)"
    vc = (
        df.where(F.col(score_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"), F.col(score_col).alias("val")
        )
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.sum(F.col(label_col).cast("int")).alias("p"),
        )
    )
    w_below = (
        Window.partitionBy("grp")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vc.withColumn(
        "cum_below", F.coalesce(F.sum("t").over(w_below), F.lit(0))
    )
    agg = cum.groupBy("grp").agg(
        F.sum("p").alias("n_pos"),
        F.sum(F.col("t") - F.col("p")).alias("n_neg"),
        F.sum(
            F.col("p").cast(dec)
            * (2 * F.col("cum_below") + F.col("t") + 1).cast(dec)
        ).alias("two_r"),
    )
    num = (
        F.lit(10000).cast(dec)
        * (
            F.col("two_r")
            - (F.col("n_pos").cast(dec) * (F.col("n_pos") + 1).cast(dec))
        )
    )
    den = (
        F.lit(2).cast(dec)
        * F.col("n_pos").cast(dec)
        * F.col("n_neg").cast(dec)
    )
    return (
        agg.where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            F.col("grp").alias(group_col),
            "n_pos",
            "n_neg",
            ((num - F.pmod(num, den)) / den)
            .cast("long")
            .alias("auc_permyriad"),
        )
    )


def exact_auc_sql(
    source_select: str,
    score_col: str,
    label_col: str,
    group_col: str,
) -> str:
    """DuckDB oracle: the identical rank-sum identity (HUGEINT carries
    the products; ``//`` is the same floor-for-positives division)."""
    return f"""
WITH _src AS ({source_select}),
_vc AS (
  SELECT {group_col} AS grp, {score_col} AS val,
         COUNT(*) AS t, SUM(CAST({label_col} AS INT)) AS p
  FROM _src WHERE {score_col} IS NOT NULL GROUP BY 1, 2
),
_cum AS (
  SELECT grp, t, p,
         COALESCE(SUM(t) OVER (PARTITION BY grp ORDER BY val
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_below
  FROM _vc
),
_agg AS (
  SELECT grp,
         CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(t - p) AS BIGINT) AS n_neg,
         SUM(p * (2 * cum_below + t + 1)) AS two_r
  FROM _cum GROUP BY grp
)
SELECT grp AS {group_col}, n_pos, n_neg,
       CAST((10000 * (two_r - n_pos * (CAST(n_pos AS HUGEINT) + 1)))
            // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
         AS auc_permyriad
FROM _agg
WHERE n_pos > 0 AND n_neg > 0
"""


# ---------------------------------------------------------------------------
# exact precision/recall curve (round 7)
# ---------------------------------------------------------------------------
#
# The AUC above summarizes ranking quality in one number; picking an
# actual GATE THRESHOLD for a curation model needs the full curve —
# at every candidate cutoff, how much junk passes (precision) and how
# much good data is lost (recall). Same distributed shape as exact_auc:
# the only full-data shuffle is the (group, score) partial-agg count;
# the descending cumulative window runs over the DISTINCT-SCORE
# relation (bounded by score cardinality, not rows). All-integer
# outputs: counts fit int64 up to ~1e12 rows/class and the permyriad
# numerators stay below 1e16.


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
) -> DataFrame:
    """One row per (group, distinct score) with the classifier
    "predict positive when score >= threshold": (group, threshold, tp,
    fp, fn, precision_permyriad, recall_permyriad) — exact floors.
    NULL scores are excluded (no order position), groups without a
    positive are dropped (recall undefined)."""
    vc = (
        df.where(F.col(score_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), F.col(score_col).alias("val"))
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.sum(F.col(label_col).cast("int")).alias("p"),
        )
    )
    w_ge = (
        Window.partitionBy("grp")
        .orderBy(F.col("val").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("grp")
    cum = vc.select(
        "grp",
        F.col("val").alias("threshold"),
        F.sum("p").over(w_ge).alias("tp"),
        (F.sum("t").over(w_ge) - F.sum("p").over(w_ge)).alias("fp"),
        (F.sum("p").over(w_all) - F.sum("p").over(w_ge)).alias("fn"),
        F.sum("p").over(w_all).alias("n_pos"),
    )
    return (
        cum.where(F.col("n_pos") > 0)
        .select(
            F.col("grp").alias(group_col),
            "threshold",
            "tp",
            "fp",
            "fn",
            F.expr("(10000 * tp) div (tp + fp)").alias("precision_permyriad"),
            F.expr("(10000 * tp) div n_pos").alias("recall_permyriad"),
        )
    )


def pr_curve_sql(
    source_select: str,
    score_col: str,
    label_col: str,
    group_col: str,
) -> str:
    """DuckDB oracle: identical counts, windows, and floors."""
    return f"""
WITH _vc AS (
  SELECT {group_col} AS grp, {score_col} AS val,
         CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CAST({label_col} AS INT)) AS BIGINT) AS p
  FROM ({source_select})
  WHERE {score_col} IS NOT NULL
  GROUP BY 1, 2
),
_cum AS (
  SELECT grp, val AS threshold,
         CAST(SUM(p) OVER w_ge AS BIGINT) AS tp,
         CAST(SUM(t) OVER w_ge - SUM(p) OVER w_ge AS BIGINT) AS fp,
         CAST(SUM(p) OVER w_all - SUM(p) OVER w_ge AS BIGINT) AS fn,
         CAST(SUM(p) OVER w_all AS BIGINT) AS n_pos
  FROM _vc
  WINDOW w_ge AS (PARTITION BY grp ORDER BY val DESC
                  ROWS UNBOUNDED PRECEDING),
         w_all AS (PARTITION BY grp)
)
SELECT grp AS {group_col}, threshold, tp, fp, fn,
       (10000 * tp) // (tp + fp) AS precision_permyriad,
       (10000 * tp) // n_pos AS recall_permyriad
FROM _cum WHERE n_pos > 0
"""
