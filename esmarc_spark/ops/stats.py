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
