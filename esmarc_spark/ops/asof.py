"""As-of join: for each left row, the most recent right row at or before it.

Spark has no native ASOF join; the scalable pattern here is union +
carry-forward window instead of a range join: tag both sides, sort within
the key by (ts, side) and carry the last right-side value forward with
``last(..., ignorenulls=True)``. One shuffle on the key, O(n log n) local
sort, no quadratic range expansion — this survives 10^9 rows per key group
better than any interval self-join.

Verified against DuckDB's native ASOF JOIN (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_col: str = "ts",
    out_col: str = "asof_value",
) -> DataFrame:
    """left + ``out_col`` = right's ``value_col`` from the latest right row
    with right_ts <= left_ts (ties: right row wins, i.e. <=, matching
    DuckDB ASOF semantics)."""
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_r_val", F.lit(None).cast("string"))
    rhs = (
        right.select(
            key,
            F.col(right_ts).alias(left_ts),
            F.lit(0).alias("_side"),
            F.col(value_col).cast("string").alias("_r_val"),
        )
    )
    lhs_cols = [c for c in left.columns]
    unioned = lhs.select(
        *lhs_cols, "_side", "_r_val"
    ).unionByName(
        rhs.select(
            key,
            F.col(left_ts),
            "_side",
            "_r_val",
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lhs_cols if c not in (key, left_ts)],
        ),
        allowMissingColumns=False,
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(left_ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(out_col, F.last("_r_val", ignorenulls=True).over(w))
    return carried.where(F.col("_side") == 1).drop("_side", "_r_val")


def purchases_with_last_view(events: DataFrame) -> DataFrame:
    """Driver-contract instantiation: each purchase event joined as-of to
    the user's most recent prior (or simultaneous) view event."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.where(F.col("event_type") == "view").select("user_id", "ts")
    out = as_of_join(
        purchases, views, key="user_id", left_ts="ts", value_col="ts", out_col="last_view_ts"
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.date_format(F.col("last_view_ts").cast("timestamp"), "yyyy-MM-dd HH:mm:ss").alias(
            "last_view_ts"
        ),
    ).orderBy("event_id")


PURCHASES_LAST_VIEW_SQL = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""
