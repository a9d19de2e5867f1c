"""Bucketed (co-located) joins — the shuffle-elimination tool for repeated
big-x-big joins on a stable key.

At 100 TB the dominant cost of a fact-x-fact join is shuffling both sides.
When the same join key is used run after run (url, doc_id, canonical_url),
bucketing pays the shuffle ONCE at write time: both tables are written
pre-hash-partitioned (and sorted) into N buckets on the key, and every
later equi-join on that key is a zero-Exchange SortMergeJoin — each task
reads bucket i of both sides. The bench/tests assert the Exchange is
actually absent from the physical plan, not just assumed.

Notes for real clusters:
  * bucket count is a write-time commitment — pick ~2-4x target
    parallelism at the JOIN, not at the write;
  * both sides must have the SAME bucket count (Spark can't co-locate
    mismatched counts without re-shuffling one side);
  * spark.sql.sources.bucketing.enabled is on by default; AQE leaves
    bucketed joins alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+sorted) parquet table in the session
    catalog. The one-time shuffle happens here; subsequent equi-joins on
    ``key`` between tables bucketed with the same ``n_buckets`` are
    exchange-free."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.repartition(n_buckets, *keys)  # align write tasks with buckets
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str | list[str]
) -> DataFrame:
    """Equi-join two same-bucketed catalog tables on ``key``."""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), keys)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the final physical plan —
    0 for a correctly co-located bucketed join."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
