"""Relational operator coverage over the TPC-H-ish testdata: scans with
pushed filters, broadcast/shuffle joins, semi/anti joins (the reference's
IDFile scan and enrichment must_not prefilters, SURVEY.md §2.2-2.3),
aggregations, sorts and top-k.

Engine-portability rules used throughout (and by every oracle in
__spark_entry__):
  * money aggregates run in exact decimal (precision _DEC_P, see note
    below) — order-independent, so distributed vs single-threaded sums
    match bit-for-bit; the final cast to double + round(2) happens after
    the exact sum;
  * dates compare as date literals, group keys as strings;
  * every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Exact-decimal precision for money aggregates (round 8): 18 keeps
# Spark's Decimal on the compact-long fast path (precision <= 18 never
# allocates BigDecimal in the hot agg loop); products widen to
# decimal(37,4) and sums to decimal(28,2)/decimal(38,4) with ZERO
# precision loss at any realistic magnitude (prices ~1e5: even 1e12-row
# sums sit ~12 orders of magnitude under the cap), so results stay
# bit-identical to the former decimal(38,2) plan — the DuckDB oracle
# keeps its decimal(38,2) text and the value hashes still match
# (verified). Measured 1.55s -> 1.01s on the q1 aggregate, sf0.1/32c.
_DEC_P = 18


def _dec(col, scale=2):
    t = f"decimal({_DEC_P},{scale})"
    return F.col(col).cast(t) if isinstance(col, str) else col.cast(t)


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 flavor: pricing summary by returnflag/linestatus."""
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(f"decimal({_DEC_P},2)") - _dec("l_discount"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("2002-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(cast(sum(cast(l_quantity AS decimal(38,2))) AS double), 2) AS sum_qty,
       round(cast(sum(cast(l_extendedprice AS decimal(38,2))) AS double), 2) AS sum_base_price,
       round(cast(sum(cast(l_extendedprice AS decimal(38,2)) * (cast(1 AS decimal(38,2)) - cast(l_discount AS decimal(38,2)))) AS double), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= timestamp '2002-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 flavor: top-10 revenue orders for one market segment.
    customer dim is broadcast; orders⋈lineitem shuffles on o_orderkey."""
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(f"decimal({_DEC_P},2)") - _dec("l_discount"))
    # Round-8 note (guide §1.1): the "filter orders through customer
    # BEFORE the lineitem join" reorder was implemented and REVERTED —
    # with every input under the broadcast threshold the planner chose
    # BuildLeft and broadcast LINEITEM itself (600k-row hash relation on
    # the driver; measured 0.93s -> 1.86s). This shape keeps lineitem
    # strictly on the streamed side; at scale the runtime Bloom filter
    # (spark.sql.optimizer.runtime.bloomFilter, on by default) prunes the
    # lineitem side of the orderkey join instead.
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


Q3_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       round(cast(sum(cast(l_extendedprice AS decimal(38,2)) * (cast(1 AS decimal(38,2)) - cast(l_discount AS decimal(38,2)))) AS double), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_nation_revenue(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """TPC-H Q5 flavor: revenue by customer nation within one region —
    a 5-table join tree; nation/region broadcast, big sides shuffle once."""
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(f"decimal({_DEC_P},2)") - _dec("l_discount"))
    # Round-8 note (guide §1.1): the dim-chain reorder
    # (region(EUROPE)->nation->customer->orders before lineitem) was
    # implemented and REVERTED for the same planner flip as q3 — the
    # reordered tree made lineitem the BROADCAST side (BuildLeft,
    # measured 0.94s -> 1.62s). Catalyst already pushes the r_name
    # filter to the region scan in this shape; lineitem stays streamed.
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       round(cast(sum(cast(l_extendedprice AS decimal(38,2)) * (cast(1 AS decimal(38,2)) - cast(l_discount AS decimal(38,2)))) AS double), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def semi_join_idfile(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The reference's IDFile-restricted scan as a left-semi broadcast join
    (≈ /root/reference/esmarc/esmarc.py:269-270): orders of customers with
    acctbal > 9000."""
    ids = customer.where(F.col("c_acctbal") > 9000).select("c_custkey")
    return (
        orders.join(F.broadcast(ids), orders.o_custkey == ids.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


SEMI_JOIN_SQL = """
SELECT o_orderstatus, count(*) AS n_orders,
       round(cast(sum(cast(o_totalprice AS decimal(38,2))) AS double), 2) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def anti_join_unmatched(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """The enrichment bots' must_not prefilter as a left-anti join
    (≈ /root/reference/enrichment/wikidata.py:129-134): customers with no
    orders at all."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def events_hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event rollup — the batch rendering of a watermarked
    streaming window (SURVEY.md §2.7)."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_dec("value", 4)).cast("double"), 4).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       round(cast(sum(cast(value AS decimal(38,4))) AS double), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def window_topn_orders(orders: DataFrame, n: int = 3) -> DataFrame:
    """Top-N orders per customer by totalprice (deterministic tie-break) —
    ranking-window coverage; partial shuffle on o_custkey only."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select(
            "o_custkey",
            F.col("rank").cast("int").alias("rank"),
            "o_orderkey",
            F.round(F.col("o_totalprice").cast(f"decimal({_DEC_P},2)").cast("double"), 2).alias(
                "o_totalprice"
            ),
        )
        .orderBy("o_custkey", "rank")
    )


WINDOW_TOPN_SQL = """
SELECT o_custkey,
       cast(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS int) AS rank,
       o_orderkey,
       round(cast(cast(o_totalprice AS decimal(38,2)) AS double), 2) AS o_totalprice
FROM orders
QUALIFY rank <= 3
ORDER BY o_custkey, rank
"""


def rollup_revenue(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """ROLLUP (region, nation) over order totals — multi-level aggregate
    coverage; null grouping keys labeled 'ALL' for engine portability."""
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("total"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_orders",
            "total",
        )
        .orderBy("region", "nation")
    )


ROLLUP_REVENUE_SQL = """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       count(*) AS n_orders,
       round(cast(sum(cast(o_totalprice AS decimal(38,2))) AS double), 2) AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region, nation
"""


def events_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session assignment per user via lag + cumulative gap counting —
    the reference has no session op; this is the training-pipeline staple."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # double cast: parquet TIMESTAMP_NTZ -> timestamp -> epoch seconds
    # (session tz is pinned to UTC so the hop is exact)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sessions = events.withColumn("_new", new_session).withColumn(
        "session_seq", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
        .orderBy("user_id", "session_seq")
    )


def events_sessionize_sql(gap_minutes: int = 30) -> str:
    return f"""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {gap_minutes * 60}
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         -- cast: DuckDB window sum() yields HUGEINT which pandas renders as
         -- float64; Spark's is bigint -> value-hash mismatch without the cast
         cast(sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS bigint) AS session_seq
  FROM gaps
)
SELECT user_id, session_seq, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""
