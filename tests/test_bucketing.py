"""Bucketed co-located joins: the join on the bucket key must run with
ZERO shuffle Exchanges, and results must equal the plain-join answer."""

import uuid

from pyspark.sql import functions as F

from esmarc_spark.ops.bucketing import bucketed_join, exchange_count, write_bucketed


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    # warehouse.dir is static per session; unique table names + DROP keep
    # the shared default warehouse clean
    suffix = uuid.uuid4().hex[:8]
    t_docs, t_scores = f"docs_{suffix}", f"scores_{suffix}"

    docs = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    scores = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("score")
    )
    try:
        write_bucketed(docs, t_docs, "doc_id", n_buckets=8)
        write_bucketed(scores, t_scores, "doc_id", n_buckets=8)

        joined = bucketed_join(spark, t_docs, t_scores, "doc_id")
        assert joined.count() == 5000
        # the whole point: no shuffle on either side
        assert exchange_count(joined) == 0

        # same join without bucketing shuffles both sides
        plain = docs.join(scores, "doc_id")
        # disable auto-broadcast so the comparison is shuffle-vs-bucket
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plain = docs.join(scores, "doc_id")
            plain.count()
            assert exchange_count(plain) >= 2
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )

        # values identical to the plain join
        a = {(r.doc_id, r.text, r.score) for r in joined.collect()}
        b = {(r.doc_id, r.text, r.score) for r in docs.join(scores, "doc_id").collect()}
        assert a == b
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_docs}")
        spark.sql(f"DROP TABLE IF EXISTS {t_scores}")


def test_bucketed_aggregation_is_exchange_free(spark, tmp_path):
    # groupBy on the bucket key also skips the shuffle
    suffix = uuid.uuid4().hex[:8]
    t = f"events_{suffix}"
    events = spark.range(0, 10000).select(
        (F.col("id") % 500).alias("doc_id"), F.col("id").alias("v")
    )
    try:
        write_bucketed(events, t, "doc_id", n_buckets=8)
        agg = spark.table(t).groupBy("doc_id").agg(F.sum("v").alias("s"))
        assert agg.count() == 500
        assert exchange_count(agg) == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
