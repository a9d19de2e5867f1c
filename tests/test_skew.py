"""Skew handling evidence: AQE actually splits a skewed join partition
(plan shows isSkew=true) and the salted two-phase aggregation matches the
naive groupBy on a Zipf-skewed key."""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    # one giant key + uniform tail; thresholds tuned down so the skew is
    # "large" relative to them at test scale
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 60000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))  # 90% on key 0
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        joined = left.join(right, "k")
        # collect() on THIS plan instance so its AQE final plan is inspectable
        # (count() would execute a different QueryExecution)
        assert len(joined.collect()) == 60000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_counts_match_naive(spark):
    from esmarc_spark.pipeline.link import count_mentions_salted

    mentions = spark.range(0, 20000).select(
        F.when(F.col("id") % 4 < 3, F.lit("https://hot.example/e1"))
        .otherwise(F.concat(F.lit("https://e/"), (F.col("id") % 50).cast("string")))
        .alias("canonical_url"),
        F.concat(F.lit("https://page/"), (F.col("id") % 777).cast("string")).alias("url"),
        (F.col("id") % 100).alias("position"),
        F.lit("topics").alias("entity_type"),
    )
    salted = {
        (r.canonical_url, r.n_mentions)
        for r in count_mentions_salted(mentions, n_salts=8).collect()
    }
    naive = {
        (r.canonical_url, r["count"])
        for r in mentions.groupBy("canonical_url").count().collect()
    }
    assert salted == naive
