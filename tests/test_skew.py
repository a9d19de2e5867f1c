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


def test_cc_on_zipfian_giant_component(spark):
    """VERDICT r2 #7: CC must stay correct AND well-behaved when one
    component holds ~50% of all edges behind a single hub key. The star
    collapses in ~2 rounds, so the hub graph must not be slower than the
    uniform tail at equal edge count (the catastrophic-skew signature
    would be the reverse by a wide margin); full decomposition lives in
    scripts/bench_cc_skew.py -> BENCH/cc_skew.json."""
    import time

    from esmarc_spark.pipeline.canonicalize import connected_components

    half = 50_000
    hub = spark.range(half).select(
        F.lit("https://hub.example/0").alias("src"),
        F.concat(F.lit("https://star.example/"), F.col("id").cast("string")).alias("dst"),
    )
    tail = spark.range(half).select(
        F.concat(F.lit("https://t/"), (F.col("id") % 20000).cast("string")).alias("src"),
        F.concat(F.lit("https://t/"),
                 ((F.col("id") * 48271 + 11) % 20000).cast("string")).alias("dst"),
    )

    t0 = time.time()
    comp = connected_components(hub.union(tail)).cache()
    n_nodes = comp.count()
    zipf_sec = time.time() - t0
    # correctness: every star node collapses onto the hub (the lexicographic
    # min of its component), tail nodes never do
    giant = comp.where(F.col("component") == "https://hub.example/0")
    assert giant.count() == half + 1
    assert n_nodes == half + 20_000 + 1
    assert comp.where(
        F.col("node").startswith("https://t/")
        & (F.col("component") == "https://hub.example/0")
    ).count() == 0
    comp.unpersist()

    t0 = time.time()
    connected_components(tail).count()
    tail_sec = time.time() - t0
    # generous 3x guard band over the measured ~equal-or-faster behavior;
    # a quadratic hub blowup would exceed it by an order of magnitude
    assert zipf_sec <= 3 * max(tail_sec, 1.0), (zipf_sec, tail_sec)


def test_zipf_surface_detection_correct_and_bounded(spark):
    """Zipfian mention-surface guard band (VERDICT r3 #6): a head surface
    in EVERY doc must not break the join-path fold (fold keys are urls,
    uniform) and must stay within a loose wall-clock band of a uniform
    corpus with the same mention count. BENCH/mentions_skew.json carries
    the measured evidence (zipf/uniform 0.75 at 200k docs — the head is
    FASTER, like the CC hub); the band here is a regression tripwire, not
    a tight benchmark (VM timing noise)."""
    import time

    from esmarc_spark.pipeline.mentions import detect_mentions_ngram

    gaz = spark.range(5000).selectExpr("concat('ent', id) as surface_form")
    gaz = gaz.union(spark.createDataFrame([("Germany",)], "surface_form string")).cache()
    gaz.count()

    def corpus(zipf: bool):
        first = (
            F.lit("Germany")
            if zipf
            else F.concat(F.lit("ent"), F.pmod(F.xxhash64("id", F.lit(1)), 5000).cast("string"))
        )
        return spark.range(0, 8000, 1, 8).select(
            F.concat(F.lit("https://d/"), F.col("id").cast("string")).alias("url"),
            F.concat_ws(
                " ",
                first,
                F.concat(F.lit("w"), F.pmod(F.xxhash64("id"), 1000).cast("string")),
                F.concat(F.lit("ent"), F.pmod(F.xxhash64("id", F.lit(2)), 5000).cast("string")),
            ).alias("text"),
            F.lit("en").alias("lang"),
        )

    def run(zipf: bool):
        t0 = time.time()
        n = detect_mentions_ngram(corpus(zipf), gaz).count()
        return n, time.time() - t0

    run(False)  # warm-up (bloom + broadcast machinery)
    n_zipf, t_zipf = run(True)
    n_uni, t_uni = run(False)
    # every doc yields exactly 2 mentions in both corpora
    assert n_zipf == 16000 and n_uni == 16000
    assert t_zipf < 3 * t_uni + 1.0, (t_zipf, t_uni)
