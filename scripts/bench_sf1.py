"""sf1-class scale point (VERDICT r3 next-round #4): run the headline
suite at ~10x the sf0.1 input and check every query's wall time stays
~linear in the data — anything super-linear is a hidden quadratic the
sf0.1 bench cannot see.

The sf1 tables are derived deterministically from sf0.1 by key-shifted
replication (10 replicas, keys offset by replica * (max_key + 1)), so

* join fan-out is preserved (a shifted orderkey joins ONLY its own
  replica's lineitems — naive duplication would fan out 10x10);
* dedup/pair structure is preserved per replica (document text is
  salted with the replica id, so duplicate groups scale 10x in COUNT,
  not 10x in SIZE — pair output stays linear);
* the webtext pipeline runs at 10x docs (600k).

Aggregate result sizes (tpch_q1 groups, lang counts) stay constant or
grow 10x linearly by construction, so per-query time ratios near 10x
input are attributable to the PLAN, not to output blow-up.

Usage: python scripts/bench_sf1.py [cpus]
Writes BENCH/sf1.json: per-query sec at sf0.1 and sf1-like, the ratio,
calibration_sec for the window, and a superlinear flag per query
(ratio > SUPRA x 10, SUPRA=2 to absorb VM noise).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/esmarc_sf1"
REPLICAS = 10
SUPRA = 2.0  # superlinear flag threshold: ratio > SUPRA * REPLICAS

BENCH_QUERIES = [
    "kg_triples",
    "kg_entity_counts",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "events_sessions",
    "text_stats",
    "dedup_lsh_pairs",
    "dedup_simhash",
    "sim_topk",
]

# key columns shifted by replica * (max_key + 1), per table
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key spaces must shift CONSISTENTLY across tables (fk -> pk)
KEY_SPACE = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "event_id": "eventid", "user_id": "userid",
    "doc_id": "docid", "vec_id": "vecid",
}


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1, exist_ok=True)
    # one consistent max per key SPACE (max over every column mapped to it)
    space_max: dict[str, int] = {}
    for table, cols in SHIFT_KEYS.items():
        df = spark.read.parquet(f"{SF01}/{table}.parquet")
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        for c in cols:
            sp = KEY_SPACE[c]
            space_max[sp] = max(space_max.get(sp, 0), int(row[c]))

    for table in ["region", "nation"]:  # dims: single copy
        spark.read.parquet(f"{SF01}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF1}/{table}.parquet")

    replicas = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    for table, cols in SHIFT_KEYS.items():
        df = spark.read.parquet(f"{SF01}/{table}.parquet")
        out = df.crossJoin(F.broadcast(replicas))
        for c in cols:
            out = out.withColumn(
                c, F.col(c) + F.col("_r") * (space_max[KEY_SPACE[c]] + 1)
            )
        if table == "documents":
            # salt text per replica so duplicate GROUPS replicate instead
            # of growing 10x deep (keeps pair output linear)
            out = out.withColumn(
                "text",
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" r"), F.col("_r"))
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        out.drop("_r").repartition(32).write.mode("overwrite").parquet(
            f"{SF1}/{table}.parquet"
        )


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from esmarc_spark.pipeline.run import run_pipeline
    from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-sf1", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{SF1}/lineitem.parquet"):
        build_sf1(spark)

    def calibrate() -> float:
        spark.range(0, 300_000_000, 1, cpus * 2).agg(
            F.sum(F.xxhash64("id").cast("decimal(38,0)"))
        ).collect()
        t0 = time.time()
        spark.range(0, 300_000_000, 1, cpus * 2).agg(
            F.sum(F.xxhash64("id").cast("decimal(38,0)"))
        ).collect()
        return round(time.time() - t0, 3)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    noop(qs["kg_triples"](spark, SF01))  # warm-up

    calibration = calibrate()
    timings: dict[str, dict] = {}
    for name in BENCH_QUERIES:
        per = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.time()
            noop(qs[name](spark, sf_dir))
            per[label] = round(time.time() - t0, 3)
        per["ratio"] = round(per["sf1"] / per["sf0.1"], 2)
        per["superlinear"] = per["ratio"] > SUPRA * REPLICAS
        timings[name] = per

    # webtext pipeline at 10x docs
    pipe = {}
    for label, n_docs in (("sf0.1", 60_000), ("sf1", 600_000)):
        corpus = f"/tmp/esmarc_bench_corpus_{n_docs}"
        if not os.path.exists(corpus):
            synth_webtext(spark, n_docs=n_docs, partitions=64).write.mode(
                "overwrite"
            ).parquet(corpus)
        webtext = spark.read.parquet(corpus)
        gaz = gazetteer_df(spark)
        run_pipeline(webtext, gaz).count()  # warm-up this size
        t0 = time.time()
        noop(run_pipeline(webtext, gaz))
        pipe[label] = round(time.time() - t0, 3)
    pipe["ratio"] = round(pipe["sf1"] / pipe["sf0.1"], 2)
    pipe["superlinear"] = pipe["ratio"] > SUPRA * REPLICAS
    timings["webtext_pipeline"] = pipe

    result = {
        "replicas": REPLICAS,
        "cpus": cpus,
        "calibration_sec": calibration,
        "queries": timings,
        "superlinear": sorted(
            n for n, t in timings.items() if t["superlinear"]
        ),
    }
    (REPO / "BENCH" / "sf1.json").write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
