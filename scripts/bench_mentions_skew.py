"""Zipfian mention-SURFACE evidence (VERDICT r3 next-round #6): one
surface form ("Germany", SURVEY §4's case) appears in ~every doc, so its
linked rows are ~half of all mentions.

What could skew here and what the design does about it:

* S2 join path — the broadcast gazetteer join is skew-immune by
  construction (the fact side never shuffles on the surface); the only
  key-partitioned step is the leftmost-longest fold's ``groupBy(url)``,
  whose keys are URLs — uniform regardless of surface skew. Measured by
  running the identical pipeline on a Zipf-head corpus vs a uniform
  corpus with the SAME total mention count.
* aggregation — ``count_mentions_salted`` (two-phase, hot key sharded
  over n_salts reducers) vs a naive single-phase groupBy on the hot
  canonical_url. Note Spark's hash agg already partial-aggregates
  map-side, so the naive plan is *also* mostly skew-immune for COUNT;
  the salted variant exists for aggregations whose partial state is
  wide. The bench reports both so the claim is measured, not asserted.

Usage: python scripts/bench_mentions_skew.py [n_docs] [cpus]
Writes BENCH/mentions_skew.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from esmarc_spark.pipeline.link import count_mentions_salted
    from esmarc_spark.pipeline.mentions import detect_mentions_ngram
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-mentions-skew", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def calibrate() -> float:
        df = spark.range(0, 300_000_000, 1, cpus * 2).agg(
            F.sum(F.xxhash64("id").cast("decimal(38,0)"))
        )
        df.collect()
        t0 = time.time()
        spark.range(0, 300_000_000, 1, cpus * 2).agg(
            F.sum(F.xxhash64("id").cast("decimal(38,0)"))
        ).collect()
        return round(time.time() - t0, 3)

    # gazetteer: 6000 synthetic surfaces (forces the join path) + the head
    gaz = (
        spark.range(6000)
        .selectExpr("concat('ent', id) as surface_form")
        .union(spark.createDataFrame([("Germany",)], "surface_form string"))
        .cache()
    )
    gaz.count()

    # two corpora, SAME doc count and SAME mentions/doc (2): in "zipf"
    # one of the two is always the head surface; in "uniform" both are
    # drawn uniformly. 50 filler tokens per doc.
    filler = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), F.lit(j)), 10_000).cast("string"),
            )
            for j in range(50)
        ],
    )

    def corpus(variant: str):
        u1 = F.concat(
            F.lit("ent"), F.pmod(F.xxhash64("id", F.lit(1)), 6000).cast("string")
        )
        u2 = F.concat(
            F.lit("ent"), F.pmod(F.xxhash64("id", F.lit(2)), 6000).cast("string")
        )
        first = F.lit("Germany") if variant == "zipf" else u1
        return spark.range(0, n_docs, 1, cpus * 2).select(
            F.concat(F.lit("https://d/"), F.col("id").cast("string")).alias("url"),
            F.concat_ws(" ", first, filler, u2).alias("text"),
            F.lit("en").alias("lang"),
        )

    paths = {}
    for variant in ("zipf", "uniform"):
        p = f"/tmp/mention_skew_{variant}_{n_docs}"
        corpus(variant).write.mode("overwrite").parquet(p)
        paths[variant] = p

    def detect_secs(variant: str) -> tuple[float, int]:
        docs = spark.read.parquet(paths[variant])
        # warm-up builds the bloom + broadcast; timed run re-plans fresh
        detect_mentions_ngram(docs, gaz).write.format("noop").mode(
            "overwrite"
        ).save()
        best = None
        n = 0
        for _ in range(2):
            docs = spark.read.parquet(paths[variant])
            m = detect_mentions_ngram(docs, gaz)
            t0 = time.time()
            n = m.count()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        return round(best, 3), n

    calibration = calibrate()
    zipf_sec, zipf_n = detect_secs("zipf")
    uni_sec, uni_n = detect_secs("uniform")

    # aggregation leg: linked rows with the hot canonical key (~50%)
    linked = (
        detect_mentions_ngram(spark.read.parquet(paths["zipf"]), gaz)
        .withColumn(
            "canonical_url",
            F.when(
                F.col("surface_form") == "Germany",
                F.lit("https://d-nb.info/gnd/4011882-4"),
            ).otherwise(F.concat(F.lit("https://d-nb.info/gnd/"), F.col("surface_form"))),
        )
        .withColumn("entity_type", F.lit("geo"))
    )
    linked.write.mode("overwrite").parquet(f"/tmp/mention_skew_linked_{n_docs}")
    linked = spark.read.parquet(f"/tmp/mention_skew_linked_{n_docs}")

    def agg_secs(salted: bool) -> float:
        best = None
        for _ in range(3):
            df = spark.read.parquet(f"/tmp/mention_skew_linked_{n_docs}")
            agg = (
                count_mentions_salted(df, n_salts=16)
                if salted
                else df.groupBy("canonical_url", "entity_type").agg(
                    F.count("*").alias("n_mentions")
                )
            )
            t0 = time.time()
            agg.write.format("noop").mode("overwrite").save()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        return round(best, 3)

    naive_sec = agg_secs(False)
    salted_sec = agg_secs(True)

    result = {
        "n_docs": n_docs,
        "cpus": cpus,
        "calibration_sec": calibration,
        "detect_zipf_sec": zipf_sec,
        "detect_uniform_sec": uni_sec,
        "detect_zipf_over_uniform": round(zipf_sec / uni_sec, 3),
        "mentions_zipf": zipf_n,
        "mentions_uniform": uni_n,
        "agg_naive_sec": naive_sec,
        "agg_salted_sec": salted_sec,
        "agg_salted_over_naive": round(salted_sec / naive_sec, 3),
        "note": (
            "join-path detection is skew-immune (fold keys are urls); "
            "COUNT aggs are protected by map-side partial agg, salting "
            "is for wide partial state"
        ),
    }
    (REPO / "BENCH" / "mentions_skew.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
