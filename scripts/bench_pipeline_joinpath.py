"""Full-pipeline bench on the PRODUCTION mentions path: S1–S5 with a
10^5-surface gazetteer, which flips detect_mentions_ngram to the
join+Bloom-prefilter strategy (the inline path caps at 4096 surfaces).

The synthetic surfaces use a vocabulary disjoint from the corpus filler
words, so the big gazetteer must produce EXACTLY the same triples as the
small real one — asserted — while exercising the plan the 100-TB
deployment would run.

Usage: python scripts/bench_pipeline_joinpath.py [n_docs] [n_extra_surfaces]
Writes BENCH/pipeline_joinpath.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_extra = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import functions as F

    from esmarc_spark.pipeline.run import run_pipeline
    from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-joinpath", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = f"/tmp/esmarc_bench_corpus_{n_docs}"
    if not os.path.exists(corpus):
        synth_webtext(spark, n_docs=n_docs, partitions=64).write.mode(
            "overwrite"
        ).parquet(corpus)
    webtext = spark.read.parquet(corpus)

    small = gazetteer_df(spark)
    # synthetic surfaces on a disjoint vocab (corpus filler is real words;
    # "qq<i> zz<j>" never occurs), 1-3 tokens, same schema as the dim
    extra = spark.range(n_extra).select(
        F.concat_ws(
            " ",
            F.concat(F.lit("qq"), F.col("id").cast("string")),
            F.when(F.col("id") % 3 == 1,
                   F.concat(F.lit("zz"), (F.col("id") % 7919).cast("string"))),
            F.when(F.col("id") % 9 == 2,
                   F.concat(F.lit("vv"), (F.col("id") % 311).cast("string"))),
        ).alias("surface_form"),
        F.lit("topics").alias("entity_type"),
        F.lit("gnd").alias("authority_prefix"),
        F.concat(F.lit("4"), F.col("id").cast("string"), F.lit("-0")).alias(
            "authority_id"
        ),
        F.concat(
            F.lit("https://d-nb.info/gnd/4"), F.col("id").cast("string"),
            F.lit("-0"),
        ).alias("canonical_url"),
    )
    big = small.unionByName(extra).cache()
    big.count()

    def run(gaz) -> tuple[float, int]:
        n = run_pipeline(webtext, gaz).count()  # warm + size
        t0 = time.time()
        run_pipeline(webtext, gaz).write.format("noop").mode("overwrite").save()
        return time.time() - t0, n

    small_sec, small_n = run(small)
    big_sec, big_n = run(big)
    big_sec2, _ = run(big)
    assert small_n == big_n, (small_n, big_n)

    out = {
        "n_docs": n_docs,
        "gazetteer_surfaces": n_extra + small.count(),
        "triples": big_n,
        "small_gaz_inline_sec": round(small_sec, 3),
        "big_gaz_joinpath_sec": round(min(big_sec, big_sec2), 3),
        "joinpath_triples_per_sec": round(big_n / min(big_sec, big_sec2), 1),
    }
    print(json.dumps(out))
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "pipeline_joinpath.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    spark.stop()


if __name__ == "__main__":
    main()
