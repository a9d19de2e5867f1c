#!/usr/bin/env python3
"""Minimal production-shaped job for `spark-submit --py-files <zip>`:
webtext parquet in, KG triples parquet out.

    spark-submit --master local[4] \
      --py-files $(python -c 'from esmarc_spark.deploy import package_zip; print(package_zip())') \
      scripts/submit_job.py <in_parquet> <out_dir> [n_synth_docs]

When <in_parquet> does not exist and n_synth_docs is given, a deterministic
synthetic corpus is materialized there first (for smoke runs). The script
imports esmarc_spark ONLY from the --py-files artifact — no repo on
sys.path — which is exactly the cluster deployment contract
(BASELINE.json north_star)."""

import sys

from pyspark.sql import SparkSession


def main() -> int:
    in_parquet, out_dir = sys.argv[1], sys.argv[2]
    n_synth = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    spark = (
        SparkSession.builder.appName("esmarc-submit-job")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    # these imports resolve from the --py-files zip on driver AND executors
    from esmarc_spark.pipeline.run import run_pipeline
    from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext

    import os

    if n_synth and not os.path.exists(in_parquet):
        synth_webtext(spark, n_docs=n_synth, partitions=4).write.parquet(in_parquet)

    webtext = spark.read.parquet(in_parquet)
    triples = run_pipeline(webtext, gazetteer_df(spark))
    triples.write.mode("overwrite").parquet(out_dir)
    n = spark.read.parquet(out_dir).count()
    print(f"TRIPLES_WRITTEN={n}")
    spark.stop()
    return 0 if n > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
