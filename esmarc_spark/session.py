"""SparkSession factory with scale-oriented defaults.

All knobs here are chosen for the 100 TB design point and merely *also* work
on local[N]:

- AQE on (runtime coalescing + skew-join splitting) — the reference has no
  optimizer at all (SURVEY.md §4); we lean on Catalyst + AQE instead.
- Arrow on — every Python-side stage in this engine is a vectorized
  pandas/Arrow UDF (BASELINE.json input_hint: "no per-row Python").
- shuffle partitions sized by parallelism, overridable by env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "esmarc-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus * 2, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Ship the package to Python workers — the local-mode equivalent of
    # `spark-submit --py-files esmarc_spark.zip` on a real cluster. Without
    # this, executors spawned from a driver outside the repo can't unpickle
    # our mapInPandas stages.
    from esmarc_spark.deploy import package_zip

    spark.sparkContext.addPyFile(package_zip())
    return spark
