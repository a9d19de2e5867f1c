"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...}

Timing protocol (BASELINE.md): one warm-up execution of the flagship before
any timing; each query then timed once, fully materialized through a noop
sink (count() would let Catalyst prune the projections we're measuring).

The KG headline is the full webtext pipeline (S1-S5) over a synthetic
corpus sized ~ the sf's lineitem row count; triples_per_sec is the
BASELINE.json headline metric.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# webtext corpus size for the pipeline headline; sf0.1 -> 60k docs
WEBTEXT_DOCS = int(os.environ.get("SPARK_GRAFT_WEBTEXT_DOCS", "60000"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entrymod
    from esmarc_spark.pipeline.run import run_pipeline
    from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext
    from esmarc_spark.session import get_spark

    sf_label = Path(SF_DIR).name
    spark = get_spark("esmarc-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    bench_queries = [
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

    # ---- warm-up (JIT, codegen, file cache) -------------------------------
    _noop(qs["kg_triples"](spark, SF_DIR))

    # ---- machine-health calibration (reported, never subtracted) ----------
    # the sandbox VM's compute delivery swings in sustained phases (same-
    # session ceiling controls measured 0.74-0.93 scaling efficiency);
    # this fixed pure-JVM probe lets any consumer normalize a bench run
    # against the machine's state in THAT window
    from pyspark.sql import functions as F

    def _calibrate() -> float:
        df = spark.range(0, 300_000_000, 1, CPUS * 2).agg(
            F.sum(F.xxhash64("id").cast("decimal(38,0)"))
        )
        df.collect()
        t0 = time.time()
        spark.range(0, 300_000_000, 1, CPUS * 2).agg(
            F.sum(F.xxhash64("id").cast("decimal(38,0)"))
        ).collect()
        return round(time.time() - t0, 3)

    calibration_sec = _calibrate()

    timings: dict[str, float] = {}
    for name in bench_queries:
        t0 = time.time()
        _noop(qs[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # ---- KG pipeline headline: materialized webtext corpus -> triples -----
    # (parquet input like production reads Iceberg; generation excluded)
    corpus = f"/tmp/esmarc_bench_corpus_{WEBTEXT_DOCS}"
    if not os.path.exists(corpus):
        synth_webtext(spark, n_docs=WEBTEXT_DOCS, partitions=64).write.mode(
            "overwrite"
        ).parquet(corpus)
    webtext = spark.read.parquet(corpus)
    gaz = gazetteer_df(spark)
    n_triples = run_pipeline(webtext, gaz).count()  # warm-up + size
    t0 = time.time()
    _noop(run_pipeline(webtext, gaz))
    pipeline_sec = round(time.time() - t0, 3)
    timings["webtext_pipeline"] = pipeline_sec
    triples_per_sec = round(n_triples / pipeline_sec, 1) if pipeline_sec else None

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_label,
                "cpus": CPUS,
                "webtext_docs": WEBTEXT_DOCS,
                "triples": n_triples,
                "triples_per_sec": triples_per_sec,
                "calibration_sec": calibration_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
