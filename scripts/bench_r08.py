"""Round-8 optimization harness — bench.py is FROZEN for measurement, so
all exploratory numbers live here (guide §1.4: noop-sink isolation; §1.5:
labeled jobs).

Per-query: N repeated noop-materialized runs (min + all samples reported)
plus optional `.explain("formatted")` capture to a plans directory.

Usage:
    python scripts/bench_r08.py [--reps N] [--plans DIR] [--suffix TAG]
                                [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Prints one JSON line: {"queries": {name: min_sec}, "samples": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for plan capture")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--pipeline", action="store_true",
                    help="also time the webtext pipeline headline")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from esmarc_spark.session import get_spark

    spark = get_spark("esmarc-bench-r08", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = args.queries or list(BENCH_QUERIES)

    # warm-up: JIT/codegen/file cache (same protocol as bench.py)
    _noop(qs["kg_triples"](spark, SF_DIR))

    samples: dict[str, list[float]] = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        if args.plans:
            plans = Path(args.plans)
            plans.mkdir(parents=True, exist_ok=True)
            (plans / f"{name}_{args.suffix}.txt").write_text(
                _explain_formatted(df)
            )
        samples[name] = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"r08 {name} rep{r}")
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            samples[name].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)

    if args.pipeline:
        from esmarc_spark.pipeline.run import run_pipeline
        from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext

        n_docs = int(os.environ.get("SPARK_GRAFT_WEBTEXT_DOCS", "60000"))
        corpus = f"/tmp/esmarc_bench_corpus_{n_docs}"
        if not os.path.exists(corpus):
            synth_webtext(spark, n_docs=n_docs, partitions=64).write.mode(
                "overwrite"
            ).parquet(corpus)
        webtext = spark.read.parquet(corpus)
        gaz = gazetteer_df(spark)
        if args.plans:
            (Path(args.plans) / f"webtext_pipeline_{args.suffix}.txt").write_text(
                _explain_formatted(run_pipeline(webtext, gaz))
            )
        _noop(run_pipeline(webtext, gaz))  # warm
        samples["webtext_pipeline"] = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"r08 webtext_pipeline rep{r}")
            t0 = time.time()
            _noop(run_pipeline(webtext, gaz))
            samples["webtext_pipeline"].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)

    mins = {k: min(v) for k, v in samples.items() if v}
    print(json.dumps({
        "sf": Path(SF_DIR).name, "cpus": CPUS,
        "total_min": round(sum(mins.values()), 3),
        "queries": mins, "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
