"""Quantify the round-5 single-job backfill vs the per-day driver loop
(VERDICT r4 perf-weak #2): same corpus, same day partitioning, both
run_incremental modes, outputs asserted identical.

The loop's cost is driver-serialized job latency (one write + three
actions per day); the batch path pays it once. The gap therefore grows
linearly with the number of pending days — at 30 days it is already
decisive, and a 3-year backfill (~1100 days) extrapolates from the
per-day overhead measured here.

Usage: python scripts/bench_backfill.py [n_docs] [n_days]
Writes BENCH/backfill.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from pyspark.sql import functions as F

    from esmarc_spark.pipeline.run import run_incremental
    from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-backfill", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    wt = (
        synth_webtext(spark, n_docs=n_docs, partitions=32, dup_fraction=0)
        .withColumn(
            "warc_ts",
            F.timestamp_seconds(
                F.lit(1700000000)
                + F.pmod(F.xxhash64("url"), F.lit(n_days)) * 86400
            ),
        )
        .cache()
    )
    wt.count()
    gaz = gazetteer_df(spark)

    work = Path(tempfile.mkdtemp(prefix="bench_backfill_"))
    results = {}
    triples = {}
    for mode in ("batch", "loop"):
        root = work / mode
        t0 = time.time()
        run_incremental(spark, wt, gaz, str(root), mode=mode)
        results[mode] = round(time.time() - t0, 3)
        triples[mode] = (
            spark.read.parquet(f"{root}/triples")
            .groupBy()
            .agg(
                F.count("*").alias("n"),
                F.sum(F.crc32(F.concat_ws("|", "subj", "pred", "obj", "pday"))).alias("sig"),
            )
            .collect()[0]
        )
    assert (triples["batch"]["n"], triples["batch"]["sig"]) == (
        triples["loop"]["n"], triples["loop"]["sig"],
    ), "backfill modes diverged"

    out = {
        "n_docs": n_docs,
        "n_days": n_days,
        "n_triples": triples["batch"]["n"],
        "loop_sec": results["loop"],
        "batch_sec": results["batch"],
        "speedup": round(results["loop"] / results["batch"], 2),
        "loop_sec_per_day": round(results["loop"] / n_days, 3),
        "batch_marginal_sec_per_day": round(results["batch"] / n_days, 3),
    }
    print(json.dumps(out))
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "backfill.json").write_text(json.dumps(out, indent=2) + "\n")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
