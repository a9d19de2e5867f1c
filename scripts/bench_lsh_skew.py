"""Adversarial LSH bench (round 6 — VERDICT r5 #1): a template-heavy
corpus where thousands of near-identical boilerplate pages land in the
same (band, band_key) bucket.

Shows the degenerate-bucket guard's effect directly:

* unguarded (max_bucket_size=None): candidate pairs grow O(k^2) with
  template-cluster size k — measured at increasing k until the cost is
  undeniable (the 50k point would emit ~1.25e9 pairs/band and is not
  worth burning);
* guarded (default cap): pairs grow O(k), wall stays flat — the 50k
  point runs comfortably.

Corpus: k template pages (one rotating token each, pairwise Jaccard
~0.9 — a real boilerplate cluster), plus k unique filler docs so the
non-degenerate path still has work. Materialized to parquet first;
min-of-2 after one warm-up; noop sink.

Writes BENCH/lsh_skew.json.
Usage: python scripts/bench_lsh_skew.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def synth_template_corpus(spark, k_template: int, k_filler: int):
    from pyspark.sql import functions as F

    template = spark.range(k_template).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(
                "breaking news site template header navigation footer "
                "copyright subscribe newsletter cookie banner boilerplate "
                "article body placeholder text repeated across every page "
            ),
            F.lit("slot "),
            F.pmod("id", F.lit(97)).cast("string"),
        ).alias("text"),
    )
    filler = spark.range(k_filler).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit("unique document "),
            F.col("id").cast("string"),
            F.lit(" about "),
            F.conv(F.xxhash64("id"), 10, 16),
            F.lit(" with distinct content tokens "),
            F.conv(F.xxhash64("id", F.lit(1)), 10, 16),
            F.lit(" "),
            F.conv(F.xxhash64("id", F.lit(2)), 10, 16),
        ).alias("text"),
    )
    return template.unionByName(filler)


def timed_pairs(spark, path: str, max_bucket_size):
    from esmarc_spark.ops.dedup import lsh_candidate_pairs

    docs = spark.read.parquet(path)
    # rebuild lineage per run (stage reuse would fake the timing)
    n = lsh_candidate_pairs(docs, max_bucket_size=max_bucket_size).count()
    t0 = time.time()
    n = lsh_candidate_pairs(docs, max_bucket_size=max_bucket_size).count()
    wall = time.time() - t0
    return n, wall


def main() -> None:
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-lsh-skew", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    out = {"points": []}
    tmp = Path("/tmp/bench_lsh_skew")
    for k in (1_000, 2_000, 4_000, 8_000, 50_000):
        path = str(tmp / f"k{k}.parquet")
        synth_template_corpus(spark, k, k).repartition(32).write.mode(
            "overwrite"
        ).parquet(path)
        guarded_n, guarded_wall = timed_pairs(spark, path, 256)
        point = {
            "k_template": k,
            "guarded_pairs": guarded_n,
            "guarded_sec": round(guarded_wall, 2),
        }
        if k <= 8_000:  # unguarded 50k would emit ~5e9 pairs — skipped
            un_n, un_wall = timed_pairs(spark, path, None)
            point["unguarded_pairs"] = un_n
            point["unguarded_sec"] = round(un_wall, 2)
        out["points"].append(point)
        print(json.dumps(point), flush=True)

    (REPO / "BENCH" / "lsh_skew.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    spark.stop()


if __name__ == "__main__":
    main()
