"""Micro-bench: detect_mentions_ngram join path with/without the anchor
Bloom prefilter, at a gazetteer size (10^5 surfaces) where the inline path
is off the table.

The prefilter's claim (VERDICT r2 #1): without it, gram construction costs
corpus_tokens x |gazetteer lengths| string concats at every position; with
it, only positions whose token passes the first-token Bloom build grams.
This script measures that end-to-end and asserts output equality.

Usage: python scripts/bench_mentions.py [n_surfaces] [n_docs]
Writes BENCH/mentions_prefilter.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_surfaces = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from pyspark.sql import functions as F

    from esmarc_spark.pipeline.mentions import detect_mentions_ngram
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-mentions", cpus=32)

    # gazetteer: 10^5 surfaces, lengths 1-3, mostly over a disjoint vocab
    # ("ent<i>"); only surfaces with id % 50 == 0 start with a corpus token
    # ("w<i % 200>") — so ~2% of the 10^4-word corpus vocab are anchor
    # tokens, the realistic case (most corpus tokens never start an entity
    # name)
    gaz = (
        spark.range(n_surfaces)
        .select(
            F.concat_ws(
                " ",
                F.when(F.col("id") % 50 == 0, F.concat(F.lit("w"), (F.col("id") % 200).cast("string")))
                .otherwise(F.concat(F.lit("ent"), F.col("id").cast("string"))),
                F.when(F.col("id") % 3 == 1, F.concat(F.lit("sub"), (F.col("id") % 7919).cast("string"))),
                F.when(F.col("id") % 9 == 2, F.concat(F.lit("tail"), (F.col("id") % 311).cast("string"))),
                F.when(F.col("id") % 11 == 3, F.concat(F.lit("mid"), (F.col("id") % 101).cast("string"))),
                F.when(F.col("id") % 13 == 4, F.concat(F.lit("end"), (F.col("id") % 53).cast("string"))),
            ).alias("surface_form")
        )
        .cache()
    )
    gaz.count()

    docs = (
        spark.range(n_docs)
        .select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(F.col("id"), F.lit(j)), 10_000).cast("string"),
                    )
                    for j in range(50)
                ],
            ).alias("text"),
            F.lit("en").alias("lang"),
        )
        .cache()
    )
    docs.count()

    def run(prefilter: bool) -> tuple[float, float, int]:
        # plan time (gazetteer probe jobs + bloom build, amortized at real
        # corpus scale) vs execution time (the per-token work that scales
        # with the corpus — the quantity the prefilter targets)
        t0 = time.time()
        df = detect_mentions_ngram(
            docs, gaz, max_inline_surfaces=0, anchor_prefilter=prefilter
        )
        plan = time.time() - t0
        t0 = time.time()
        n = df.count()
        return plan, time.time() - t0, n

    run(True)  # warm-up (JIT + broadcast)
    run(False)
    plan_with, with_f, n_with = run(True)
    plan_wo, without_f, n_without = run(False)
    _, with_f2, _ = run(True)
    _, without_f2, _ = run(False)
    assert n_with == n_without, (n_with, n_without)

    out = {
        "n_surfaces": n_surfaces,
        "n_docs": n_docs,
        "n_mentions": n_with,
        "with_prefilter_sec": round(min(with_f, with_f2), 3),
        "without_prefilter_sec": round(min(without_f, without_f2), 3),
        "plan_overhead_sec": round(plan_with - plan_wo, 3),
        "exec_speedup": round(
            min(without_f, without_f2) / min(with_f, with_f2), 2
        ),
    }
    print(json.dumps(out))
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "mentions_prefilter.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    spark.stop()


if __name__ == "__main__":
    main()
