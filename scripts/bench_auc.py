"""Exact AUC at corpus scale (round 7): drive ops.stats.exact_auc over
a synthetic scored corpus and record wall at two row counts plus a
score-cardinality sweep.

Corpus model (deterministic, hash-derived): G language groups, integer
scores in a bounded range (a permyriad-scaled model score has <= ~10^4
distinct values no matter the corpus size), labels correlated with the
score so the AUC is non-trivial (~0.75).

What the numbers must show for the 100-TB claim: the only full-data
shuffle is the (group, score) partial-agg count, so wall must track the
SCAN (10x rows within ~2-3x wall in this VM's fixed-overhead regime),
and a 16x score-cardinality increase at fixed rows must stay strongly
SUBLINEAR — the shuffled volume is the per-partition combined state
(min(rows, cardinality x groups x partitions)), not the row count.
Measured (BENCH/auc.json): 10x rows = 2.07x wall; 16x cardinality =
2.83x wall — the cardinality cost is the growing partial-agg state,
exactly the predicted term, while the cumulative window over the
distinct-score relation stays negligible at both cardinalities.

Writes BENCH/auc.json.
Usage: python scripts/bench_auc.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000

    from pyspark.sql import functions as F

    from esmarc_spark.ops.stats import exact_auc
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-auc", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    def corpus(nr: int, cardinality: int) -> str:
        path = f"/tmp/auc_corpus_{nr}_{cardinality}"
        d = F.col("id")
        h1 = F.abs(F.xxhash64(d, F.lit(1)))
        h2 = F.abs(F.xxhash64(d, F.lit(2)))
        # label ~ Bernoulli(0.4); positives draw scores shifted upward,
        # so AUC lands well off 0.5 and the tie structure is real
        label = (h1 % 10 < 4).alias("label")
        score = (
            F.when(
                h1 % 10 < 4, (h2 % (cardinality * 6 // 10)) + cardinality * 4 // 10
            )
            .otherwise(h2 % (cardinality * 7 // 10))
            .cast("long")
            .alias("score")
        )
        grp = F.concat(F.lit("lang"), (d % 8).cast("string")).alias("grp")
        spark.range(nr).select(grp, score, label).write.mode(
            "overwrite"
        ).parquet(path)
        return path

    out = {"calibration_sec": calibration, "configs": []}
    for nr, card in ((n_rows // 10, 10_000), (n_rows, 10_000), (n_rows, 160_000)):
        docs = spark.read.parquet(corpus(nr, card))
        exact_auc(docs, "score", "label", "grp").write.format("noop").mode(
            "overwrite"
        ).save()  # warm-up
        t0 = time.time()
        exact_auc(docs, "score", "label", "grp").write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.time() - t0, 2)
        sample = (
            exact_auc(docs, "score", "label", "grp")
            .orderBy("grp")
            .limit(2)
            .collect()
        )
        cfg = {
            "n_rows": nr,
            "score_cardinality": card,
            "wall_sec": wall,
            "rows_per_sec": round(nr / wall, 1),
            "auc_sample": {r["grp"]: r["auc_permyriad"] for r in sample},
        }
        out["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)

    small, big, wide = out["configs"]
    out["rows_ratio_wall"] = round(big["wall_sec"] / small["wall_sec"], 2)
    out["cardinality_ratio_wall"] = round(wide["wall_sec"] / big["wall_sec"], 2)
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "auc.json").write_text(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
