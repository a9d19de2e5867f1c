"""SemDeDup at corpus scale (round 6): drive semdedup over synthetic
embeddings with planted semantic-duplicate pairs and record wall +
removal at two sizes.

Corpus model (deterministic, hash-derived): dim-32 vectors with
uniform hash components; 20% of ids form near-duplicate pairs (the odd
id is its even base plus a tiny perturbation — cosine ~0.9999), the
rest are independent directions (expected pairwise cosine ~0 at
dim 32).

Cost model this bench demonstrates (the honest 100-TB story):
with n_clusters = sqrt(n), BOTH stages are Theta(n^1.5 * d) — the
codebook fan-out n*k in assignment and sum(c^2) ~ n*sqrt(n) in the
within-cluster self-join. 4x docs => ~8x work. That is the published
SemDeDup regime (they hold cluster size ~constant and grow k, paying
the assignment side on GPUs); at true web scale the codebook goes
hierarchical (coarse quantizer then fine), which this operator admits
by passing a pre-trained `centroids` frame.

Writes BENCH/semdedup.json.
Usage: python scripts/bench_semdedup.py [n_vecs]
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DIM = 32


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000

    from pyspark.sql import functions as F

    from esmarc_spark.ops.semdedup import semdedup
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-semdedup", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    out = {"calibration_sec": calibration, "dim": DIM, "configs": []}
    for nv in (n_vecs // 4, n_vecs):
        path = f"/tmp/semdedup_corpus_{nv}"
        d = F.col("id")
        # 20% of ids pair up: ids with id%10 in {0,1} share a base
        is_dup_pair = F.pmod(d, F.lit(10)) < 2
        base = F.when(is_dup_pair, d - F.pmod(d, F.lit(2))).otherwise(d)

        def comp(j):
            u = (
                F.pmod(
                    F.xxhash64(F.concat(base.cast("string"), F.lit(f"_{j}"))),
                    F.lit(1000),
                ).cast("double")
                / 1000.0
                - 0.5
            )
            wobble = (
                F.pmod(
                    F.xxhash64(F.concat(d.cast("string"), F.lit(f"_w{j}"))),
                    F.lit(100),
                ).cast("double")
                / 100000.0
            )
            return F.when(
                is_dup_pair & (F.pmod(d, F.lit(2)) == 1), u + wobble
            ).otherwise(u).cast("float")

        emb = F.array(*[comp(j) for j in range(DIM)])
        spark.range(nv).select(
            d.alias("vec_id"), emb.alias("embedding")
        ).write.mode("overwrite").parquet(path)
        vecs = spark.read.parquet(path)
        k = int(math.sqrt(nv))

        def job():
            return semdedup(vecs, n_clusters=k, threshold=0.95)

        job().write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.time()
        job().write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        removed = job().where(~F.col("keep")).count()
        cfg = {
            "n_vecs": nv,
            "n_clusters": k,
            "wall_sec": wall,
            "vecs_per_sec": round(nv / wall, 1),
            "removed": removed,
            "removed_frac": round(removed / nv, 4),
        }
        out["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)

    a, b = out["configs"]
    ratio = b["n_vecs"] / a["n_vecs"]
    out["vecs_ratio"] = round(ratio, 2)
    out["wall_ratio"] = round(b["wall_sec"] / a["wall_sec"], 2)
    out["theory_ratio_n15"] = round(ratio**1.5, 2)
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "semdedup.json").write_text(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
