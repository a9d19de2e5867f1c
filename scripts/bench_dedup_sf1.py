"""dedup_corpus scale curvature (round 6 — VERDICT r5 #6): wall time,
candidate-pair count, and CC round count at 60k docs vs 600k docs
(sf1-pattern key-shifted replicas: per-replica salted text so duplicate
CLUSTER COUNT scales 10x while cluster SIZE stays fixed — the honest
scale-up for pair-generating operators).

The question: does the convergence-checksum early-exit keep CC rounds
flat as dup-cluster structure replicates (it should — component
diameter is a property of the cluster, not the corpus), and is there
any super-linear step between the two points?

Writes BENCH/dedup_sf1.json.
Usage: python scripts/bench_dedup_sf1.py [base_docs] [replicas]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    base_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from esmarc_spark.ops.dedup import dedup_corpus, lsh_candidate_pairs
    from esmarc_spark.pipeline.webtext import synth_webtext
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-dedup-sf1", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    # calibration probe: fixed JVM work to normalize for VM phase
    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    # ids bounded into [0, 2^40) so the replica shift (rep << 40) can
    # never overflow the ANSI bigint range
    base = synth_webtext(
        spark, n_docs=base_docs, partitions=32, dup_fraction=0.1, seed=42
    ).select(F.pmod(F.xxhash64("url"), F.lit(1 << 40)).alias("doc_id"), "text")

    def replicate(n: int):
        # TOKEN-INTERLEAVED replica salt: a single appended token breaks
        # exact dedup (bench_sf1's pattern) but leaves cross-replica
        # Jaccard ~1.0 — near-dup clusters would merge across replicas
        # and grow in SIZE. Interleaving 'qN' between every token makes
        # replicas share ZERO k=3 shingles, so dup groups replicate in
        # COUNT with their size fixed — the honest scale-up for
        # pair-generating operators. The small point is replicate(1)
        # (same transform) so per-doc text shape matches the big point.
        reps = spark.range(n).select(F.col("id").alias("_rep"))
        return base.crossJoin(reps).select(
            (F.col("doc_id") + F.col("_rep") * F.lit(1 << 40)).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), " ", F.concat(F.lit(" q"), F.col("_rep"), F.lit(" "))
            ).alias("text"),
        )

    p_small = "/tmp/bench_dedup_sf1_small.parquet"
    p_big = "/tmp/bench_dedup_sf1_big.parquet"
    replicate(1).write.mode("overwrite").parquet(p_small)
    replicate(replicas).repartition(32).write.mode("overwrite").parquet(p_big)

    out = {
        "base_docs": base_docs,
        "replicas": replicas,
        "calibration_sec": calibration,
        "points": [],
    }
    for label, path in (("small", p_small), ("big", p_big)):
        docs = spark.read.parquet(path)
        n = docs.count()
        t0 = time.time()
        pairs = lsh_candidate_pairs(docs).count()
        pairs_sec = time.time() - t0
        stats: dict = {}
        t0 = time.time()
        survivors = dedup_corpus(docs, threshold=0.5, cc_stats=stats).count()
        dedup_sec = time.time() - t0
        point = {
            "label": label,
            "docs": n,
            "lsh_pairs": pairs,
            "lsh_pairs_sec": round(pairs_sec, 2),
            "dedup_corpus_sec": round(dedup_sec, 2),
            "survivors": survivors,
            **stats,
        }
        out["points"].append(point)
        print(json.dumps(point), flush=True)

    small, bigp = out["points"]
    ratio = bigp["dedup_corpus_sec"] / max(small["dedup_corpus_sec"], 1e-9)
    out["wall_ratio"] = round(ratio, 2)
    out["superlinear"] = ratio > 2.0 * replicas
    out["rounds_flat"] = bigp["cc_rounds"] <= small["cc_rounds"] + 1
    # dup-cluster structure replicated in COUNT, not SIZE: survivors must
    # scale ~linearly with the corpus (salt strong enough for near-dup)
    out["survivor_ratio"] = round(bigp["survivors"] / max(small["survivors"], 1), 2)
    print(json.dumps({k: out[k] for k in (
        "wall_ratio", "superlinear", "rounds_flat", "survivor_ratio")}))
    (REPO / "BENCH" / "dedup_sf1.json").write_text(json.dumps(out, indent=2) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
