"""Incremental vs from-scratch corpus dedup cost (round 6 — VERDICT
r5 #2): as the corpus accumulates dumps, the incremental per-dump step
must stay ~flat (O(new + touched history)) while from-scratch
``dedup_corpus`` over the cumulative corpus grows with corpus age.

Corpus: ``n_dumps`` dumps of ``n_docs`` synthetic webtext docs each.
Each dump carries ~10% internal near-dups plus a ~5% slice of docs that
duplicate the PREVIOUS dump (cross-dump clusters — the case incremental
dedup exists for). Everything parquet-materialized first; each
incremental step timed end-to-end INCLUDING its state publish (that is
the real per-dump cost); from-scratch timed at each cumulative point.

Both paths run UNGUARDED (max_bucket_size=None): the final
survivor-equality check requires identical edge-generation semantics,
and the degenerate-bucket guard is a deliberate approximation whose
per-dump buckets differ from the global ones (a bucket can exceed the
cap globally while every per-dump slice stays under it — measured: 742
global vs 110 per-dump on this corpus — so guarded incremental and
guarded from-scratch legitimately diverge on borderline pairs). The
guard's own cost/benefit is benched in BENCH/lsh_skew.json.

Writes BENCH/dedup_incremental.json.
Usage: python scripts/bench_dedup_incremental.py [n_docs_per_dump] [n_dumps]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_dumps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql import functions as F

    from esmarc_spark.ops.dedup import dedup_corpus
    from esmarc_spark.ops.dedup_incremental import (
        dedup_incremental_dump,
        incremental_survivors,
    )
    from esmarc_spark.pipeline.webtext import synth_webtext
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-dedup-incremental", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    tmp = Path("/tmp/bench_dedup_incremental")
    shutil.rmtree(tmp, ignore_errors=True)
    state_root = str(tmp / "state")

    # materialize the dumps: ids are dump-offset; the cross-dump dup
    # slice reuses the previous dump's text under a fresh id
    paths = []
    for d in range(n_dumps):
        base = synth_webtext(
            spark, n_docs=n_docs, partitions=32, dup_fraction=0.1, seed=100 + d
        ).select(
            (F.xxhash64("url") + F.lit(d)).alias("doc_id"), "text"
        )
        if d > 0:
            prev = spark.read.parquet(paths[-1])
            overlap = (
                prev.orderBy("doc_id")
                .limit(n_docs // 20)
                .select((F.col("doc_id") + F.lit(1 << 32)).alias("doc_id"), "text")
            )
            base = base.unionByName(overlap)
        p = str(tmp / f"dump{d}.parquet")
        base.write.mode("overwrite").parquet(p)
        paths.append(p)

    out = {"n_docs_per_dump": n_docs, "n_dumps": n_dumps, "steps": []}
    for d in range(n_dumps):
        new = spark.read.parquet(paths[d])
        history = spark.read.parquet(*paths[:d]) if d else None
        t0 = time.time()
        dedup_incremental_dump(
            spark,
            new,
            state_root,
            f"d{d}",
            history_docs=history,
            max_bucket_size=None,
        ).write.format("noop").mode("overwrite").save()
        inc_sec = time.time() - t0

        cumulative = spark.read.parquet(*paths[: d + 1])
        t0 = time.time()
        dedup_corpus(
            cumulative, threshold=0.5, max_bucket_size=None
        ).write.format("noop").mode("overwrite").save()
        scratch_sec = time.time() - t0
        step = {
            "dump": d,
            "corpus_docs": cumulative.count(),
            "incremental_sec": round(inc_sec, 2),
            "from_scratch_sec": round(scratch_sec, 2),
        }
        out["steps"].append(step)
        print(json.dumps(step), flush=True)

    # final correctness spot-check at bench scale: identical survivors
    all_docs = spark.read.parquet(*paths)
    inc = incremental_survivors(spark, state_root, all_docs).select("doc_id")
    scratch = dedup_corpus(
        all_docs, threshold=0.5, max_bucket_size=None
    ).select("doc_id")
    inc_n, scratch_n = inc.count(), scratch.count()
    out["final_survivors_incremental"] = inc_n
    out["final_survivors_from_scratch"] = scratch_n
    out["survivors_match"] = (
        inc_n == scratch_n and inc.exceptAll(scratch).count() == 0
    )
    print(
        json.dumps(
            {
                "survivors_match": out["survivors_match"],
                "incremental": inc_n,
                "from_scratch": scratch_n,
            }
        )
    )

    (REPO / "BENCH" / "dedup_incremental.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    spark.stop()


if __name__ == "__main__":
    main()
