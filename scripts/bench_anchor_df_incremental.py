"""Round-7 scale evidence for the two newest incremental stores: the
anchor-gazetteer vote state and the keyword df state.

Protocol (matches BENCH/dedup_incremental.json / pagerank_incremental):
commit N successive synthetic dumps; per dump, measure (a) the
incremental ingest wall (extract + merge against persisted state) and
(b) the from-scratch wall over the concatenated dumps so far. The claim
the numbers must support: per-dump cost stays ~flat while from-scratch
grows with corpus age — the property that makes a growing crawl
affordable. Results are asserted identical (gazetteer rows / keyword
rows per dump) before timing is trusted.

Writes BENCH/anchor_df_incremental.json.
Usage: python scripts/bench_anchor_df_incremental.py [docs_per_dump] [n_dumps]
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
    per_dump = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_dumps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from esmarc_spark.ops.keywords import extract_keywords, ingest_keywords_dump
    from esmarc_spark.ops.linkgraph import harvest_anchor_texts
    from esmarc_spark.ops.linkgraph_incremental import ingest_anchor_dump
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-incr-stores", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    d = F.col("id")

    def pages(lo, hi):
        # TWO links with coprime multipliers: each dst host collects
        # many distinct linking hosts (a single-multiplier synthesis is
        # a 1:1 residue map — every vote count 1, empty gazetteer)
        dst1 = F.pmod(d * 7 + 3, F.lit(5000)).cast("string")
        dst2 = F.pmod(d * 11 + 5, F.lit(5000)).cast("string")
        return spark.range(lo, hi).select(
            F.concat(
                F.lit("https://h"), F.pmod(d, F.lit(5000)).cast("string"),
                F.lit(".example/p/"), d.cast("string"),
            ).alias("url"),
            F.concat(
                F.lit('<a href="https://h'), dst1,
                F.lit('.example/x">brand '), dst1, F.lit(" official</a>"),
                F.lit('<a href="https://h'), dst2,
                F.lit('.example/y">brand '), dst2, F.lit(" official</a>"),
            ).alias("html"),
        )

    def docs(lo, hi):
        return spark.range(lo, hi).select(
            d.alias("doc_id"),
            F.concat(
                F.lit("shared corpus words topic"),
                F.pmod(d, F.lit(900)).cast("string"),
                F.lit(" rare"),
                F.xxhash64(d.cast("string")).cast("string"),
            ).alias("text"),
        )

    out = {
        "calibration_sec": calibration,
        "docs_per_dump": per_dump,
        "anchor": [],
        "keywords_df": [],
    }
    aroot = tempfile.mkdtemp(prefix="bench_gaz_")
    kroot = tempfile.mkdtemp(prefix="bench_df_")
    try:
        for n in range(n_dumps):
            lo, hi = n * per_dump, (n + 1) * per_dump

            t0 = time.time()
            inc = ingest_anchor_dump(spark, pages(lo, hi), aroot, f"d{n}")
            inc_rows = inc.count()
            inc_wall = round(time.time() - t0, 2)
            t0 = time.time()
            full_rows = harvest_anchor_texts(pages(0, hi)).count()
            full_wall = round(time.time() - t0, 2)
            assert inc_rows == full_rows, (n, inc_rows, full_rows)
            rec = {
                "dump": n,
                "incremental_sec": inc_wall,
                "from_scratch_sec": full_wall,
                "gazetteer_rows": inc_rows,
            }
            out["anchor"].append(rec)
            print("anchor", json.dumps(rec), flush=True)

            t0 = time.time()
            kinc = ingest_keywords_dump(spark, docs(lo, hi), kroot, f"d{n}", k=3)
            kinc_rows = kinc.count()
            kinc_wall = round(time.time() - t0, 2)
            t0 = time.time()
            kfull_rows = (
                extract_keywords(docs(0, hi), k=3)
                .where(F.col("doc_id") >= lo)
                .count()
            )
            kfull_wall = round(time.time() - t0, 2)
            assert kinc_rows == kfull_rows, (n, kinc_rows, kfull_rows)
            rec = {
                "dump": n,
                "incremental_sec": kinc_wall,
                "from_scratch_sec": kfull_wall,
                "keyword_rows": kinc_rows,
            }
            out["keywords_df"].append(rec)
            print("keywords", json.dumps(rec), flush=True)
    finally:
        shutil.rmtree(aroot, ignore_errors=True)
        shutil.rmtree(kroot, ignore_errors=True)

    (REPO / "BENCH" / "anchor_df_incremental.json").write_text(
        json.dumps(out) + "\n"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
