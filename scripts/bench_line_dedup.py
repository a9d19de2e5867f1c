"""Cross-document line dedup at corpus scale (round 6): drive
remove_duplicate_lines over a synthetic crawl corpus with realistic
boilerplate structure and record wall + removal profile at two sizes.

Corpus model (deterministic, hash-derived):
  * every doc: 1 global nav line (shared by ALL docs — the worst-case
    hot key), 1 per-template footer (500 templates), 8 unique body
    lines, and 1 per-doc-unique banner line (survivor control);
  * so the frequency relation has one degenerate key (the nav line,
    n_docs occurrences), a mid tier, and a long unique tail — the
    shape that punishes a design whose count shuffle carries strings
    or lacks map-side combine.

What the numbers must show for the 100-TB claim: wall ~linear in docs
(10x docs within ~2-3x wall in this VM's fixed-overhead regime is fine
at the small end; the ratio is the point), and the hot nav-line key
adds no skew stall (its count arrives pre-combined per partition).

Writes BENCH/line_dedup.json.
Usage: python scripts/bench_line_dedup.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000

    from pyspark.sql import functions as F

    from esmarc_spark.ops.line_dedup import remove_duplicate_lines
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-line-dedup", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    out = {"calibration_sec": calibration, "configs": []}
    for nd in (n_docs // 10, n_docs):
        path = f"/tmp/line_dedup_corpus_{nd}"
        d = F.col("id")
        body = F.concat_ws(
            "\n",
            *[
                F.concat(
                    F.lit(f"body line {j} of doc "),
                    F.xxhash64((d * 10 + j).cast("string")).cast("string"),
                )
                for j in range(8)
            ],
        )
        text = F.concat_ws(
            "\n",
            F.lit("GLOBAL NAV home about contact privacy"),
            body,
            F.concat(F.lit("template footer "), F.pmod(d, F.lit(500)).cast("string")),
            F.concat(F.lit("semi-shared banner "), F.pmod(d, F.lit(nd)).cast("string")),
        )
        spark.range(nd).select(d.alias("doc_id"), text.alias("text")).write.mode(
            "overwrite"
        ).parquet(path)
        docs = spark.read.parquet(path)

        remove_duplicate_lines(docs, min_docs=2).write.format("noop").mode(
            "overwrite"
        ).save()  # warm-up
        t0 = time.time()
        remove_duplicate_lines(docs, min_docs=2).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.time() - t0, 2)
        stats = (
            remove_duplicate_lines(docs, min_docs=2)
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("kept_lines").alias("kept"),
                F.min("kept_lines").alias("min_kept"),
            )
            .collect()[0]
        )
        cfg = {
            "n_docs": nd,
            "wall_sec": wall,
            "docs_per_sec": round(nd / wall, 1),
            "kept_lines_total": stats["kept"],
            "min_kept": stats["min_kept"],
        }
        out["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)

    a, b = out["configs"]
    out["docs_ratio"] = round(b["n_docs"] / a["n_docs"], 2)
    out["wall_ratio"] = round(b["wall_sec"] / a["wall_sec"], 2)
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "line_dedup.json").write_text(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
