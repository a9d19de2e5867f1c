"""ExactSubstr span dedup at corpus scale (round 6): drive
remove_duplicate_spans over a synthetic crawl corpus with realistic
duplicated-span structure and record wall + removal profile at two
sizes.

Corpus model (deterministic, hash-derived), ~55 tokens/doc:
  * 10-token unique prefix (hash-derived — survivor control);
  * one 20-token template paragraph drawn from 500 templates — each
    template occurs n_docs/500 times, the mid-tier duplication span
    dedup exists for;
  * a GLOBAL 15-token disclaimer in EVERY doc — the degenerate key:
    its shingle hashes reach the count shuffle with n_docs occurrences
    and must arrive pre-combined (map-side partial agg) or the reducer
    stalls;
  * 10-token unique tail.

Expected removal: the template paragraph and the disclaimer vanish
from every doc (all their 13-windows are corpus-duplicated), the
unique prefix/tail survive. What the numbers must show for the 100-TB
claim: wall ~linear in docs and no skew stall from the global span.

Writes BENCH/span_dedup.json.
Usage: python scripts/bench_span_dedup.py [n_docs]
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

    from esmarc_spark.ops.span_dedup import remove_duplicate_spans
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-span-dedup", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    out = {"calibration_sec": calibration, "configs": []}
    for nd in (n_docs // 10, n_docs):
        path = f"/tmp/span_dedup_corpus_{nd}"
        d = F.col("id")

        def uniq(tag: str, m: int):
            return F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit(f"{tag}{j}x"),
                        F.xxhash64((d * 37 + j).cast("string")).cast("string"),
                    )
                    for j in range(m)
                ],
            )

        template = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"tpl{j}v"),
                    F.pmod(d, F.lit(500)).cast("string"),
                )
                for j in range(20)
            ],
        )
        disclaimer = F.lit(
            " ".join(f"global disclaimer token {j}".replace(" ", "_") for j in range(15))
        )
        text = F.concat_ws(
            " ", uniq("p", 10), template, disclaimer, uniq("t", 10)
        )
        spark.range(nd).select(d.alias("doc_id"), text.alias("text")).write.mode(
            "overwrite"
        ).parquet(path)
        docs = spark.read.parquet(path)

        def job():
            return remove_duplicate_spans(docs, k=13)

        job().write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.time()
        job().write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        stats = (
            job()
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("n_removed_tokens").alias("removed"),
                F.min("n_removed_tokens").alias("min_removed"),
                F.max("n_removed_tokens").alias("max_removed"),
            )
            .collect()[0]
        )
        cfg = {
            "n_docs": nd,
            "wall_sec": wall,
            "docs_per_sec": round(nd / wall, 1),
            "tokens_removed": stats["removed"],
            "min_removed": stats["min_removed"],
            "max_removed": stats["max_removed"],
        }
        out["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)

    a, b = out["configs"]
    out["docs_ratio"] = round(b["n_docs"] / a["n_docs"], 2)
    out["wall_ratio"] = round(b["wall_sec"] / a["wall_sec"], 2)
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "span_dedup.json").write_text(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
