"""Throughput of the round-5 curation operators at bench-corpus scale
(60k synthetic webtext docs, 32 cores, min-of-3 after warm-up, noop
sink, fresh lineage per run):

* map-only family (repetition stats, PII scrub, stratified sample,
  host blocklist) — these must run at scan speed;
* shuffle family (corpus near-dup dedup incl. connected components,
  benchmark decontamination) — bounded by the LSH banding joins.

Writes BENCH/curation.json.
Usage: python scripts/bench_curation.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000

    from pyspark.sql import functions as F

    from esmarc_spark.ops.decontaminate import decontaminate
    from esmarc_spark.ops.dedup import dedup_corpus
    from esmarc_spark.ops.pii import scrub_docs
    from esmarc_spark.ops.sampling import sample_stratified
    from esmarc_spark.ops.text import repetition_stats
    from esmarc_spark.ops.urlnorm import filter_by_host_blocklist
    from esmarc_spark.pipeline.webtext import synth_webtext
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-curation", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = (
        synth_webtext(spark, n_docs=n_docs, partitions=32, dup_fraction=0.1)
        .withColumn("doc_id", F.xxhash64("url"))
        .withColumn(
            "source", F.concat(F.lit("s"), F.pmod("doc_id", F.lit(20)).cast("string"))
        )
        .cache()
    )
    corpus.count()
    bench_docs = corpus.where(F.pmod("doc_id", F.lit(1000)) == 1).select(
        "doc_id", "text"
    )
    blocklist = spark.createDataFrame(
        [(f"blocked{i}.example",) for i in range(100)], "host string"
    )

    jobs = {
        "repetition_stats": lambda: repetition_stats(corpus),
        "pii_scrub": lambda: scrub_docs(corpus),
        "sample_stratified": lambda: sample_stratified(
            corpus, "doc_id", "source", {"s0": 0.5, "s1": 0.2}, 0.1
        ),
        "host_blocklist": lambda: filter_by_host_blocklist(corpus, blocklist),
        "dedup_corpus": lambda: dedup_corpus(
            corpus.select("doc_id", "text"), threshold=0.5
        ),
        "decontaminate": lambda: decontaminate(
            corpus.select("doc_id", "text"), bench_docs, threshold=0.5
        ),
    }

    out = {"n_docs": n_docs, "queries": {}}
    for name, mk in jobs.items():
        mk().write.format("noop").mode("overwrite").save()  # warm-up
        secs = []
        for _ in range(3):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            secs.append(time.time() - t0)
        out["queries"][name] = {
            "sec": round(min(secs), 3),
            "docs_per_sec": round(n_docs / min(secs)),
        }
    print(json.dumps(out))
    (REPO / "BENCH" / "curation.json").write_text(json.dumps(out, indent=2) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
