"""Incremental vs from-scratch link-graph cost (round 7 — VERDICT
r6 #2): as the crawl accumulates dumps, the incremental per-dump step
(extract NEW HTML only + cold re-rank over the merged host edges) must
grow far slower than from-scratch ``host_pagerank`` over the cumulative
pages — because HTML link extraction scans the data-sized side while
the merged host-edge relation is orders of magnitude smaller.

Corpus: ``n_dumps`` dumps of ``n_pages`` synthetic pages each over a
fixed ``n_hosts`` host universe with a Zipf-ish hub (every page links
the hub plus two arithmetic neighbours). Pages parquet-materialized
first; each incremental step timed end-to-end INCLUDING its state
publish; from-scratch timed at each cumulative point. Final equality
asserted: state ranks == from-scratch ranks (the byte-identity
contract).

Writes BENCH/pagerank_incremental.json.
Usage: python scripts/bench_pagerank_incremental.py [n_pages] [n_dumps] [n_hosts]
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
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_dumps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n_hosts = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    from pyspark.sql import functions as F

    from esmarc_spark.ops.linkgraph import host_pagerank
    from esmarc_spark.ops.linkgraph_incremental import (
        LinkGraphState,
        ingest_pages_dump,
    )
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-pagerank-incremental", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    tmp = Path("/tmp/bench_pagerank_incremental")
    shutil.rmtree(tmp, ignore_errors=True)
    state_root = str(tmp / "state")

    def pages(lo: int, hi: int):
        d = F.col("id")
        url = F.concat(
            F.lit("https://h"), F.pmod(d, F.lit(n_hosts)).cast("string"),
            F.lit(".example/p/"), d.cast("string"),
        )
        html = F.concat(
            F.lit('<a href="https://h0.example/">hub</a>'
                  '<a href="https://h'),
            F.pmod(d * 7 + 3, F.lit(n_hosts)).cast("string"),
            F.lit('.example/x">a</a><a href="https://h'),
            F.pmod(d * 11 + 5, F.lit(n_hosts)).cast("string"),
            F.lit('.example/y">b</a>'),
        )
        return spark.range(lo, hi, 1, 32).select(
            url.alias("url"), html.alias("html")
        )

    for k in range(n_dumps):
        pages(k * n_pages, (k + 1) * n_pages).write.mode("overwrite").parquet(
            str(tmp / f"dump={k}")
        )

    def read_dumps(upto: int):
        return spark.read.parquet(*[str(tmp / f"dump={k}") for k in range(upto)])

    # warm-up (JIT + codegen)
    host_pagerank(read_dumps(1), iterations=5).foreach(lambda r: None)

    rows = []
    for k in range(n_dumps):
        t0 = time.time()
        inc_ranks = ingest_pages_dump(
            spark, spark.read.parquet(str(tmp / f"dump={k}")), state_root,
            f"d{k}", iterations=5,
        )
        inc_ranks.write.format("noop").mode("overwrite").save()
        inc_sec = time.time() - t0

        t0 = time.time()
        host_pagerank(read_dumps(k + 1), iterations=5).write.format(
            "noop"
        ).mode("overwrite").save()
        scratch_sec = time.time() - t0
        rows.append(
            {"dump": k, "incremental_sec": round(inc_sec, 2),
             "from_scratch_sec": round(scratch_sec, 2)}
        )
        print(rows[-1], flush=True)

    # byte-identity contract at the end of the run
    final_state = {
        (r["host"], r["rank_scaled"])
        for r in LinkGraphState(state_root).ranks(spark).collect()
    }
    final_scratch = {
        (r["host"], r["rank_scaled"])
        for r in host_pagerank(read_dumps(n_dumps), iterations=5).collect()
    }
    assert final_state == final_scratch, "state ranks diverged from from-scratch"

    out = {
        "what": "incremental link-graph state vs from-scratch host_pagerank",
        "n_pages_per_dump": n_pages,
        "n_dumps": n_dumps,
        "n_hosts": n_hosts,
        "iterations": 5,
        "per_dump": rows,
        "final_equal": True,
        "note": ("incremental pays HTML extraction for the new dump only; "
                 "both sides rank the merged host relation (cold fixed "
                 "budget — warm start measured non-viable, see "
                 "ops/linkgraph_incremental.py docstring)"),
    }
    Path(REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "pagerank_incremental.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
