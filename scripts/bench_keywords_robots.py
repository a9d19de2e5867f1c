"""Round-7 scale evidence for tf-idf keyword extraction and the
robots.txt gate.

Keywords corpus model (deterministic): every doc carries 10 corpus-hot
function words (df = n_docs — the Zipf head that punishes a df design
without map-side combine), 20 template words (500 templates, mid tier),
and 10 per-doc-unique hash words (long tail). What the numbers must
show: wall ~linear in docs (the ratio is the point in this VM's
fixed-overhead regime) — the hot df keys arrive pre-combined, and the
single-scan tf->df reuse means text is tokenized once.

Robots corpus model: 100k hosts x 6 *-agent rules each (one wildcard,
one $-anchored — every page pays the regex path), pages joined to
their host's rules with per-page fan-out = 6. Must show ~linear wall
in pages: the join is equi on host and the winner pick is a partial
agg, so no rule table growth, no window over pages.

Writes BENCH/keywords.json and BENCH/robots.json.
Usage: python scripts/bench_keywords_robots.py [n_docs] [n_pages]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    from pyspark.sql import functions as F

    from esmarc_spark.ops.keywords import extract_keywords
    from esmarc_spark.ops.robots import parse_robots, robots_gate
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-kw-robots", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    # ---- keywords ------------------------------------------------------
    kw = {"calibration_sec": calibration, "configs": []}
    for nd in (n_docs // 10, n_docs):
        path = f"/tmp/kw_corpus_{nd}"
        d = F.col("id")
        hot = F.lit("the of and to in for with on as by")
        template = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"tpl{j}w"),
                    F.pmod(d, F.lit(500)).cast("string"),
                )
                for j in range(20)
            ],
        )
        rare = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("u"),
                    F.xxhash64((d * 10 + j).cast("string")).cast("string"),
                )
                for j in range(10)
            ],
        )
        spark.range(nd).select(
            d.alias("doc_id"),
            F.concat_ws(" ", hot, template, rare).alias("text"),
        ).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)

        extract_keywords(docs, k=5).write.format("noop").mode(
            "overwrite"
        ).save()  # warm-up
        t0 = time.time()
        extract_keywords(docs, k=5).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        cfg = {
            "n_docs": nd,
            "wall_sec": wall,
            "docs_per_sec": round(nd / wall, 1),
        }
        kw["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)
    a, b = kw["configs"]
    kw["docs_ratio"] = round(b["n_docs"] / a["n_docs"], 2)
    kw["wall_ratio"] = round(b["wall_sec"] / a["wall_sec"], 2)
    (REPO / "BENCH" / "keywords.json").write_text(json.dumps(kw) + "\n")
    print(json.dumps(kw))

    # ---- robots --------------------------------------------------------
    rb = {"calibration_sec": calibration, "configs": []}
    robots_txt = (
        "User-agent: specialbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
        "Disallow: /tmp/*.html$\nDisallow: /cgi-bin\nAllow: /cgi-bin/pub\n"
        "Disallow: /session*id\n"
    )
    hosts = spark.range(100_000).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example")).alias(
            "host"
        ),
        F.lit(robots_txt).alias("robots_txt"),
    )
    rules = parse_robots(hosts).localCheckpoint(eager=True)
    n_rules = rules.count()
    rb["n_hosts"] = 100_000
    rb["n_rules"] = n_rules
    for np_ in (n_pages // 10, n_pages):
        path = f"/tmp/robots_pages_{np_}"
        d = F.col("id")
        seg = (
            F.when(d % 5 == 0, F.concat(F.lit("/private/p"), d.cast("string")))
            .when(d % 5 == 1, F.concat(F.lit("/private/ok/p"), d.cast("string")))
            .when(d % 5 == 2, F.concat(F.lit("/pub/p"), d.cast("string")))
            .when(d % 5 == 3, F.concat(F.lit("/tmp/p"), d.cast("string"), F.lit(".html")))
            .otherwise(F.concat(F.lit("/cgi-bin/x"), d.cast("string")))
        )
        spark.range(np_).select(
            d.alias("doc_id"),
            F.concat(
                F.lit("https://h"),
                F.pmod(d, F.lit(100_000)).cast("string"),
                F.lit(".example"),
                seg,
            ).alias("url"),
        ).write.mode("overwrite").parquet(path)
        pages = spark.read.parquet(path)

        def gated():
            return pages.join(
                __import__(
                    "esmarc_spark.ops.robots", fromlist=["robots_verdicts"]
                )
                .robots_verdicts(pages, rules)
                .where(~F.col("allowed"))
                .select(F.col("key").alias("doc_id")),
                "doc_id",
                "anti",
            )

        gated().write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.time()
        gated().write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        kept = gated().count()
        cfg = {
            "n_pages": np_,
            "wall_sec": wall,
            "pages_per_sec": round(np_ / wall, 1),
            "kept": kept,
            "dropped_frac": round(1 - kept / np_, 4),
        }
        rb["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)
    a, b = rb["configs"]
    rb["pages_ratio"] = round(b["n_pages"] / a["n_pages"], 2)
    rb["wall_ratio"] = round(b["wall_sec"] / a["wall_sec"], 2)
    (REPO / "BENCH" / "robots.json").write_text(json.dumps(rb) + "\n")
    print(json.dumps(rb))
    spark.stop()


if __name__ == "__main__":
    main()
