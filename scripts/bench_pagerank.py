"""Host-graph PageRank at scale (round 6): the scaled-integer PageRank
has only run at driver-oracle scale (~10^2 hosts); this drives it over a
Zipf-skewed synthetic host graph and records per-configuration wall,
iteration curvature, and the hub profile.

Graph model (deterministic, hash-derived — no RNG):
  * n_hosts hosts, ~edges_per_host outgoing links each;
  * destination hosts are Zipf-biased by SQUARING a uniform hash draw
    (dst ~ floor(u^2 * n) concentrates mass on low ids) — host 0 ends
    up with an in-degree thousands of times the median, the shape of
    real web host graphs;
  * ~2% of hosts are dangling (appear only as destinations), keeping
    the dangling-mass branch hot.

What the numbers must show for the 100-TB claim:
  * wall grows ~linearly in |edges| (each iteration is one join + one
    partial agg over the edge relation);
  * iteration count is a fixed multiplier (no curvature between it=5
    and it=10 beyond 2x);
  * the Zipf hub does NOT need salting: the inflow groupBy partial-
    aggregates map-side, so the hub key arrives pre-combined.

Writes BENCH/pagerank.json.
Usage: python scripts/bench_pagerank.py [n_hosts] [edges_per_host]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    per_host = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from esmarc_spark.ops.linkgraph import pagerank
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-pagerank", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    out = {"calibration_sec": calibration, "configs": []}

    for scale_div in (4, 1):  # quarter-scale point first for curvature
        nh = n_hosts // scale_div
        ne = nh * per_host
        path = f"/tmp/pagerank_edges_{nh}_{per_host}"
        # dst: square a uniform [0,1) hash draw -> Zipf-ish low-id hubs;
        # src: uniform over the first 98% of hosts (the tail 2% never
        # emits an edge -> genuinely dangling hosts)
        u = (F.pmod(F.xxhash64((F.col("id") * 2 + 1).cast("string")), F.lit(1 << 30))
             / F.lit(float(1 << 30)))
        edges = (
            spark.range(ne)
            .select(
                F.concat(
                    F.lit("h"),
                    F.pmod(
                        F.xxhash64(F.col("id").cast("string")),
                        F.lit(nh * 98 // 100),
                    ).cast("string"),
                ).alias("src"),
                F.concat(
                    F.lit("h"), F.floor(u * u * nh).cast("long").cast("string")
                ).alias("dst"),
            )
        )
        edges.write.mode("overwrite").parquet(path)
        rel = spark.read.parquet(path)
        n_edges_distinct = rel.where(F.col("src") != F.col("dst")).distinct().count()

        cfg = {"n_hosts": nh, "n_edge_rows": ne, "n_edges_distinct": n_edges_distinct}
        for iters in (5, 10):
            t0 = time.time()
            ranks = pagerank(rel, iterations=iters)
            top = ranks.orderBy(F.desc("rank_scaled"), "host").limit(5).collect()
            wall = round(time.time() - t0, 2)
            cfg[f"wall_it{iters}"] = wall
            cfg[f"top_hosts_it{iters}"] = [
                {"host": r["host"], "rank_scaled": r["rank_scaled"]} for r in top[:3]
            ]
        # hub profile: in-degree of the hottest host vs median
        indeg = (
            rel.where(F.col("src") != F.col("dst")).distinct()
            .groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
        )
        prof = indeg.agg(
            F.max("d").alias("max"),
            F.expr("percentile_approx(d, 0.5)").alias("p50"),
            F.expr("percentile_approx(d, 0.99)").alias("p99"),
        ).collect()[0]
        cfg["indegree"] = {"max": prof["max"], "p50": prof["p50"], "p99": prof["p99"]}
        out["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)

    a, b = out["configs"]
    out["edge_ratio"] = round(b["n_edges_distinct"] / a["n_edges_distinct"], 2)
    out["wall_ratio_it5"] = round(b["wall_it5"] / a["wall_it5"], 2)
    out["iter_curvature_large"] = round(b["wall_it10"] / b["wall_it5"], 2)
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "pagerank.json").write_text(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
