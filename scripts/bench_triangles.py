"""Triangle counting vs the Zipf hub (round 6): measures WHY the
degree-ordered orientation is the 100-TB-safe formulation.

Graph model (deterministic, hash-derived): a hub-and-community web —
n_hosts hosts in planted 40-member communities with dense local links
(those close triangles), plus every ~3rd host linking to one of a few
mega-hubs (hubs close almost nothing but dominate degree).

Measured comparison on the same input:
  * wedge volume BEFORE closure for the naive shared-endpoint self-join
    (counted analytically: sum over nodes of C(deg,2)) vs the oriented
    join (sum of C(outdeg,2)) — the factor the orientation saves;
  * wall time of count_triangles at two scales (curvature).

The naive wedge count is computed, not executed — at the large config
it is tens of billions of rows, which is the point.

Writes BENCH/triangles.json.
Usage: python scripts/bench_triangles.py [n_hosts]
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
    community_size = 40
    n_hubs = 5

    from pyspark.sql import functions as F

    from esmarc_spark.ops.linkgraph import count_triangles
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-triangles", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    out = {"calibration_sec": calibration, "configs": []}

    for scale_div in (4, 1):
        nh = n_hosts // scale_div
        path = f"/tmp/tri_edges_{nh}"
        # 6 community edges per host (hash-drawn in-block partners)
        base = spark.range(nh * 6)
        sid = F.pmod(F.col("id"), F.lit(nh))
        block = sid - F.pmod(sid, F.lit(community_size))
        partner = block + F.pmod(
            F.xxhash64((F.col("id") * 7 + 1).cast("string")), F.lit(community_size)
        )
        community_edges = base.select(
            F.concat(F.lit("h"), sid.cast("string")).alias("src"),
            F.concat(F.lit("h"), partner.cast("string")).alias("dst"),
        )
        # every 3rd host also links a mega-hub
        hub_edges = (
            spark.range(nh)
            .where(F.pmod(F.col("id"), F.lit(3)) == 0)
            .select(
                F.concat(F.lit("h"), F.col("id").cast("string")).alias("src"),
                F.concat(
                    F.lit("hub"),
                    F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(n_hubs))
                    .cast("string"),
                ).alias("dst"),
            )
        )
        community_edges.unionAll(hub_edges).write.mode("overwrite").parquet(path)
        rel = spark.read.parquet(path)

        # analytic wedge volumes over the undirected distinct graph
        und = (
            rel.where(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .distinct()
        )
        deg = (
            und.select(F.col("a").alias("h"))
            .unionAll(und.select(F.col("b").alias("h")))
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        stats = deg.agg(
            F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("naive_wedges"),
            F.max("d").alias("max_deg"),
            F.expr("percentile_approx(d, 0.5)").alias("p50_deg"),
            F.count(F.lit(1)).alias("n_nodes"),
        ).collect()[0]

        cfg = {
            "n_hosts": nh,
            "n_edges": und.count(),
            "naive_wedges": stats["naive_wedges"],
            "max_deg": stats["max_deg"],
            "p50_deg": stats["p50_deg"],
        }

        t0 = time.time()
        res = count_triangles(rel)
        total = res.agg(
            F.sum("n_triangles").cast("long").alias("t"),
            F.count(F.lit(1)).alias("hosts_in_triangles"),
        ).collect()[0]
        cfg["wall_oriented"] = round(time.time() - t0, 2)
        cfg["triangle_corners"] = total["t"]
        cfg["hosts_in_triangles"] = total["hosts_in_triangles"]
        # hubs must not appear among triangle hosts with outsized counts
        hubmax = (
            res.where(F.col("host").startswith("hub"))
            .agg(F.coalesce(F.max("n_triangles"), F.lit(0)).alias("m"))
            .collect()[0]["m"]
        )
        cfg["max_hub_triangles"] = hubmax
        out["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)

    a, b = out["configs"]
    out["edge_ratio"] = round(b["n_edges"] / a["n_edges"], 2)
    out["wall_ratio"] = round(b["wall_oriented"] / a["wall_oriented"], 2)
    out["naive_wedge_blowup_large"] = round(
        b["naive_wedges"] / max(b["n_edges"], 1), 1
    )
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "triangles.json").write_text(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
