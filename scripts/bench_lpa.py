"""Label-propagation communities at scale (round 6): the synchronous
min-tie-break LPA has only run at driver-oracle scale (~10^2 hosts);
this drives it over a clustered synthetic host graph and records wall
per configuration, round curvature, and community-size profile.

Graph model (deterministic, hash-derived — no RNG): hosts are grouped
into planted communities of ~community_size members; each host links to
~edges_per_host others, intra_pct% inside its own community (hash-drawn
member) and the rest uniformly across the whole graph — the mixed
local/global structure real host graphs show.

What the numbers must show for the 100-TB claim:
  * wall grows ~linearly in |edges| (each round is one join over the
    static pre-partitioned neighbor relation + one partial-agg vote
    count + one per-node window over tiny groups);
  * round count is a fixed multiplier (it=4 vs it=8 within ~2x);
  * planted communities are actually recovered (majority of each
    planted block shares one label) — the op does useful work, not
    just fast work.

Writes BENCH/lpa.json.
Usage: python scripts/bench_lpa.py [n_hosts] [edges_per_host]
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
    community_size = 50
    intra_pct = 80

    from pyspark.sql import functions as F

    from esmarc_spark.ops.linkgraph import label_propagation
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-lpa", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    out = {
        "calibration_sec": calibration,
        "community_size": community_size,
        "intra_pct": intra_pct,
        "configs": [],
    }

    for scale_div in (4, 1):  # quarter-scale point first for curvature
        nh = n_hosts // scale_div
        ne = nh * per_host
        path = f"/tmp/lpa_edges_{nh}_{per_host}"
        src_id = F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(nh))
        comm = (src_id - F.pmod(src_id, F.lit(community_size)))
        intra_dst = comm + F.pmod(
            F.xxhash64((F.col("id") * 2 + 1).cast("string")), F.lit(community_size)
        )
        global_dst = F.pmod(
            F.xxhash64((F.col("id") * 3 + 2).cast("string")), F.lit(nh)
        )
        pick_intra = (
            F.pmod(F.xxhash64((F.col("id") * 5 + 3).cast("string")), F.lit(100))
            < intra_pct
        )
        edges = spark.range(ne).select(
            F.concat(F.lit("h"), src_id.cast("string")).alias("src"),
            F.concat(
                F.lit("h"),
                F.when(pick_intra, intra_dst).otherwise(global_dst).cast("string"),
            ).alias("dst"),
        )
        edges.write.mode("overwrite").parquet(path)
        rel = spark.read.parquet(path)
        n_edges_distinct = rel.where(F.col("src") != F.col("dst")).distinct().count()

        cfg = {"n_hosts": nh, "n_edge_rows": ne, "n_edges_distinct": n_edges_distinct}
        for iters in (4, 8):
            t0 = time.time()
            labels = label_propagation(rel, iterations=iters)
            n_comms = labels.select("community").distinct().count()
            wall = round(time.time() - t0, 2)
            cfg[f"wall_it{iters}"] = wall
            cfg[f"n_communities_it{iters}"] = n_comms
        # recovery: majority label share inside each planted block
        lab = label_propagation(rel, iterations=4)
        block = (F.col("hid") - F.pmod(F.col("hid"), F.lit(community_size)))
        rec = (
            lab.select(
                F.substring("host", 2, 20).cast("long").alias("hid"), "community"
            )
            .select(block.alias("block"), "community")
            .groupBy("block", "community")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("block")
            .agg(
                F.max("c").alias("top"),
                F.sum("c").alias("n"),
            )
            .agg(
                F.avg(F.col("top") / F.col("n")).alias("mean_majority_share"),
                F.count(F.lit(1)).alias("n_blocks"),
            )
            .collect()[0]
        )
        cfg["mean_majority_share"] = round(rec["mean_majority_share"], 3)
        cfg["n_blocks"] = rec["n_blocks"]
        out["configs"].append(cfg)
        print(json.dumps(cfg), flush=True)

    a, b = out["configs"]
    out["edge_ratio"] = round(b["n_edges_distinct"] / a["n_edges_distinct"], 2)
    out["wall_ratio_it4"] = round(b["wall_it4"] / a["wall_it4"], 2)
    out["iter_curvature_large"] = round(b["wall_it8"] / b["wall_it4"], 2)
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "lpa.json").write_text(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
