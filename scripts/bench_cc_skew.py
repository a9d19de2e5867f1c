"""Connected components on a Zipfian giant component (VERDICT r2 #7): one
hub node carries ~50% of all edges (a star), the rest is a uniform chain
tail. Runs the shipped CC with AQE skew-join splitting ON vs OFF, with
autoBroadcastJoinThreshold=-1 so the per-round min-join is a sort-merge
join as it would be at cluster scale (the mins relation has one row per
node — not broadcastable at 10^9 nodes).

Usage: python scripts/bench_cc_skew.py [n_edges] [cpus]
Writes BENCH/cc_skew.json.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from esmarc_spark.session import get_spark
from esmarc_spark.pipeline import canonicalize as C

variant = sys.argv[1]; n_edges = int(sys.argv[2]); cpus = int(sys.argv[3])
spark = get_spark(f"ccskew-{{variant}}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
# emulate at-scale join physics: the per-node mins relation is not
# broadcastable at 10^9 nodes, so force the SMJ path here too
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
# skew thresholds scaled down so the hub partition is "skewed" relative
# to them at bench scale
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
if variant == "aqe_off":
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

half = n_edges // 2
hub = spark.range(0, half, 1, cpus * 2).select(
    F.lit("https://hub.example/0").alias("src"),
    F.concat(F.lit("https://star.example/"), F.col("id").cast("string")).alias("dst"),
)
tail = spark.range(0, half, 1, cpus * 2).select(
    F.concat(F.lit("https://t/"), (F.col("id") % 200000).cast("string")).alias("src"),
    F.concat(F.lit("https://t/"),
             ((F.col("id") * 48271 + 11) % 200000).cast("string")).alias("dst"),
)
graph = {{"aqe_on": hub.union(tail), "aqe_off": hub.union(tail),
          "hub_only": hub, "tail_only": tail}}[variant]
path = f"/tmp/cc_skew_edges_{{variant}}_{{n_edges}}"
graph.write.mode("overwrite").parquet(path)
edges = spark.read.parquet(path)

t0 = time.time()
comp = C.connected_components(edges)
n_nodes = comp.count()
giant = comp.where(F.col("component") == "https://hub.example/0").count()
sec = time.time() - t0
print(json.dumps({{"variant": variant, "n_edges": n_edges, "cpus": cpus,
                   "nodes": n_nodes, "giant_members": giant,
                   "sec": round(sec, 2)}}))
spark.stop()
"""


def _run(variant: str, n_edges: int, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=str(REPO)), variant,
         str(n_edges), str(cpus)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stderr[-3000:])


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    on = _run("aqe_on", n_edges, cpus)
    off = _run("aqe_off", n_edges, cpus)
    hub_only = _run("hub_only", n_edges, cpus)
    tail_only = _run("tail_only", n_edges, cpus)
    assert on["nodes"] == off["nodes"] and on["giant_members"] == off["giant_members"]
    result = {
        "n_edges": n_edges, "cpus": cpus, "nodes": on["nodes"],
        "giant_members": on["giant_members"],
        "aqe_skew_on_sec": on["sec"], "aqe_skew_off_sec": off["sec"],
        "aqe_win": round(off["sec"] / on["sec"], 3),
        # the decomposition that explains the aqe_win ~1.0: the hub star
        # collapses in ~2 rounds and is FASTER than the uniform tail at
        # equal edge count — the fat join key never dominates a round, so
        # skew splitting has nothing to win and explicit hub salting is
        # not warranted
        "hub_only_sec": hub_only["sec"], "tail_only_sec": tail_only["sec"],
    }
    print(json.dumps(result))
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "cc_skew.json").write_text(json.dumps(result, indent=2) + "\n")


if __name__ == "__main__":
    main()
