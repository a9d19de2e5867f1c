"""Scaling-efficiency evidence (north_rule: throughput scaling efficiency
>= 0.8 from N to 4N executors; sandbox stand-in per the task brief: the
same job on the same input at two parallelism levels, fresh JVM each, one
warm-up run before timing).

Levels: N=2 vs 4N=8 cores. Rationale (measured, see BENCH/BASELINE.md): on
this sandbox VM the *hardware itself* stops scaling past ~8-16 active
threads — a pure-JVM xxhash64 aggregation (no shuffle, no Python, no I/O)
gains only ~2x from 8->32 threads, and raw CPython multiprocessing shows
the same ceiling — so 8->32 measures the hypervisor's compute delivery,
not the job. The 2->8 pair sits inside the linear region; the harness
also records the pure-compute ceiling at the same levels so the job's
efficiency can be read relative to what the machine actually delivers.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/bench_scaling.py [n_docs] [N] [4N]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_PIPELINE_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from esmarc_spark.session import get_spark
from esmarc_spark.pipeline.run import run_pipeline
from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2]); corpus = sys.argv[3]
spark = get_spark(f"scaling-{{cpus}}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
if not os.path.exists(corpus):
    # materialize the corpus once — the timed job reads real parquet, like
    # production reads Iceberg; generation cost stays out of the measurement
    synth_webtext(spark, n_docs=n_docs, partitions=64).write.mode(
        "overwrite").parquet(corpus)
webtext = spark.read.parquet(corpus)
gaz = gazetteer_df(spark)
n_triples = run_pipeline(webtext, gaz).count()          # warm-up + size
secs = []
for _ in range(3):                                       # min-of-3: the VM is noisy
    t0 = time.time()
    run_pipeline(webtext, gaz).write.format("noop").mode("overwrite").save()
    secs.append(time.time() - t0)
sec = min(secs)
print(json.dumps({{"cpus": cpus, "n_docs": n_docs, "triples": n_triples,
                   "sec": round(sec, 3), "runs": [round(s, 3) for s in secs],
                   "triples_per_sec": round(n_triples / sec, 1)}}))
spark.stop()
"""

_CEILING_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from esmarc_spark.session import get_spark
import pyspark.sql.functions as F
cpus = int(sys.argv[1])
spark = get_spark(f"ceil-{{cpus}}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")
def make():
    # fresh lineage per run — re-collecting one Dataset object skips
    # completed shuffle stages and times nothing
    df = spark.range(0, 1_000_000_000, 1, cpus * 2)
    return df.agg(F.sum(F.xxhash64("id").cast("decimal(38,0)")))
make().collect()
secs = []
for _ in range(3):
    t0 = time.time()
    make().collect()
    secs.append(time.time() - t0)
print(json.dumps({{"cpus": cpus, "sec": round(min(secs), 3),
                   "runs": [round(s, 3) for s in secs]}}))
spark.stop()
"""


def _run(worker: str, args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", worker.format(repo=str(REPO)), *args],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker {args} failed:\n{out.stderr[-3000:]}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    factor = n_high / n_low

    corpus = f"/tmp/esmarc_scaling_corpus_{n_docs}"
    low = _run(_PIPELINE_WORKER, [str(n_low), str(n_docs), corpus])
    high = _run(_PIPELINE_WORKER, [str(n_high), str(n_docs), corpus])
    ceil_low = _run(_CEILING_WORKER, [str(n_low)])
    ceil_high = _run(_CEILING_WORKER, [str(n_high)])

    speedup = high["triples_per_sec"] / low["triples_per_sec"]
    efficiency = speedup / factor
    hw_speedup = ceil_low["sec"] / ceil_high["sec"]
    hw_efficiency = hw_speedup / factor
    rel = speedup / hw_speedup if hw_speedup else None
    result = {
        "n_docs": n_docs,
        "levels": [n_low, n_high],
        "low": low,
        "high": high,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "hw_ceiling_speedup": round(hw_speedup, 3),
        "hw_ceiling_efficiency": round(hw_efficiency, 3),
        "efficiency_vs_hw_ceiling": round(rel, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(result))

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    # raw last-run record; the curated analysis lives in BENCH/BASELINE.md
    (bench_dir / "SCALING_LAST_RUN.md").write_text(
        f"""# BENCH/SCALING_LAST_RUN — latest raw scaling measurement

north_rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox stand-in (task brief): the same job on the same input
at two parallelism levels (N={n_low} -> 4N={n_high} cores), fresh JVM per
level, one warm-up run before timing.

Job: full webtext KG pipeline (S1 byte-identical extract -> max_by url
dedup -> S2 n-gram gazetteer mentions (JVM-only) -> S3 broadcast link ->
S5 triple materialization) over a deterministic synthetic corpus of
{n_docs:,} docs (esmarc_spark.pipeline.webtext.synth_webtext, seed 42,
input_hint schema url/warc_ts/html/text/lang).

| level | cores | wall sec | triples | triples/sec |
|---|---|---|---|---|
| N    | {n_low}  | {low['sec']} | {low['triples']:,} | {low['triples_per_sec']:,} |
| 4N   | {n_high} | {high['sec']} | {high['triples']:,} | {high['triples_per_sec']:,} |

**Pipeline speedup N->4N: {speedup:.2f}x — scaling efficiency:
{efficiency:.3f}** (target >= 0.8: {"PASS" if efficiency >= 0.8 else "FAIL"})

## Hardware-ceiling reference (same levels, same JVM settings)

Pure-compute control: `spark.range(1e9).agg(sum(xxhash64(id)))` — no
shuffle, no Python, no disk; it measures how much compute the VM actually
delivers per added core.

| level | cores | wall sec |
|---|---|---|
| N  | {n_low}  | {ceil_low['sec']} |
| 4N | {n_high} | {ceil_high['sec']} |

Hardware speedup {hw_speedup:.2f}x (efficiency {hw_efficiency:.3f});
pipeline efficiency relative to delivered compute:
**{rel:.2f}** (1.0 = the job scales exactly as well as raw CPU work).

Why not local[8] vs local[32]: measured on this VM, even the pure-JVM
control only speeds up ~2x from 8->32 threads (and raw CPython
multiprocessing shows the same ~2.4x ceiling), i.e. the hypervisor does
not deliver 4x compute over that range. 8->32 there measures the box, not
the job. On a real N->4N *executor* scale-out (which also multiplies
memory bandwidth and I/O), the shuffle-light plan here — map-only S1/S2,
broadcast-only S3 joins, partial-agg dedup/S5, no global distinct — is the
property the criterion is after, and it is what the {n_low}->{n_high}
measurement demonstrates inside the VM's linear region.

Reproduce: `python scripts/bench_scaling.py {n_docs} {n_low} {n_high}`
"""
    )


if __name__ == "__main__":
    main()
