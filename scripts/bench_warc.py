"""WARC ingest throughput + scaling (round 4): the byte-exact reader
frames records in Python (Arrow-batched per gzip member), so its cost
must be measured, not assumed — the round-3 JVM text parse it replaced
was lossy on real crawl bytes.

Layout mirrors Common Crawl: many .warc.gz members, one input partition
each (a gzip member is not splittable; parallelism = file count). The
job reads every member, frames every record, and materializes
(url, length(html)) through a noop sink.

Two parallelism levels (north_rule scaling stand-in, N=2 vs 4N=8 — the
linear region of this VM, see scripts/bench_scaling.py rationale),
fresh JVM each, min-of-3 after one warm-up.

Usage: python scripts/bench_warc.py [n_files] [recs_per_file] [N] [4N]
Writes BENCH/warc_ingest.json.
"""

from __future__ import annotations

import gzip
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from esmarc_spark.session import get_spark
from esmarc_spark.pipeline.warc import read_warc

cpus = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark(f"warcbench-{{cpus}}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")

def job():
    return read_warc(spark, path + "/*.warc.gz").select(
        "url", F.length("html").alias("n")
    )

n_records = job().count()                                # warm-up + size
secs = []
for _ in range(3):
    t0 = time.time()
    job().write.format("noop").mode("overwrite").save()
    secs.append(time.time() - t0)
sec = min(secs)
print(json.dumps({{"cpus": cpus, "records": n_records, "sec": round(sec, 3),
                   "runs": [round(s, 3) for s in secs]}}))
spark.stop()
"""


def gen_corpus(root: str, n_files: int, recs_per_file: int) -> int:
    """Deterministic multi-member corpus; returns total UNCOMPRESSED bytes
    (the throughput denominator — what the parser actually frames)."""
    os.makedirs(root, exist_ok=True)
    total = 0
    body_unit = (
        b"<html><body>Dresden und Leipzig liegen in Sachsen. "
        b"Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 40
    )
    for fi in range(n_files):
        out = Path(root) / f"member-{fi:04d}.warc.gz"
        if out.exists():
            total += out.stat().st_size and _raw_size(out)
            continue
        blocks = []
        for ri in range(recs_per_file):
            body = body_unit + f"<!-- {fi}/{ri} -->".encode()
            http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            blocks.append(
                (
                    f"WARC/1.0\r\nWARC-Type: response\r\n"
                    f"WARC-Target-URI: https://bench.example/{fi}/{ri}\r\n"
                    f"WARC-Date: 2024-06-01T00:00:00Z\r\n"
                    f"Content-Length: {len(http)}\r\n\r\n"
                ).encode()
                + http
                + b"\r\n\r\n"
            )
        raw = b"".join(blocks)
        total += len(raw)
        with gzip.open(out, "wb", compresslevel=1) as f:
            f.write(raw)
    return total


def _raw_size(path: Path) -> int:
    n = 0
    with gzip.open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                return n
            n += len(chunk)


_CEILING_WORKER = r"""
import glob, json, sys, time
sys.path.insert(0, {repo!r})
from multiprocessing import Pool
from esmarc_spark.pipeline.warc import _open_member, _record_rows

procs = int(sys.argv[1]); path = sys.argv[2]

def frame(f):
    s = _open_member(f, None)
    n = 0
    for row in _record_rows(s, "skip", False):
        n += len(row[2])
    s.close()
    return n

files = sorted(glob.glob(path + "/*.warc.gz"))
with Pool(procs) as pool:
    pool.map(frame, files)                               # warm-up (page cache)
    secs = []
    for _ in range(3):
        t0 = time.time()
        pool.map(frame, files)
        secs.append(time.time() - t0)
print(json.dumps({{"procs": procs, "sec": round(min(secs), 3)}}))
"""


def _ceiling(procs: int, path: str) -> dict:
    """Pure-Python framing of the same files via multiprocessing — the
    machine's delivered Python-compute at this level, no Spark, no Arrow.
    Job efficiency is read RELATIVE to this (same protocol as
    scripts/bench_scaling.py's JVM ceiling)."""
    out = subprocess.run(
        [sys.executable, "-c", _CEILING_WORKER.format(repo=str(REPO)),
         str(procs), path],
        capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stderr[-3000:])


def _run(cpus: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=str(REPO)), str(cpus), path],
        capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stderr[-3000:])


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    recs = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    root = f"/tmp/warc_bench_{n_files}x{recs}"
    t0 = time.time()
    raw_bytes = gen_corpus(root, n_files, recs)
    gen_sec = round(time.time() - t0, 1)

    r_lo = _run(lo, root)
    r_hi = _run(hi, root)
    c_lo = _ceiling(lo, root)
    c_hi = _ceiling(hi, root)
    mb = raw_bytes / 1e6
    eff = (mb / r_hi["sec"]) / (mb / r_lo["sec"]) / (hi / lo)
    ceiling_eff = (c_lo["sec"] / c_hi["sec"]) / (hi / lo)
    result = {
        "n_files": n_files,
        "recs_per_file": recs,
        "raw_mb": round(mb, 1),
        "gen_sec": gen_sec,
        "records": r_lo["records"],
        "lo": r_lo,
        "hi": r_hi,
        "mb_per_sec_lo": round(mb / r_lo["sec"], 1),
        "mb_per_sec_hi": round(mb / r_hi["sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "ceiling": {"lo": c_lo, "hi": c_hi,
                    "scaling_efficiency": round(ceiling_eff, 3)},
        "efficiency_vs_ceiling": round(eff / ceiling_eff, 3),
    }
    (REPO / "BENCH" / "warc_ingest.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
