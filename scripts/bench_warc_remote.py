"""Remote-open WARC ingest overhead (round 5): the object-store code
path — pyarrow FileSystem listing + per-member ``open_input_stream`` —
vs the local ``open()`` path, on the SAME members, same session, 8
cores (this VM's stable level), min-of-3 after warm-up.

SubTreeFileSystem over local disk exercises exactly the remote branch
(no posix open, no ``file:`` handling, fs-relative paths), so the delta
measured here is the pyarrow streaming layer's cost; a real s3://
deployment adds network, not code.

Usage: python scripts/bench_warc_remote.py [n_files] [recs_per_file]
Writes BENCH/warc_remote.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    recs = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    import pyarrow.fs as pafs
    from pyspark.sql import functions as F

    sys.path.insert(0, str(REPO / "scripts"))
    from bench_warc import gen_corpus  # shared deterministic corpus

    from esmarc_spark.session import get_spark

    spark = get_spark("warc-remote-bench", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    from esmarc_spark.pipeline.warc import read_warc

    root = Path("/tmp/warc_remote_bench")
    total_bytes = gen_corpus(str(root), n_files, recs)

    fs = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())

    def job(mode: str):
        if mode == "local":
            df = read_warc(spark, f"{root}/*.warc.gz")
        else:
            df = read_warc(spark, "*.warc.gz", filesystem=fs)
        return df.select("url", F.length("html").alias("n"))

    out = {"n_files": n_files, "recs_per_file": recs, "bytes": total_bytes}
    counts = {m: job(m).count() for m in ("local", "pyarrow_fs")}  # warm-up
    assert counts["local"] == counts["pyarrow_fs"], counts
    out["records"] = counts["local"]
    for mode in ("local", "pyarrow_fs"):
        secs = []
        for _ in range(3):
            t0 = time.time()
            job(mode).write.format("noop").mode("overwrite").save()
            secs.append(time.time() - t0)
        out[mode] = {
            "sec": round(min(secs), 3),
            "runs": [round(s, 3) for s in secs],
            "mb_per_sec": round(total_bytes / (1 << 20) / min(secs), 1),
        }
    out["overhead_ratio"] = round(
        out["pyarrow_fs"]["sec"] / out["local"]["sec"], 3
    )
    print(json.dumps(out))
    (REPO / "BENCH" / "warc_remote.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    spark.stop()


if __name__ == "__main__":
    main()
