"""Deployment-contract test: the engine actually runs via
`spark-submit --py-files <package zip>` (BASELINE.json north_star), with
the package importable ONLY from the shipped artifact."""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from esmarc_spark.deploy import package_zip

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    # pyspark wheel layout: <site-packages>/pyspark/bin/spark-submit
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    return str(cand) if cand.exists() else None


def test_spark_submit_py_files_roundtrip(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not found")
    in_pq = str(tmp_path / "webtext.parquet")
    out_dir = str(tmp_path / "triples")
    env = dict(os.environ)
    # the job must import esmarc_spark from --py-files alone: run from a
    # neutral cwd and strip repo paths from PYTHONPATH
    env["PYTHONPATH"] = ""
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", package_zip(),
            str(REPO / "scripts" / "submit_job.py"),
            in_pq, out_dir, "300",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "TRIPLES_WRITTEN=" in proc.stdout
    n = int(proc.stdout.split("TRIPLES_WRITTEN=")[1].split()[0])
    assert n > 0

    # the written triples are readable and carry the contract schema
    import pyarrow.parquet as pq

    table = pq.read_table(out_dir)
    assert {"subj", "pred", "obj"} <= set(table.column_names)
    assert table.num_rows == n
