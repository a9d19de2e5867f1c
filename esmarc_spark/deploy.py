"""Packaging for spark-submit --py-files and executor self-shipping.

``package_zip()`` builds a zip of the esmarc_spark package; ``get_spark``
attaches it via ``SparkContext.addPyFile`` so Python workers can import the
package regardless of the driver's cwd — the same artifact you would pass to
``spark-submit --py-files`` on a real cluster (BASELINE.json north_star).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

PACKAGE_ROOT = Path(__file__).resolve().parent


def package_zip(out_dir: str | None = None) -> str:
    """Zip the esmarc_spark package; content-addressed so repeated sessions
    reuse the same artifact and changed code gets a fresh one."""
    # *.json rides along for package data (e.g. lookups/bpe_merges.json),
    # loaded zip-safely via importlib.resources on executors
    sources = sorted(
        p
        for pat in ("*.py", "*.json")
        for p in PACKAGE_ROOT.rglob(pat)
        if "__pycache__" not in p.parts
    )
    digest = hashlib.sha256()
    for p in sources:
        digest.update(str(p.relative_to(PACKAGE_ROOT)).encode())
        digest.update(p.read_bytes())
    out_dir = out_dir or tempfile.gettempdir()
    out_path = Path(out_dir) / f"esmarc_spark-{digest.hexdigest()[:16]}.zip"
    if not out_path.exists():
        tmp = out_path.with_suffix(".tmp")
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in sources:
                zf.write(p, f"esmarc_spark/{p.relative_to(PACKAGE_ROOT)}")
        os.replace(tmp, out_path)
    return str(out_path)
