#!/usr/bin/env python3
"""Regenerate tests/golden/enrich_sachgruppen_docs.ldj. Run ONLY when
tests/test_bots.py (exact reference-bot parity) is green — that suite is
the golden's authority."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as e  # noqa: E402
from esmarc_spark.session import get_spark  # noqa: E402

spark = get_spark("regen-sach-golden", cpus=8)
rows = e.queries()["enrich_sachgruppen_docs"](spark, "unused")
out = REPO / "tests" / "golden" / "enrich_sachgruppen_docs.ldj"
with out.open("w") as f:
    for r in sorted(rows.collect(), key=lambda r: int(r.record_id)):
        f.write(json.dumps({"record_id": r.record_id, "doc": r.doc},
                           ensure_ascii=False) + "\n")
print(f"-> {out}")
