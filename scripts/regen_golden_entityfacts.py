#!/usr/bin/env python3
"""Regenerate tests/golden/enrich_entityfacts_docs.ldj (the driver oracle
for the enrich_entityfacts_docs query). Run ONLY when tests/test_bots.py
(exact reference-bot parity) is green — that suite is the golden's
authority."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as e  # noqa: E402
from esmarc_spark.session import get_spark  # noqa: E402

spark = get_spark("regen-ef-golden", cpus=8)
rows = e.queries()["enrich_entityfacts_docs"](spark, "unused")
out = REPO / "tests" / "golden" / "enrich_entityfacts_docs.ldj"
with out.open("w") as f:
    for r in sorted(rows.collect(), key=lambda r: int(r.record_id)):
        f.write(json.dumps({"record_id": r.record_id, "doc": r.doc},
                           ensure_ascii=False) + "\n")
print(f"-> {out}")
