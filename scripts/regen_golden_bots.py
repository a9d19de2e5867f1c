#!/usr/bin/env python3
"""Regenerate ALL enrichment-bot goldens (tests/golden/enrich_*_docs.ldj)
— the DuckDB sides of the enrich_*_docs driver oracles. Run ONLY when
tests/test_bots.py (exact reference-bot parity with mocked HTTP) is green:
that suite, not this script, is the goldens' authority."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as e  # noqa: E402
from esmarc_spark.session import get_spark  # noqa: E402

BOTS = ["entityfacts", "sachgruppen", "wikidata", "sitelinks", "categories", "geonames"]

spark = get_spark("regen-bot-goldens", cpus=8)
for bot in BOTS:
    rows = e.queries()[f"enrich_{bot}_docs"](spark, "unused").collect()
    out = REPO / "tests" / "golden" / f"enrich_{bot}_docs.ldj"
    with out.open("w") as f:
        for r in sorted(rows, key=lambda r: int(r.record_id)):
            f.write(json.dumps({"record_id": r.record_id, "doc": r.doc},
                               ensure_ascii=False) + "\n")
    print(f"{bot}: {len(rows)} -> {out}")
