#!/usr/bin/env python3
"""Regenerate tests/golden/marc_fixture_triples.ldj from the reference
fixtures through the mapping engine. Run ONLY after the reference-as-oracle
parity suite (tests/test_reference_oracle.py) is green — the golden's
authority comes from that gate, not from this script."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from esmarc_spark.mapping.engine import record_to_triples  # noqa: E402

rows = []
for p in sorted(Path("/root/reference/tests/in").iterdir()):
    rows.extend(record_to_triples(json.loads(p.read_text())))

out = REPO / "tests" / "golden" / "marc_fixture_triples.ldj"
with out.open("w") as f:
    for entity, subj, pred, obj in sorted(rows):
        f.write(
            json.dumps(
                {"entity": entity, "subj": subj, "pred": pred, "obj": obj},
                ensure_ascii=False,
            )
            + "\n"
        )
print(f"{len(rows)} triples -> {out}")
