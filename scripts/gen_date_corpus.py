#!/usr/bin/env python3
"""Generate tests/golden/date_corpus.json — the dateparser-divergence
corpus (VERDICT r2 #5).

Each entry is {"raw": str, "expect": [formatted, granularity] | None |
"unknown"}:

* a LIST/None expectation is a shape whose behavior under the reference's
  ``dateparser.date.DateDataParser`` is unambiguous from its documented
  semantics (ISO dates, dotted DMY, month names across en/de/fr, plain
  and future years) — the ALWAYS-ON pytest gate compares our
  deterministic parser against these;
* "unknown" marks fuzzy shapes (circa-prefixes, no-date markers, slashed
  dates with locale-dependent order) where only a live dateparser can
  adjudicate — the importorskip side-by-side in test_dates_divergence
  measures those when the package is installed (it is not in this
  sandbox).

Also folds in every 548/260/264 $a-like date string found in the
reference fixtures (as "unknown"; their end-to-end behavior is already
pinned by the fixture-parity suite).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

EN = {1: "january", 2: "february", 3: "march", 4: "april", 5: "may",
      6: "june", 7: "july", 8: "august", 9: "september", 10: "october",
      11: "november", 12: "december"}
DE = {1: "januar", 2: "februar", 3: "märz", 5: "mai", 6: "juni", 7: "juli",
      8: "august", 10: "oktober", 11: "november", 12: "dezember"}
FR = {1: "janvier", 2: "février", 3: "mars", 4: "avril", 6: "juin",
      7: "juillet", 8: "août", 9: "septembre", 10: "octobre",
      11: "novembre", 12: "décembre"}


def main() -> None:
    entries: list[dict] = []

    def add(raw: str, expect) -> None:
        entries.append({"raw": raw, "expect": expect})

    # dense year grid (round 4, VERDICT r3 #7: corpus >=1000 strings) —
    # every determinate shape is unambiguous under dateparser's
    # documented semantics AND covered by parse_fuzzy_date
    years = list(range(1503, 2024, 3))
    for y in years:
        add(f"{y}", [f"{y:04d}", "year"])
        mo = (y % 12) + 1
        d = (y % 27) + 1
        add(f"{d:02d}.{mo:02d}.{y}", [f"{y:04d}-{mo:02d}-{d:02d}", "day"])
        add(f"{y}-{mo:02d}-{d:02d}", [f"{y:04d}-{mo:02d}-{d:02d}", "day"])
        add(f"{y}-{mo:02d}", [f"{y:04d}-{mo:02d}", "month"])
        if mo in EN:
            add(f"{EN[mo]} {y}", [f"{y:04d}-{mo:02d}", "month"])
            add(f"{EN[mo]} {d}, {y}", [f"{y:04d}-{mo:02d}-{d:02d}", "day"])
        if mo in DE:
            add(f"{DE[mo]} {y}", [f"{y:04d}-{mo:02d}", "month"])
            add(f"{d}. {DE[mo]} {y}", [f"{y:04d}-{mo:02d}-{d:02d}", "day"])
        if mo in FR:
            add(f"{FR[mo]} {y}", [f"{y:04d}-{mo:02d}", "month"])
    for y in (2030, 2041, 2111):  # future -> rejected by both engines
        add(f"{y}", None)
        add(f"{y}-01-02", None)

    # impossible calendar dates -> None from dateparser and from us
    # (round-4 calendar validation; '30. Februar 1990' was the ADVICE case)
    for y in (1892, 1900, 1955, 1990, 2000):
        add(f"30.02.{y}", None)
        add(f"31.04.{y}", None)
        add(f"{y}-02-30", None)
        add(f"{y}-11-31", None)
        add(f"30. Februar {y}", None)
        add(f"February 30, {y}", None)
        # leap-day: valid only in actual leap years
        leap = (y % 4 == 0 and y % 100 != 0) or y % 400 == 0
        add(f"29.02.{y}", [f"{y:04d}-02-29", "day"] if leap else None)

    # fuzzy shapes: only a live dateparser can adjudicate
    for y in (1830, 1900, 1955):
        for shape in (f"ca. {y}", f"um {y}", f"anno {y}", f"{y}?",
                      f"approximately {y}", f"circa {y}", f"vor {y}"):
            add(shape, "unknown")
    for junk in ("o.J.", "n.d.", "s.a.", "s.l.", "undatiert", "19XX",
                 "1/2/1990", "02/03/1990", "1990/03/02"):
        add(junk, "unknown")

    # fixture-derived date strings (548/260/264 $a values): end-to-end
    # behavior pinned by the parity suite; here they feed the live
    # side-by-side only
    seen = {e["raw"] for e in entries}
    date_like = re.compile(r"\d{3,4}")
    for rec_path in sorted((Path("/root/reference/tests/in")).glob("*")):
        try:
            rec = json.loads(rec_path.read_text())
        except Exception:
            continue
        for tag in ("548", "260", "264", "533", "534"):
            for occ in rec.get(tag) or []:
                if not isinstance(occ, dict):
                    continue
                for subfields in occ.values():
                    for cell in subfields:
                        for k, v in cell.items():
                            if k not in ("a", "c", "d"):
                                continue
                            vals = v if isinstance(v, list) else [v]
                            for s in vals:
                                if (isinstance(s, str) and date_like.search(s)
                                        and s not in seen and len(s) < 40):
                                    seen.add(s)
                                    add(s, "unknown")

    out = REPO / "tests" / "golden" / "date_corpus.json"
    out.write_text(json.dumps(entries, ensure_ascii=False, indent=1) + "\n")
    n_det = sum(1 for e in entries if e["expect"] != "unknown")
    print(f"{len(entries)} entries ({n_det} determinate) -> {out}")


if __name__ == "__main__":
    main()
