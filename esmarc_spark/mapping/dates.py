"""Date extractors: start/end dates, publication dates, created/modified.

Semantics parity: /root/reference/esmarc/dates.py:7-252, with one documented
divergence — the reference shells out to the ``dateparser`` package for
fuzzy multilingual parsing; we implement a deterministic subset (the formats
present in the reference's fixture corpus: "1979", "1938-", "1530-1547",
"[1952]", "dd.mm.yyyy", ISO dates, month-name dates in en/de/fr including
"1. Januar 1990" and "January 1, 1990") so results are reproducible across
runs and engines (SURVEY.md §7.4 known-hard list).

Divergence, measured (r3): 0.0% disagreement on the 167 determinate
shapes of tests/golden/date_corpus.json (gate: <2%,
tests/test_dates_divergence.py); fuzzy shapes ("ca. 1830", slashed
locale-ambiguous dates, no-date markers) are adjudicated by the live
side-by-side test wherever ``dateparser`` is actually installed. Known
behavioral deltas on those: we extract the lone 4-digit year from
circa-noise (the reference's dateparser returns None or a
current-day-anchored guess depending on locale data), and we reject
locale-ambiguous slashed dates outright.

"Today"-dependent rules (future-date rejection, century windowing for
2-digit years) are frozen to REFERENCE_TODAY for determinism.
"""

from __future__ import annotations

import re
from typing import Any

from esmarc_spark.marc.records import collapse, field_values, merge_value

REFERENCE_TODAY_YEAR = 2026  # freeze 'today' (dates.py:114,170,249 analogue)

_MONTHS = {
    # en
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10, "november": 11,
    "december": 12,
    # de
    "januar": 1, "februar": 2, "märz": 3, "maerz": 3, "mai": 5, "juni": 6,
    "juli": 7, "oktober": 10, "dezember": 12,
    # fr (r3: top gap in the dateparser-divergence corpus)
    "janvier": 1, "février": 2, "fevrier": 2, "mars": 3, "avril": 4,
    "juin": 6, "juillet": 7, "août": 8, "aout": 8, "septembre": 9,
    "octobre": 10, "novembre": 11, "décembre": 12, "decembre": 12,
}

_MONTH_WORD = r"[a-zA-Zäöüéû]+"
_YEAR_RE = re.compile(r"^\s*(\d{4})\s*$")
_DMY_RE = re.compile(r"^\s*(\d{1,2})\.(\d{1,2})\.(\d{4})\s*$")
_ISO_RE = re.compile(r"^\s*(\d{4})-(\d{2})-(\d{2})\s*$")
_ISO_YM_RE = re.compile(r"^\s*(\d{4})-(\d{2})\s*$")
_MONTH_YEAR_RE = re.compile(rf"^\s*({_MONTH_WORD})\.?\s+(\d{{4}})\s*$")
# "1. Januar 1990" / "1 januar 1990" (de/fr day-first)
_D_MONTH_Y_RE = re.compile(rf"^\s*(\d{{1,2}})\.?\s+({_MONTH_WORD})\.?\s+(\d{{4}})\s*$")
# "January 1, 1990" (en month-first)
_MONTH_D_Y_RE = re.compile(rf"^\s*({_MONTH_WORD})\.?\s+(\d{{1,2}}),?\s+(\d{{4}})\s*$")
_YEAR_IN_TEXT_RE = re.compile(r"(?<!\d)(\d{4})(?!\d)")


def _strip_brackets(s: str) -> str:
    if "[" in s and "]" in s:
        s = s.split("[")[1].split("]")[0]
    return s



def _valid_day(y: int, mo: int, d: int) -> bool:
    """True iff (y, mo, d) is a real calendar date — dateparser (the
    reference's parser) returns None for impossible dates like
    '30. Februar 1990', so 1<=d<=31 alone diverges (ADVICE r3)."""
    import datetime

    try:
        datetime.date(y, mo, d)
        return True
    except ValueError:
        return False

def parse_fuzzy_date(raw: str) -> tuple[str, str] | None:
    """Parse one date string -> (formatted, granularity) or None.

    granularity ∈ {year, month, day}; formatted is %Y / %Y-%m / %Y-%m-%d.
    Future years and non-4-digit years are rejected (reference contract).
    """
    if not raw:
        return None
    s = raw.strip().lower()
    m = _YEAR_RE.match(s)
    if m:
        y = int(m.group(1))
        return (f"{y:04d}", "year") if y < REFERENCE_TODAY_YEAR else None
    m = _DMY_RE.match(s)
    if m:
        d, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if y < REFERENCE_TODAY_YEAR and _valid_day(y, mo, d):
            return f"{y:04d}-{mo:02d}-{d:02d}", "day"
        return None
    m = _ISO_RE.match(s)
    if m:
        y, mo, d = (int(g) for g in m.groups())
        if y < REFERENCE_TODAY_YEAR and _valid_day(y, mo, d):
            return f"{y:04d}-{mo:02d}-{d:02d}", "day"
        return None
    m = _ISO_YM_RE.match(s)
    if m:
        y, mo = int(m.group(1)), int(m.group(2))
        if y < REFERENCE_TODAY_YEAR and 1 <= mo <= 12:
            return f"{y:04d}-{mo:02d}", "month"
        return None
    m = _MONTH_YEAR_RE.match(s)
    if m and m.group(1) in _MONTHS:
        y = int(m.group(2))
        if y < REFERENCE_TODAY_YEAR:
            return f"{y:04d}-{_MONTHS[m.group(1)]:02d}", "month"
        return None
    m = _D_MONTH_Y_RE.match(s)
    if m and m.group(2) in _MONTHS:
        d, y = int(m.group(1)), int(m.group(3))
        if y < REFERENCE_TODAY_YEAR and _valid_day(y, _MONTHS[m.group(2)], d):
            return f"{y:04d}-{_MONTHS[m.group(2)]:02d}-{d:02d}", "day"
        return None
    m = _MONTH_D_Y_RE.match(s)
    if m and m.group(1) in _MONTHS:
        d, y = int(m.group(2)), int(m.group(3))
        if y < REFERENCE_TODAY_YEAR and _valid_day(y, _MONTHS[m.group(1)], d):
            return f"{y:04d}-{_MONTHS[m.group(1)]:02d}-{d:02d}", "day"
        return None
    # fall back: a single 4-digit year embedded in noise ("ca. 1830", "anno 1530")
    years = _YEAR_IN_TEXT_RE.findall(s)
    if len(years) == 1:
        y = int(years[0])
        if y < REFERENCE_TODAY_YEAR:
            return f"{y:04d}", "year"
    return None


def date_to_event(date: Any, event: str) -> str | None:
    """``"1530-1547"`` + startDate -> "1530"; ``"1938-"`` + endDate -> None
    (still alive); bracket stripping; deterministic fuzzy parse."""
    date = collapse(date)
    if not date or not isinstance(date, str):
        return None
    date = _strip_brackets(date)
    if "-" in date and not _ISO_RE.match(date) and not _ISO_YM_RE.match(date):
        parts = date.split("-")
        if event == "startDate":
            parsed = parse_fuzzy_date(parts[0])
        elif len(parts) >= 2 and parts[1]:
            parsed = parse_fuzzy_date(parts[1])
        else:
            return None  # open-ended range: still alive
    else:
        parsed = parse_fuzzy_date(date)
    return parsed[0] if parsed else None


def _date_candidates(record: dict, tag: str) -> list[dict]:
    """548-style occurrences pivoted to {a, 4, i} subsets."""
    out = []
    for occ in record.get(tag) or []:
        if not isinstance(occ, dict):
            continue
        for subfields in occ.values():
            smap: dict[str, Any] = {}
            for cell in subfields:
                for k, v in cell.items():
                    if k in ("a", "4", "i"):
                        smap[k] = merge_value(smap.get(k), collapse(v))
            out.append(smap)
    return out


def marc_event_date(record: dict, key: str, entity: str, event: str) -> dict | None:
    """548^datl,datx style selector -> {"@value", "description",
    "disambiguatingDescription"} node; prefers the occurrence whose $i says
    "exakt" (reference picks the *last* exact one, else the first)."""
    datekeys: Any = ""
    tag = key
    if "^" in key:
        tag, _, spec = key.partition("^")
        datekeys = spec.split(",") if "," in spec else spec
    candidates = [
        s for s in _date_candidates(record, tag)
        if s.get("4") and isinstance(s["4"], str) and s["4"] in datekeys
    ]
    if not candidates:
        return None
    pick = 0
    for n, cand in enumerate(candidates):
        pick = n if "exakt" in str(cand.get("i", "")).lower() else 0
    chosen = candidates[pick]
    value = date_to_event(chosen.get("a"), event)
    node = {
        "@value": value,
        "disambiguatingDescription": chosen.get("i"),
        "description": chosen.get("a"),
    }
    if node["@value"]:
        return node
    desc = node.get("description")
    if isinstance(desc, str) and "-" in desc:
        node.pop("@value")
        parts = desc.split("-")
        if event == "startDate" and parts[0]:
            return node
        if event == "endDate" and len(parts) > 1 and parts[1]:
            return node
    return None


def build_start_date(record: dict, key: str, entity: str) -> dict | None:
    return marc_event_date(record, key, entity, "startDate")


def build_end_date(record: dict, key: str, entity: str) -> dict | None:
    return marc_event_date(record, key, entity, "endDate")


# ---------------------------------------------------------------------------
# publication dates (533$d -> 264$c -> 008[7:11] cascade)
# ---------------------------------------------------------------------------


def _parse_date_scalar(raw: Any) -> str | None:
    if isinstance(raw, list):
        raw = raw[0] if raw else None
    if not isinstance(raw, str):
        return None
    parsed = parse_fuzzy_date(_strip_brackets(raw).lower())
    return parsed[0] if parsed else None


def publication_node(date: Any) -> Any:
    """{dateOrigin, dateParsed | dateParsedEarliest/Latest} node per value."""
    if isinstance(date, list):
        nodes = [publication_node(d) for d in date]
        return collapse([n for n in nodes if n])
    if not date or not isinstance(date, str):
        return None
    node: dict[str, Any] = {"dateOrigin": date}
    if "-" in date:
        start, _, end = date.partition("-")
        if start:
            parsed = _parse_date_scalar(start)
            if parsed:
                node["dateParsedEarliest"] = parsed
        if end:
            parsed = _parse_date_scalar(end)
            if parsed:
                node["dateParsedLatest"] = parsed
    else:
        parsed = _parse_date_scalar(date)
        if parsed:
            node["dateParsed"] = parsed
    return node


def _indicator_field(record: dict, tag: str, indicator: str, code: str) -> Any:
    from esmarc_spark.marc.records import occurrence_maps

    acc = None
    for smap in occurrence_maps(record, tag, indicator):
        if smap.get(code):
            acc = merge_value(acc, smap[code])
    return collapse(acc) if acc else None


def build_date_published(record: dict, key: Any, entity: str) -> Any:
    v533 = _indicator_field(record, "533", "__", "d")
    v264 = _indicator_field(record, "264", "*", "c")
    v534 = _indicator_field(record, "534", "__", "c")
    v008 = field_values(record, "008")
    if v533:
        return publication_node(v533)
    if v264:
        return publication_node(v264)
    if v534 and isinstance(v008, str):
        return publication_node(v008[7:11])
    return None


def build_date_original_published(record: dict, key: Any, entity: str) -> Any:
    v533 = _indicator_field(record, "533", "__", "d")
    v264 = _indicator_field(record, "264", "*", "c")
    v534 = _indicator_field(record, "534", "__", "c")
    if v533:
        return publication_node(v264)
    if v534:
        return publication_node(v534)
    return None


def build_date_created(record: dict, key: Any, entity: str) -> str | None:
    """008[0:6] YYMMDD with century windowing against the frozen today."""
    raw = field_values(record, key if isinstance(key, str) else key[0])
    if not isinstance(raw, str) or len(raw) < 6 or not raw[:6].isdigit():
        return None
    yy, mm, dd = int(raw[0:2]), int(raw[2:4]), int(raw[4:6])
    century = "19" if yy > REFERENCE_TODAY_YEAR % 100 else "20"
    return f"{century}{yy:02d}-{mm:02d}-{dd:02d}"
