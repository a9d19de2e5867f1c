"""Reference-as-oracle parity: run the ACTUAL reference extractor code
(read-only at /root/reference, with stand-in modules for its two absent
dependencies) against our extractors on all 17 fixture records.

This widens the correctness net far beyond the 5 registered golden
families: titles, contributors, identifiers, classifications, sameAs,
about, series/partOf/relations, language, footnotes, catalogue — every
record x every extractor, compared under the contract equivalences
(sort_keys JSON, scalar ≡ [scalar], None/empty scrubbed — FIXTURES.md §5).

Shims:
  * es2json — only the four pure helpers the extractors use (litter,
    ArrayOrSingleValue, isint/isfloat, eprint), implemented per the public
    package's semantics (SURVEY.md §1.5); ES classes stubbed as unused.
  * dateparser — minimal object; the date family is EXCLUDED from this
    oracle (our deterministic parser intentionally diverges from the fuzzy
    dateparser package — documented in mapping/dates.py).
"""

from __future__ import annotations

import json
import sys
import types

import pytest

from tests.conftest import REFERENCE_TESTS, load_fixture_record

ALL_IDS = sorted(p.name for p in (REFERENCE_TESTS / "in").iterdir())


# ---------------------------------------------------------------------------
# dependency shims + reference import
# ---------------------------------------------------------------------------


def _install_shims():
    es2json = types.ModuleType("es2json")

    def ArrayOrSingleValue(v):
        if isinstance(v, list):
            if not v:
                return None
            if len(v) == 1:
                return v[0]
        return v

    def litter(lst, elm):
        if not lst:
            return elm
        if isinstance(elm, (str, dict)):
            if isinstance(lst, (str, dict)):
                return [lst, elm] if lst != elm else lst
            if isinstance(lst, list) and elm not in lst:
                lst.append(elm)
            return lst
        if isinstance(elm, list):
            if isinstance(lst, (str, dict)):
                lst = [lst]
            for item in elm:
                if item not in lst:
                    lst.append(item)
            return lst
        return lst

    def isint(s):
        try:
            int(s)
            return True
        except (TypeError, ValueError):
            return False

    es2json.ArrayOrSingleValue = ArrayOrSingleValue
    es2json.litter = litter
    es2json.isint = isint
    es2json.isfloat = lambda s: _try_float(s)
    es2json.eprint = lambda *a, **k: None
    es2json.ESGenerator = object
    es2json.IDFile = object
    es2json.esgenerator = object
    sys.modules.setdefault("es2json", es2json)

    dateparser = types.ModuleType("dateparser")
    date_mod = types.ModuleType("dateparser.date")

    class _DDP:  # never exercised: date family excluded from this oracle
        def get_date_data(self, *_a, **_k):
            return types.SimpleNamespace(date_obj=None, period=None)

    date_mod.DateDataParser = _DDP
    dateparser.date = date_mod
    sys.modules.setdefault("dateparser", dateparser)
    sys.modules.setdefault("dateparser.date", date_mod)


def _try_float(s):
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False


@pytest.fixture(scope="module")
def ref():
    _install_shims()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import esmarc.globals as g

    g.base_id = "https://opac.k10plus.de/DB=2.299/PPNSET?PPN="
    g.target_id = "https://data.slub-dresden.de/"
    import esmarc.about
    import esmarc.catalogue
    import esmarc.classifications
    import esmarc.coordinates
    import esmarc.editions
    import esmarc.footnotes
    import esmarc.gender
    import esmarc.genre
    import esmarc.id
    import esmarc.language
    import esmarc.namings
    import esmarc.nop
    import esmarc.publisher
    import esmarc.relatedTo
    import esmarc.sameAs
    import esmarc.subfields

    return sys.modules["esmarc"]


# ---------------------------------------------------------------------------
# comparison contract
# ---------------------------------------------------------------------------


def canon(v):
    """Contract equivalence: scrub None/empty, collapse singleton lists,
    order-insensitive lists."""
    if isinstance(v, dict):
        out = {k: canon(x) for k, x in v.items()}
        out = {k: x for k, x in out.items() if x not in (None, [], {}, "")}
        return out or None
    if isinstance(v, (list, tuple)):
        items = [canon(x) for x in v]
        items = [x for x in items if x not in (None, [], {}, "")]
        if not items:
            return None
        if len(items) == 1:
            return items[0]
        return sorted(items, key=lambda x: json.dumps(x, sort_keys=True, ensure_ascii=False))
    return v


# (our_fn_path, our_key, ref_module, ref_fn, ref_key) — keys per the
# reference's entities table (esmarc.py:39-237)
MENTION_KEYS = ["600", "610", "611", "630", "648", "650", "651", "653", "655", "689"]
CLASS_KEYS = ["050._0", "082.0_", "082.04", "084.__"]
TITLE_KEYS = ["130", "210", "240", "245", "246", "247", "249", "501", "505", "700", "710", "711", "730"]
CONTRIB_KEYS = ["100", "110", "111", "700", "710", "711"]
FOOTNOTE_KEYS = ["242", "385", "500", "502", "508", "511", "515", "518", "521", "533", "535", "538", "546", "555", "561", "563", "937"]
IDBY_KEYS = ["015", "020", "022", "024", "026", "028", "030", "035", "088", "510", "770", "772", "773", "775", "776", "780", "785", "787", "800", "810", "811", "830"]
ABOUT_KEYS = ["936", "084", "083", "082", "655"]


def _cases():
    from esmarc_spark.mapping import dates as D
    from esmarc_spark.mapping import extractors as X
    from esmarc_spark.mapping import nodes as N

    return [
        ("sameAs", X.build_same_as, ["016", "035..a"], "sameAs", "getsameAs"),
        ("mentions", X.build_mentions, MENTION_KEYS, "classifications", "get_mentions"),
        ("classifications", X.build_classifications, CLASS_KEYS, "classifications", "get_class"),
        ("publisher", X.build_publisher, ["533", "264"], "publisher", "getpublisher"),
        ("originalPublisher", X.build_original_publisher, ["533", "264"], "publisher", "getoriginalPublisher"),
        ("location", X.build_publish_locations, "751", "publisher", "getPublishLocation"),
        ("cartographicData", X.build_cartographic_data, "255", "coordinates", "get_cartData"),
        ("identifier", X.build_identifiers, "024", "id", "handle_identifier"),
        ("identifiedBy", N.build_identified_by, IDBY_KEYS, "id", "get_identifiedby"),
        ("isil", X.build_isil, ["003", "852..a", "924..b"], "id", "getisil"),
        ("gender", X.build_gender, "375..a", "gender", "handlesex"),
        ("genre", X.build_genre, "655..a", "genre", "getgenre"),
        ("pages", X.build_page_count, ["300..a", "300..b", "300..c", "300..d", "300..e", "300..f", "300..g"], "nop", "getnumberofpages"),
        ("accessMode", X.build_access_mode, "007", "catalogue", "get_accessmode"),
        ("dateModified", X.build_date_modified, "005", "dates", "getdateModified"),
        ("dateCreated", D.build_date_created, ["008"], "dates", "handle_dateCreated"),
        ("name245", X.build_name, ["245..a", "245..b"], "namings", "getName"),
        ("title", N.build_title, TITLE_KEYS, "namings", "gettitle"),
        ("contributor", N.build_contributors, CONTRIB_KEYS, "namings", "handle_contributor"),
        ("topicName", N.build_topic_name, "150", "namings", "handle_preferredName_topic"),
        ("language", N.build_language, "041..a", "language", "get_language"),
        ("originalLanguage", N.build_language, "041..h", "language", "get_language"),
        ("footnotes", N.build_footnotes, FOOTNOTE_KEYS, "footnotes", "get_footnotes"),
        ("collection", N.build_collection, ["084..a", "935..a"], "catalogue", "get_collection"),
        ("usageInfo", N.build_usage_info, ["506.*", "540.__"], "catalogue", "get_usageInfo"),
        ("physical", N.build_physical, ["300", "533"], "catalogue", "get_physical"),
        ("offers", N.build_offers, ["924..b", "001"], "catalogue", "getav_katalog"),
        ("editionStatement", N.build_edition_statement, "250", "editions", "geteditionStatement"),
        ("editionSequence", N.build_edition_sequence, "362", "editions", "geteditionSequence"),
        ("reproSeries", N.build_repro_series, "533..f", "editions", "get_reproductionSeriesStatement"),
        ("seriesStatement", N.build_series_statement, "490", "relatedTo", "get_seriesStatement"),
        ("partOfSeries", N.build_part_of_series, ["776", "800", "810", "811", "830"], "relatedTo", "get_partseries"),
        ("isPartOf", N.build_is_part_of, ["245", "773"], "relatedTo", "get_ispartof"),
        ("relations", N.build_relations, ["770", "772", "775", "776", "780", "785", "787"], "relatedTo", "get_relations"),
        ("about", N.build_about, ABOUT_KEYS, "about", "handle_about"),
        ("relatedTo", N.build_related, "500..0", "relatedTo", "relatedTo"),
        ("subfield711", N.build_subfield_node, "711", "subfields", "get_subfield"),
        ("geo", X.build_geo_coordinates, {"longitude": ["034..d", "034..e"], "latitude": ["034..f", "034..g"]}, "coordinates", "getGeoCoordinates"),
    ]


def test_reference_oracle_parity(ref):
    import copy
    import importlib

    mismatches = []
    total = 0
    for label, ours, key, ref_mod_name, ref_fn_name in _cases():
        ref_fn = getattr(importlib.import_module(f"esmarc.{ref_mod_name}"), ref_fn_name)
        for rid in ALL_IDS:
            total += 1
            # deep-copied inputs: several reference extractors mutate the record
            theirs_out = ref_fn(copy.deepcopy(load_fixture_record(rid)), copy.deepcopy(key), "resources")
            ours_out = ours(copy.deepcopy(load_fixture_record(rid)), copy.deepcopy(key), "resources")
            a, b = canon(ours_out), canon(theirs_out)
            if a != b:
                mismatches.append((label, rid, a, b))
    detail = "\n".join(
        f"{label}/{rid}:\n  ours:   {json.dumps(a, sort_keys=True, ensure_ascii=False)[:300]}\n"
        f"  theirs: {json.dumps(b, sort_keys=True, ensure_ascii=False)[:300]}"
        for label, rid, a, b in mismatches[:10]
    )
    # exact parity is the achieved state (round 1: 0/646 mismatches) —
    # assert zero so any regression fails loudly, not at the 0.95 P/R floor
    agreement = 1 - len(mismatches) / total
    assert not mismatches, (
        f"reference-oracle agreement {agreement:.3f} ({len(mismatches)}/{total} cells differ)\n{detail}"
    )


def test_reference_oracle_exactness_report(ref):
    """Not a gate — prints the per-extractor agreement table for the log."""
    import copy
    import importlib

    rows = []
    for label, ours, key, ref_mod_name, ref_fn_name in _cases():
        ref_fn = getattr(importlib.import_module(f"esmarc.{ref_mod_name}"), ref_fn_name)
        bad = 0
        for rid in ALL_IDS:
            theirs_out = ref_fn(copy.deepcopy(load_fixture_record(rid)), copy.deepcopy(key), "resources")
            ours_out = ours(copy.deepcopy(load_fixture_record(rid)), copy.deepcopy(key), "resources")
            if canon(ours_out) != canon(theirs_out):
                bad += 1
        rows.append((label, bad))
    print("\nper-extractor mismatching records (of 17):")
    for label, bad in rows:
        print(f"  {label:20s} {bad}")


# ---------------------------------------------------------------------------
# works-entity getmarc cells (round 2: the 9 cells reference esmarc.py:90-120
# maps with plain getmarc / getnumberofpages — added to spec.py works block)
# ---------------------------------------------------------------------------

WORKS_GETMARC_CELLS = {
    "Thesis": ["502..a", "502..b", "502..c", "502..d"],
    "issn": ["022..a", "022..y", "022..z", "029..a", "490..x", "730..x",
             "773..x", "776..x", "780..x", "785..x", "800..x", "810..x",
             "811..x", "830..x"],
    "isbn": ["020..a", "022..a", "022..z", "776..z", "780..z", "785..z"],
    "hasPart": "773..g",
    "isPartOf": ["773..t", "773..s", "773..a"],
    "pageStart": "773..q",
    "issueNumber": "773..l",
    "volumeNumer": "773..v",
    "alternativeHeadline": ["245..c"],
    "datePublished": ["130..f", "260..c", "264..c", "362..a"],
}


def test_reference_oracle_works_getmarc_cells(ref):
    """field_values vs the reference getmarc. A {getmarc: [keys]} cell calls
    getmarc ONCE with the whole list (processing.py:12-15); getmarc litters
    (dedups) across keys and uniq-dedups adjacents (marc.py:70-79). Compared
    under the canon() contract equivalence like the main gate."""
    import copy
    import importlib

    from esmarc_spark.marc.records import field_values

    getmarc = importlib.import_module("esmarc.marc").getmarc

    mismatches = []
    for prop, key in WORKS_GETMARC_CELLS.items():
        for rid in ALL_IDS:
            rec = load_fixture_record(rid)
            ours = canon(field_values(copy.deepcopy(rec), copy.deepcopy(key), "works"))
            theirs = canon(getmarc(copy.deepcopy(rec), copy.deepcopy(key), "works"))
            if ours != theirs:
                mismatches.append((prop, rid, ours, theirs))
    assert not mismatches, f"{len(mismatches)} cells differ: {mismatches[:5]}"


# every dispatchable entity: 079..b code -> entity name
# (ref lookup_tables/entities.py:1-9; None = the no-079 resources default)
ENTITY_CODES = [
    (None, "resources"),
    ("p", "persons"),
    ("n", "persons-n"),  # non-individualized names dispatch to persons too
    ("s", "topics"),
    ("b", "organizations"),
    ("g", "geo"),
    ("u", "works"),
    ("f", "events"),
]

# date-family cells run through the reference's dateparser (shimmed to a
# no-op here) / our deterministic parser — excluded, covered by goldens
DATE_PROPS = {
    "dateCreated", "dateOfEstablishment", "dateOfTermination",
    "startDate", "endDate", "datePublished", "dateOriginalPublished",
    "birthDate", "deathDate",
}


@pytest.mark.parametrize(
    "code,entity",
    [(c, e.split("-")[0]) for c, e in ENTITY_CODES],
    ids=[e for _, e in ENTITY_CODES],
)
def test_reference_oracle_record_e2e(ref, code, entity):
    """Full-record parity per entity type: inject the 079..b dispatch code
    into each fixture record and compare our map_record against the
    reference's actual process_line (processing.py:29-62) under the canon()
    contract, excluding only the date family. index="test" on both sides so
    the isBasedOn + sameAs-isBasedOn plumbing is compared too."""
    import copy

    from esmarc.processing import process_line
    from esmarc.esmarc import entities as ref_entities

    from esmarc_spark.mapping.engine import map_record

    mismatches = []
    for rid in ALL_IDS:
        rec = load_fixture_record(rid)
        if code is None:
            rec.pop("079", None)
        else:
            rec["079"] = [{"__": [{"b": code}]}]
        theirs = process_line(copy.deepcopy(rec), "test", ref_entities)
        ours = map_record(copy.deepcopy(rec), index="test")
        if theirs is None and ours is None:
            continue
        t_doc = theirs[entity]
        o_entity, o_doc = ours
        assert o_entity == entity
        keys = (set(t_doc) | set(o_doc)) - DATE_PROPS
        for k in sorted(keys):
            a, b = canon(o_doc.get(k)), canon(t_doc.get(k))
            if a != b:
                mismatches.append((rid, k, a, b))
    assert not mismatches, f"{len(mismatches)} property cells differ: {mismatches[:6]}"
