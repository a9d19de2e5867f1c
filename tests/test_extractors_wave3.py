"""Wave-3 coverage: offers, footnotes, usage, physical, editions,
identifiedBy, gender/genre/accessmode/pages — plus Hypothesis property
tests for the field-address mini-language."""

from hypothesis import given, settings
from hypothesis import strategies as st

from esmarc_spark.mapping.extractors import (
    build_access_mode,
    build_date_modified,
    build_gender,
    build_genre,
    build_page_count,
)
from esmarc_spark.mapping.nodes import (
    build_edition_sequence,
    build_edition_statement,
    build_footnotes,
    build_identified_by,
    build_offers,
    build_physical,
    build_repro_series,
    build_usage_info,
)
from esmarc_spark.marc.records import collapse, field_values, merge_value


def _rec(tag, ind, subfields, extra=None):
    rec = {"001": "X1", tag: [{ind: [{k: v} for k, v in subfields]}]}
    rec.update(extra or {})
    return rec


def test_offers_de14_only():
    rec = {
        "001": "PPN1",
        "924": [{"__": [{"b": "DE-14"}]}, {"__": [{"b": "DE-15"}]}],
    }
    [offer] = build_offers(rec, ["924..b", "001"], "resources")
    assert offer["offeredBy"]["branchCode"] == "DE-14"
    assert offer["availability"].endswith("/0-PPN1")
    rec2 = {"001": "PPN2", "924": [{"__": [{"b": "DE-15"}]}]}
    assert build_offers(rec2, ["924..b", "001"], "resources") is None


def test_footnotes_templates_and_937():
    rec = {
        "001": "X",
        "500": [{"__": [{"a": "a note"}]}],
        "937": [{"__": [{"a": "vl"}, {"d": "orch"}]}],
    }
    nodes = build_footnotes(rec, ["500", "937"], "resources")
    types = {n["@type"] for n in nodes}
    assert types == {"otherNote", "instrumentationNote"}
    inst = next(n for n in nodes if n["@type"] == "instrumentationNote")
    assert inst["description"] == "vl; orch"


def test_usage_info():
    rec = {
        "001": "X",
        "540": [{"__": [{"a": "CC-BY"}, {"u": "https://cc.org/by"}]}],
    }
    [node] = build_usage_info(rec, ["506.*", "540.__"], "resources")
    assert node["@type"] == "licenceState"
    assert node["name"] == "CC-BY"
    assert node["sameAs"] == "https://cc.org/by"


def test_physical():
    rec = {"001": "X", "300": [{"__": [{"a": "123 S."}, {"c": "24 cm"}]}]}
    node = build_physical(rec, None, "resources")
    assert node == {"extent": "123 S.", "dimensions": "24 cm"}


def test_editions():
    rec = {"001": "X", "250": [{"__": [{"a": "2nd ed."}, {"b": "rev."}]}]}
    assert build_edition_statement(rec, "250", "resources") == "2nd ed., rev."
    rec = {"001": "X", "362": [{"0_": [{"a": "Vol 1-"}]}]}
    assert build_edition_sequence(rec, "362", "resources") == "Vol 1-"
    rec = {"001": "X", "533": [{"__": [{"f": "Series X"}]}]}
    assert build_repro_series(rec, "533..f", "resources") == {"name": "Series X"}


def test_identified_by_schemes():
    rec = {
        "001": "X",
        "020": [{"__": [{"a": "978-3-16-148410-0"}, {"z": "bad-isbn"}]}],
        "022": [
            {"__": [{"a": "1234-5678"}]},
            {"2_": [{"a": "M-2306-7118-7"}]},
        ],
        "024": [{"3_": [{"a": "4006381333931"}]}, {"7_": [{"a": "VD16 X 123"}, {"2": "vd16"}]}],
        "035": [{"__": [{"a": "(OCoLC)12345"}]}],
        "030": [{"__": [{"a": "CODN"}]}],
    }
    nodes = build_identified_by(rec, None, "resources")
    by_type = {n["@type"]: n for n in nodes}
    assert by_type["ISBN"]["validValues"] == ["978-3-16-148410-0"]
    assert by_type["ISBN"]["invalidValues"] == ["bad-isbn"]
    # reference parity: ISSN collects ALL 022 indicators, so the ISMN value
    # appears here too (reference id.py:121 uses indicator '*')
    assert by_type["ISSN"]["validValues"] == ["1234-5678", "M-2306-7118-7"]
    assert by_type["ISMN"]["validValues"] == ["M-2306-7118-7"]
    assert by_type["EAN"]["validValues"] == ["4006381333931"]
    assert by_type["VD-16"]["validValues"] == ["VD16 X 123"]
    assert by_type["OCLC"]["validValues"] == ["12345"]
    assert by_type["CODEN"]["validValues"] == ["CODN"]


def test_scalar_extractors():
    assert build_gender(_rec("375", "__", [("a", "2")]), "375..a", "persons") == "Female"
    assert build_genre(_rec("655", "_7", [("a", "Oper")]), "655..a", "resources") == {
        "@type": "Text",
        "Text": "Oper",
    }
    assert build_access_mode({"001": "X", "007": "cr"}, "007", "resources") == "online"
    assert build_access_mode({"001": "X", "007": "tu"}, "007", "resources") == "local"
    assert build_page_count(_rec("300", "__", [("a", "123 S.")]), ["300..a"], "r") == 123
    assert (
        build_date_modified({"001": "X", "005": "20220427113326.0"}, "005", "r")
        == "2022-04-27T11:33:26Z"
    )


# ---------------------------------------------------------------------------
# property-based mini-language tests
# ---------------------------------------------------------------------------

subfield_values = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")), min_size=1, max_size=8
)


@st.composite
def marc_records(draw):
    tags = draw(st.lists(st.sampled_from(["100", "245", "650", "700"]), min_size=1, max_size=3, unique=True))
    rec = {"001": draw(subfield_values)}
    for tag in tags:
        occs = []
        for _ in range(draw(st.integers(1, 2))):
            codes = draw(st.lists(st.sampled_from("abc04"), min_size=1, max_size=3, unique=True))
            occs.append({"__": [{c: draw(subfield_values)} for c in codes]})
        rec[tag] = occs
    return rec


@given(marc_records())
@settings(max_examples=50, deadline=None)
def test_field_values_never_empty_containers(rec):
    """Contract: field_values returns scalar, non-empty list, or None —
    never [] / "" / nested single-element lists."""
    for tag in list(rec) + ["999"]:
        for sel in (tag, f"{tag}..a", f"{tag}..z"):
            if len(sel) == 3 and sel == "001":
                continue
            v = field_values(rec, sel)
            assert v != []
            if isinstance(v, list):
                assert len(v) > 1


@given(st.lists(subfield_values, min_size=0, max_size=6))
@settings(max_examples=100, deadline=None)
def test_merge_value_accumulates_all_unique(values):
    acc = None
    for v in values:
        acc = merge_value(acc, v)
    expected_unique = []
    for v in values:
        if v not in expected_unique:
            expected_unique.append(v)
    flat = [] if acc is None else (acc if isinstance(acc, list) else [acc])
    assert flat == expected_unique


@given(st.one_of(st.none(), subfield_values, st.lists(subfield_values, max_size=4)))
@settings(max_examples=100, deadline=None)
def test_collapse_idempotent(v):
    assert collapse(collapse(v)) == collapse(v)


def test_isil():
    from esmarc_spark.mapping.extractors import build_isil

    rec = {"001": "X", "003": ["DE-627"]}
    assert build_isil(rec, "003", "persons") == "DE-627"
    rec = {"001": "X", "003": ["XX-999"], "924": [{"__": [{"b": "DE-576"}]}]}
    assert build_isil(rec, ["003", "852..a", "924..b"], "resources") == "DE-576"
    assert build_isil({"001": "X"}, "003", "persons") is None
