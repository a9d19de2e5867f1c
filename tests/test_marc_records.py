"""Unit tests for the field-address mini-language (SURVEY.md §1.2) and the
merge/collapse value semantics (§1.5)."""

from esmarc_spark.marc.records import (
    collapse,
    entity_of,
    field_values,
    merge_value,
    occurrence_maps,
)

RECORD = {
    "001": "024629014",
    "003": ["DE-627"],
    "035": [
        {"__": [{"a": "(DE-627)024629014"}]},
        {"__": [{"a": "(DE-576)009960465"}]},
    ],
    "100": [
        {"1_": [{"a": "Immenkötter, Herbert"}, {"d": "1938-"}, {"0": "(DE-588)107891174"}, {"4": "aut"}]}
    ],
    "110": [{"2_": [{"a": "Acme Corp"}, {"b": "Research"}]}],
    "245": [{"10": [{"a": "Title A"}, {"b": "Sub B"}]}],
    "082": [
        {"0_": [{"a": "230"}]},
        {"04": [{"a": "231"}]},
    ],
    "650": [{"_0": [{"a": ["S1", "S2"]}]}],
}


def test_controlfield():
    assert field_values(RECORD, "001") == "024629014"
    assert field_values(RECORD, "003") == "DE-627"


def test_tag_subfield():
    assert field_values(RECORD, "245..a") == "Title A"
    assert field_values(RECORD, "035..a") == [
        "(DE-627)024629014",
        "(DE-576)009960465",
    ]


def test_multi_selector_merge():
    assert field_values(RECORD, ["245..a", "245..b"]) == ["Title A", "Sub B"]


def test_concat_selector():
    assert field_values(RECORD, "110..a+b") == "Acme Corp. Research"


def test_missing():
    assert field_values(RECORD, "999..z") is None


def test_occurrence_maps_indicator_patterns():
    assert list(occurrence_maps(RECORD, "082", "0_")) == [{"a": "230"}]
    assert list(occurrence_maps(RECORD, "082", "04")) == [{"a": "231"}]
    assert len(list(occurrence_maps(RECORD, "082", "0*"))) == 2
    assert len(list(occurrence_maps(RECORD, "082", "*"))) == 2
    assert list(occurrence_maps(RECORD, "082", "!0_")) == []  # reference parity
    smap = next(occurrence_maps(RECORD, "100", "*"))
    assert smap["a"] == "Immenkötter, Herbert"
    assert smap["4"] == "aut"


def test_list_valued_subfield():
    assert field_values(RECORD, "650..a") == ["S1", "S2"]


def test_entity_dispatch():
    assert entity_of(RECORD) == "resources"  # no 079..b
    assert entity_of({"079": [{"__": [{"b": "p"}]}]}) == "persons"
    assert entity_of({"079": [{"__": [{"b": "q"}]}]}) is None


def test_merge_value_semantics():
    assert merge_value(None, "x") == "x"
    assert merge_value("x", "x") == "x"
    assert merge_value("x", "y") == ["x", "y"]
    assert merge_value(["x"], "y") == ["x", "y"]
    assert merge_value(["x", "y"], ["y", "z"]) == ["x", "y", "z"]
    assert merge_value([], "x") == "x"


def test_collapse_semantics():
    assert collapse([]) is None
    assert collapse(["x"]) == "x"
    assert collapse(["x", "y"]) == ["x", "y"]
    assert collapse("x") == "x"
