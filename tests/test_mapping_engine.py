"""map_record / triple-flattening engine tests, incl. the Spark
mapInPandas path over all 17 reference fixture records."""

import json
from pathlib import Path

from esmarc_spark.mapping.engine import (
    map_record,
    mapped_docs_batches,
    record_to_triples,
    scrub,
    DOCS_SCHEMA,
    TRIPLES_SCHEMA,
)
from tests.conftest import REFERENCE_TESTS, load_fixture_record

ALL_IDS = sorted(p.name for p in (REFERENCE_TESTS / "in").iterdir())


def test_scrub():
    assert scrub({"a": None, "b": [], "c": {"d": None}, "e": "x"}) == {"e": "x"}
    assert scrub({"a": ["x", None, ""]}) == {"a": ["x"]}


def test_map_record_resources():
    record = load_fixture_record("1131213920")
    entity, doc = map_record(record)
    assert entity == "resources"
    assert doc["@id"] == "https://data.slub-dresden.de/resources/1131213920"
    assert doc["@type"] == "http://schema.org/CreativeWork"
    assert isinstance(doc["mentions"], list)
    assert doc["isBasedOn"] == "https://data.slub-dresden.de/source/source/1131213920"
    # multi-card property is always a list
    assert isinstance(doc["sameAs"], list)
    # none/empty scrubbed
    assert all(v not in (None, [], {}, "") for v in doc.values())


def test_same_as_provenance_backfill():
    record = load_fixture_record("1131213920")
    _, doc = map_record(record, index="slub-lod")
    for node in doc["sameAs"]:
        assert node["isBasedOn"]["@id"] == doc["isBasedOn"]
        if node.get("publisher", {}).get("abbr") == "BSZ":
            assert node["@id"].startswith("https://swb.bsz-bw.de/")


def test_record_to_triples():
    record = load_fixture_record("1131213920")
    triples = list(record_to_triples(record))
    assert triples
    subj = "https://data.slub-dresden.de/resources/1131213920"
    assert all(t[1] == subj for t in triples)
    preds = {t[2] for t in triples}
    assert {"@type", "mentions", "sameAs"} <= preds


def test_all_fixture_records_map():
    mapped = [map_record(load_fixture_record(rid)) for rid in ALL_IDS]
    assert all(m is not None for m in mapped)
    entities = {e for e, _ in mapped}
    assert "resources" in entities


def test_spark_map_in_pandas(spark):
    rows = [(rid, json.dumps(load_fixture_record(rid))) for rid in ALL_IDS]
    df = spark.createDataFrame(rows, "record_id string, marc_json string")
    docs = df.mapInPandas(mapped_docs_batches, schema=DOCS_SCHEMA)
    out = {r["record_id"]: json.loads(r["doc"]) for r in docs.collect()}
    assert len(out) == len(ALL_IDS)
    # spark result identical to local result
    for rid in ALL_IDS:
        _, local_doc = map_record(load_fixture_record(rid))
        assert out[rid] == json.loads(json.dumps(local_doc, sort_keys=True))
