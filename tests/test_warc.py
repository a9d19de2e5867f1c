"""WARC ingest connector: parse fidelity (pure-JVM expressions), gzip
member handling, skip of non-response records, and end-to-end into the
KG pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esmarc_spark.pipeline.warc import read_warc, write_warc_fixture

RECORDS = [
    (
        "https://example.org/a",
        "2024-05-01T10:00:00Z",
        "<html><body>Die Stadt Dresden liegt an der Elbe.</body></html>",
    ),
    (
        "https://example.org/b",
        "2024-05-01T11:30:00Z",
        "<html><body>Leipzig und Dresden sind in Sachsen.\r\n\r\nZweiter Absatz.</body></html>",
    ),
    ("https://example.org/empty", "2024-05-01T12:00:00Z", ""),
]


@pytest.mark.parametrize("suffix", ["warc", "warc.gz"])
def test_read_warc_parses_response_records(spark, tmp_path, suffix):
    p = str(tmp_path / f"fixture.{suffix}")
    write_warc_fixture(p, RECORDS)
    rows = {r.url: r for r in read_warc(spark, p).collect()}
    # the request record is skipped; all responses (even empty) survive
    assert set(rows) == {u for u, _, _ in RECORDS}
    a = rows["https://example.org/a"]
    assert a.warc_ts.isoformat().startswith("2024-05-01T10:00:00")
    assert bytes(a.html).decode() == RECORDS[0][2]
    assert a.text is None and a.lang is None
    # body-internal blank lines must NOT truncate the payload
    b = bytes(rows["https://example.org/b"].html).decode()
    assert "Zweiter Absatz" in b
    assert bytes(rows["https://example.org/empty"].html) == b""


def test_warc_parse_is_pure_jvm(spark, tmp_path):
    p = str(tmp_path / "fixture.warc")
    write_warc_fixture(p, RECORDS)
    plan = read_warc(spark, p)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_warc_to_pipeline_end_to_end(spark, tmp_path):
    # WARC -> webtext shape -> S1-S5: the full ingest path produces
    # mention triples from the html payloads
    from esmarc_spark.pipeline.run import run_pipeline
    from esmarc_spark.pipeline.webtext import gazetteer_df

    p = str(tmp_path / "cc.warc.gz")
    write_warc_fixture(p, RECORDS)
    webtext = read_warc(spark, p)
    triples = run_pipeline(webtext, gazetteer_df(spark)).collect()
    mentions = {
        (r.subj, r.obj)
        for r in triples
        if r.pred == "mentions"
    }
    assert any("example.org/a" in s for s, _ in mentions)
    assert any("4012995-0" in o for _, o in mentions)  # Dresden's gazetteer id
