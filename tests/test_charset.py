"""Charset-aware S1 decode (round 5 — VERDICT r4 #6): Latin-1/CP1252
pages decode to correct text while ``html`` keeps the exact crawled
bytes; the UTF-8 replacement decode stays the byte-identical default.
"""

import re

import pytest
from pyspark.sql import functions as F

from esmarc_spark.pipeline.extract_text import with_extracted_text
from esmarc_spark.pipeline.warc import read_warc, write_warc_fixture

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _py_reference_text(decoded: str) -> str:
    """The S1 strip, as plain Python over an already-decoded string."""
    s = re.sub(r"(?is)<(script|style|head)\b.*?</\1>", " ", decoded)
    s = re.sub(r"(?s)<[^>]*>", " ", s)
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
                    ("&nbsp;", " ")]:
        s = s.replace(ent, ch)
    return re.sub(r"\s+", " ", s).strip()


def _extract(spark, html_bytes, charset=None, charset_aware=True):
    rows = [("u", None, html_bytes, None, None)]
    schema = SCHEMA
    if charset is not None:
        rows = [rows[0] + (charset,)]
        schema += ", charset string"
    df = spark.createDataFrame(rows, schema)
    return with_extracted_text(df, charset_aware=charset_aware).collect()[0]


def test_latin1_meta_sniff_golden(spark):
    """VERDICT done-criterion: a Latin-1 page whose text matches
    Python's bytes.decode('latin-1')."""
    page = '<html><meta charset="ISO-8859-1"><p>café déjà vu: être naïve ±½°</p></html>'
    raw = page.encode("latin-1", errors="strict")
    assert raw != page.encode("utf-8")  # genuinely non-UTF-8 bytes
    row = _extract(spark, raw)
    assert row.text == _py_reference_text(raw.decode("latin-1"))
    assert "café" in row.text
    assert bytes(row.html) == raw  # html keeps the crawled bytes


def test_cp1252_defined_bytes_match_python(spark):
    page = '<meta charset="windows-1252"><p>price — €99 “smart” dash–trademark™</p>'
    raw = page.encode("cp1252")
    row = _extract(spark, raw)
    assert row.text == _py_reference_text(raw.decode("cp1252"))
    assert "€99" in row.text and "™" in row.text


def test_cp1252_undefined_bytes_are_whatwg_controls(spark):
    """0x81 has no CP1252 mapping; WHATWG (and Java) map it to U+0081 —
    the decode is total, never an ANSI abort."""
    raw = b'<meta charset="windows-1252"><p>x\x81y euro\x80z</p>'
    row = _extract(spark, raw)
    assert "" in row.text and "€" in row.text


def test_header_charset_beats_meta(spark):
    raw = '<meta charset="utf-8"><p>café</p>'.encode("latin-1")
    row = _extract(spark, raw, charset="iso-8859-1")
    assert "café" in row.text


def test_unknown_charset_falls_back_to_utf8_replace(spark):
    raw = "<p>日本語テスト page</p>".encode("shift_jis")
    row = _extract(spark, raw, charset="shift_jis")
    assert row.text == _py_reference_text(
        raw.decode("utf-8", errors="replace")
    )


def test_default_path_unchanged_without_flag(spark):
    raw = "<p>café</p>".encode("latin-1")
    row = _extract(spark, raw, charset_aware=False)
    assert row.text == _py_reference_text(raw.decode("utf-8", errors="replace"))
    assert "�" in row.text  # mangled, as the byte-identical default must


def test_charset_aware_is_pure_codegen(spark):
    df = spark.createDataFrame([("u", None, b"<p>x</p>", None, None)], SCHEMA)
    plan = (
        with_extracted_text(df, charset_aware=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_read_warc_with_charset_column(spark, tmp_path):
    p = str(tmp_path / "c.warc.gz")
    write_warc_fixture(
        p,
        [
            ("http://a/", "2024-01-01T00:00:00Z",
             "<p>caf\xe9</p>".encode("latin-1"), "1.0",
             "text/html; charset=ISO-8859-1"),
            ("http://b/", "2024-01-01T00:00:00Z", "<p>plain</p>"),
        ],
    )
    df = read_warc(spark, p, with_charset=True)
    assert df.columns[-1] == "charset"
    got = {r.url: r.charset for r in df.collect()}
    assert got == {"http://a/": "iso-8859-1", "http://b/": None}
    # end-to-end: reader charset feeds the decode
    out = {r.url: r.text for r in with_extracted_text(df, charset_aware=True).collect()}
    assert out["http://a/"] == "café"
