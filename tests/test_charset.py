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


def test_legacy_charsets_via_python_split(spark):
    """Shift-JIS/GBK/etc. rows decode through the Arrow split-union path
    (only they cross into Python); others keep the pure-JVM pipeline and
    are byte-identical to running without the step."""
    from esmarc_spark.pipeline.extract_text import extract_legacy_text

    sjis_page = "<p>日本語のページです spark</p>"
    gbk_page = "<p>中文页面内容 table</p>"
    utf8_page = "<p>plain utf-8 page</p>"
    rows = [
        ("sjis", None, sjis_page.encode("shift_jis"), None, None, "shift_jis"),
        ("gbk", None, gbk_page.encode("gbk"), None, None, "gbk"),
        ("utf8", None, utf8_page.encode(), None, None, None),
        ("preset", None, b"<p>x</p>", "kept text", None, "shift_jis"),
    ]
    df = spark.createDataFrame(rows, SCHEMA + ", charset string")
    out = {r.url: r for r in extract_legacy_text(df).collect()}
    assert out["sjis"].text == _py_reference_text(sjis_page)
    assert out["gbk"].text == _py_reference_text(gbk_page)
    assert out["utf8"].text is None  # untouched — S1 fills it later
    assert out["preset"].text == "kept text"  # existing text wins
    # composition: the normal S1 pass fills the remaining rows
    final = {
        r.url: r.text
        for r in with_extracted_text(extract_legacy_text(df), charset_aware=True).collect()
    }
    assert final["utf8"] == "plain utf-8 page"
    assert final["sjis"] == _py_reference_text(sjis_page)


def test_legacy_split_meta_sniff_without_charset_column(spark):
    from esmarc_spark.pipeline.extract_text import extract_legacy_text

    page = '<meta charset="shift_jis"><p>テスト ページ</p>'
    df = spark.createDataFrame(
        [("u", None, page.encode("shift_jis"), None, None)], SCHEMA
    )
    out = extract_legacy_text(df).collect()[0]
    assert out.text == _py_reference_text(page)


def test_legacy_split_python_only_on_matching_rows(spark):
    """The non-legacy branch's plan has no Python/Arrow eval node."""
    from esmarc_spark.pipeline.extract_text import extract_legacy_text

    df = spark.createDataFrame(
        [("u", None, b"<p>x</p>", None, None, None)], SCHEMA + ", charset string"
    )
    out = extract_legacy_text(df)
    # whole plan contains the Arrow node once (legacy branch)...
    whole = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in whole or "BatchEvalPython" in whole
    # ...but rows flow to it only under the charset filter: the union's
    # first (non-legacy) child is a pure filter+scan
    import re
    assert re.search(r"Filter .*NOT", whole) or "false" in whole.lower()


def test_legacy_main_content_matches_jvm_semantics(spark):
    """ADVICE r5: with main_content=True the legacy (Python-decoded)
    rows must get the SAME boilerplate removal as JVM-decoded rows —
    the decode is the only thing Python does; the extraction stage is
    the shared Catalyst expression."""
    from esmarc_spark.pipeline.extract_text import extract_legacy_text

    body = (
        "<nav><a href='/x'>home</a> <a href='/y'>about</a></nav>"
        "<p>日本語の本文ページです。ここに長い本文テキストが続きます。"
        "spark engine content body text paragraph</p>"
        "<footer><a href='/z'>impressum</a></footer>"
    )
    rows = [
        ("sjis", None, body.encode("shift_jis"), None, None, "shift_jis"),
        ("utf8", None, body.encode(), None, None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA + ", charset string")
    out = {
        r.url: r.text
        for r in with_extracted_text(
            extract_legacy_text(df, main_content=True),
            main_content=True,
            charset_aware=True,
        ).collect()
    }
    # identical page content -> identical extraction on both routes
    assert out["sjis"] == out["utf8"]
    assert "home" not in out["sjis"] and "impressum" not in out["sjis"]
    assert "本文" in out["sjis"]
