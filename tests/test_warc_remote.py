"""Remote/object-store WARC ingest (round 5 — VERDICT r4 #1).

The remote code path — pyarrow FileSystem listing + per-member
``open_input_stream`` — is exercised through SubTreeFileSystem (a
picklable pyarrow FS that makes local disk look like a non-posix store:
no ``open()``, no ``file:`` handling, fs-relative paths), so the exact
code a live ``s3://`` bucket would hit runs in the sandbox. The ADVICE
r4 fault-isolation items (bounded readline, oversized-header resync,
EOF bad-version quarantine) are pinned here too.
"""

from __future__ import annotations

import gzip

import pytest

from esmarc_spark.pipeline.warc import (
    QUARANTINE_URL,
    _list_members,
    _open_member,
    _record_rows,
    read_warc,
    write_warc_fixture,
)

pafs = pytest.importorskip("pyarrow.fs")


RECORDS = [
    ("https://r.example/a", "2024-03-01T10:00:00Z", "<p>alpha page</p>"),
    ("https://r.example/b", "2024-03-01T11:00:00Z", b"latin1 caf\xe9".decode("latin-1").encode("latin-1")),
    ("https://r.example/c", "2024-03-02T09:30:00Z", "<div>body with WARC/1.0 inside</div>"),
]


@pytest.fixture()
def warc_dir(tmp_path):
    d = tmp_path / "crawl" / "2024-03"
    d.mkdir(parents=True)
    write_warc_fixture(str(d / "m0.warc.gz"), RECORDS[:2])
    write_warc_fixture(str(d / "m1.warc.gz"), RECORDS[2:])
    (d / "ignore.txt").write_text("not a warc")
    return tmp_path


def _collect(df):
    return sorted(
        (r["url"], r["warc_ts"].isoformat(), bytes(r["html"]))
        for r in df.collect()
    )


def test_remote_fs_matches_local(spark, warc_dir):
    """SubTreeFileSystem read == local read, byte for byte."""
    fs = pafs.SubTreeFileSystem(str(warc_dir), pafs.LocalFileSystem())
    remote = read_warc(spark, "crawl/2024-03/*.warc.gz", filesystem=fs)
    local = read_warc(spark, str(warc_dir / "crawl" / "2024-03" / "*.warc.gz"))
    assert _collect(remote) == _collect(local)
    assert len(_collect(remote)) == len(RECORDS)


def test_remote_plan_has_no_binaryfile_content(spark, warc_dir):
    """The remote mode must never scan file CONTENT through Spark's row
    format — the plan carries only path strings into mapInArrow."""
    fs = pafs.SubTreeFileSystem(str(warc_dir), pafs.LocalFileSystem())
    df = read_warc(spark, "crawl/2024-03/*.warc.gz", filesystem=fs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "binaryFile" not in plan
    assert "content" not in plan


def test_remote_quarantine_channel(spark, tmp_path):
    d = tmp_path / "q"
    d.mkdir()
    write_warc_fixture(str(d / "good.warc.gz"), RECORDS[:1])
    with gzip.open(d / "bad.warc.gz", "wb") as f:
        f.write(b"NOT-A-WARC\r\njunk\r\n")
    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    rows = read_warc(
        spark, "q/*.warc.gz", errors="quarantine", filesystem=fs
    ).collect()
    by_url = {r["url"]: r for r in rows}
    assert RECORDS[0][0] in by_url
    assert by_url[QUARANTINE_URL]["text"] == "bad version line"


def test_remote_directory_listing_recursive(spark, warc_dir):
    """A bare directory path lists members recursively (CC nests
    prefixes); non-glob mode takes every file, like binaryFile on a
    dir — the parser quarantines/skips non-WARC strays."""
    fs = pafs.SubTreeFileSystem(str(warc_dir), pafs.LocalFileSystem())
    df = read_warc(spark, "crawl", filesystem=fs)
    assert len(_collect(df)) == len(RECORDS)


def test_list_members_modes(warc_dir):
    fs = pafs.SubTreeFileSystem(str(warc_dir), pafs.LocalFileSystem())
    single = _list_members(fs, "crawl/2024-03/m0.warc.gz")
    assert single == ["crawl/2024-03/m0.warc.gz"]
    globbed = _list_members(fs, "crawl/*/m*.warc.gz")
    assert [p.rsplit("/", 1)[1] for p in globbed] == ["m0.warc.gz", "m1.warc.gz"]
    all_files = _list_members(fs, "crawl")
    assert any(p.endswith("ignore.txt") for p in all_files)


# --- parser fault isolation (ADVICE r4) -------------------------------------


def test_newline_free_garbage_is_bounded():
    """A mis-named binary with no newlines must not be buffered whole by
    one readline: the quarantine row is capped, the member is skipped."""
    rows = list(
        _record_rows(
            _open_member("m", b"\x00\x01" * (2 << 20)), "quarantine", False
        )
    )
    assert [r[3] for r in rows] == ["bad version line"]
    assert len(rows[0][2]) <= 4096


def test_oversized_header_resyncs_to_next_record():
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 29\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\nhello body\r\n\r\n"
    )
    member = b"WARC/1.0\r\n" + b"Z: q\r\n" * 300_000 + good
    rows = list(_record_rows(_open_member("m", member), "quarantine", False))
    assert [(r[0], r[3]) for r in rows] == [
        (QUARANTINE_URL, "oversized header block"),
        ("http://x/", None),
    ]


def test_eof_garbage_tail_is_quarantined_not_silent():
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 29\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\nhello body\r\n\r\n"
    )
    rows = list(
        _record_rows(
            _open_member("m", good + b"TRAILING GARBAGE"), "quarantine", False
        )
    )
    assert [(r[0], r[3]) for r in rows] == [
        ("http://x/", None),
        (QUARANTINE_URL, "bad version line"),
    ]


def test_hadoop_scheme_aliases_resolve():
    """s3a:// (what a Spark/Hadoop listing emits) must resolve through
    pyarrow's s3 connector; file:// passes through untouched."""
    from esmarc_spark.pipeline.warc import _pa_from_uri

    fs, rel = _pa_from_uri("file:///tmp/x.warc.gz")
    assert type(fs).__name__ == "LocalFileSystem" and rel == "/tmp/x.warc.gz"
    try:
        fs, rel = _pa_from_uri("s3a://bucket/key.warc.gz")
    except Exception as e:  # no credentials/region in the sandbox is fine;
        # an UNRECOGNIZED-SCHEME error is exactly the bug this guards
        assert "empty scheme" not in str(e).lower()
        assert "unrecognized" not in str(e).lower(), e
    else:
        assert type(fs).__name__ == "S3FileSystem"
        assert rel == "bucket/key.warc.gz"


def test_glob_hadoop_semantics(tmp_path):
    """ADVICE r5: the remote glob must mirror Hadoop globStatus — '*'
    and '?' stay inside one path segment, '{a,b}' alternation works —
    so a pattern selects the SAME file set local vs remote."""
    from esmarc_spark.pipeline.warc import _glob_regex, write_warc_fixture

    top = tmp_path / "crawl"
    nested = top / "seg"
    nested.mkdir(parents=True)
    write_warc_fixture(str(top / "m0.warc.gz"), RECORDS[:1])
    write_warc_fixture(str(top / "m1.warc.gz"), RECORDS[1:2])
    write_warc_fixture(str(nested / "deep.warc.gz"), RECORDS[2:])
    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())

    # '*' must NOT cross '/': only the top-level members match
    flat = _list_members(fs, "crawl/*.warc.gz")
    assert flat == ["crawl/m0.warc.gz", "crawl/m1.warc.gz"]
    # segment-crossing selection is explicit
    deep = _list_members(fs, "crawl/*/*.warc.gz")
    assert deep == ["crawl/seg/deep.warc.gz"]
    # '?' is one character within a segment
    assert _list_members(fs, "crawl/m?.warc.gz") == flat
    assert _list_members(fs, "crawl/m??.warc.gz") == []
    # '{a,b}' alternation (Hadoop supports it; fnmatch didn't)
    assert _list_members(fs, "crawl/{m0,m1}.warc.gz") == flat
    assert _list_members(fs, "crawl/{m0,nope}.warc.gz") == ["crawl/m0.warc.gz"]
    # character class
    assert _list_members(fs, "crawl/m[01].warc.gz") == flat
    assert _list_members(fs, "crawl/m[^01].warc.gz") == []
    # literal comma outside braces stays literal
    assert not _glob_regex("a,b").match("a")
    assert _glob_regex("a,b").match("a,b")
