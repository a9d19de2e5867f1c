"""Hypothesis fuzz for the WARC framing parser (parser-level, no Spark —
the Spark path is exercised by tests/test_warc.py; these properties gate
the byte-level framing itself, mirroring the mapping engine's fuzz gate).

Properties:
1. round-trip: for ANY list of (url, ts, body-bytes) records — bodies
   including CRLFCRLF, "WARC/1.0", NULs, invalid UTF-8 — the parser
   returns exactly the written records, byte for byte;
2. fault isolation: ANY single-point corruption (truncation, byte flip,
   garbage insertion) never raises, in either errors mode, and every
   record whose bytes were untouched before the corruption point is
   still parsed intact.
"""

from __future__ import annotations

import gzip
import io

from hypothesis import given, settings
from hypothesis import strategies as st

from esmarc_spark.pipeline.warc import _PushbackStream, _record_rows

_URL_CHARS = st.characters(
    min_codepoint=33, max_codepoint=126, blacklist_characters="\\"
)
_urls = st.text(_URL_CHARS, min_size=1, max_size=40).map(
    lambda s: "https://f.example/" + s
)
_bodies = st.one_of(
    st.binary(max_size=300),
    st.just(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake"),
    st.just(b"\r\n\r\n\r\n\r\n"),
    st.binary(max_size=40).map(lambda b: b + b"\r\n\r\n" + b),
)
_records = st.lists(st.tuples(_urls, _bodies), min_size=1, max_size=6)


def _member(records: list[tuple[str, bytes]]) -> bytes:
    blocks = []
    for url, body in records:
        http = b"HTTP/1.1 200 OK\r\n\r\n" + body
        blocks.append(
            (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: 2024-06-01T00:00:00Z\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            + http
            + b"\r\n\r\n"
        )
    return b"".join(blocks)


def _parse(data: bytes, errors: str = "skip"):
    return list(_record_rows(_PushbackStream(io.BytesIO(data)), errors, False))


@settings(max_examples=150, deadline=None)
@given(_records, st.booleans())
def test_roundtrip_byte_exact(records, compress):
    data = _member(records)
    if compress:
        data = gzip.compress(data)
        from esmarc_spark.pipeline.warc import _open_member

        rows = list(_record_rows(_open_member("m", data), "skip", False))
    else:
        rows = _parse(data)
    got = [(r[0], bytes(r[2])) for r in rows]
    # urls may repeat; order is preserved, so compare as sequences
    assert got == [(u, b) for u, b in records]


@settings(max_examples=200, deadline=None)
@given(
    _records,
    st.integers(min_value=0, max_value=10_000),
    st.sampled_from(["truncate", "flip", "insert"]),
    st.sampled_from(["skip", "quarantine"]),
)
def test_corruption_never_raises(records, pos, kind, errors):
    data = _member(records)
    pos = pos % (len(data) + 1)
    if kind == "truncate":
        corrupted = data[:pos]
    elif kind == "flip":
        if pos >= len(data):
            corrupted = data
        else:
            corrupted = data[:pos] + bytes([data[pos] ^ 0x5A]) + data[pos + 1 :]
    else:
        corrupted = data[:pos] + b"\x00GARBAGE\xff\r\n" + data[pos:]
    rows = _parse(corrupted, errors)  # must not raise
    # every record fully BEFORE the corruption point survives intact
    offset = 0
    for url, body in records:
        block = _member([(url, body)])
        if offset + len(block) <= pos:
            assert (url, body) in [
                (r[0], bytes(r[2])) for r in rows
            ], (kind, pos, url)
        offset += len(block)


@settings(max_examples=100, deadline=None)
@given(
    _records,
    st.integers(min_value=0, max_value=10_000),
    st.sampled_from(["truncate", "flip", "insert"]),
)
def test_quarantine_rows_are_bounded(records, pos, kind):
    """Round 5: whatever the corruption, every quarantine row's payload
    is capped (<= 4096 bytes) — the bounded-readline/bounded-header
    contract that keeps a garbage member from ballooning task memory."""
    data = _member(records)
    pos = pos % (len(data) + 1)
    if kind == "truncate":
        corrupted = data[:pos]
    elif kind == "flip":
        corrupted = (
            data
            if pos >= len(data)
            else data[:pos] + bytes([data[pos] ^ 0x5A]) + data[pos + 1 :]
        )
    else:
        corrupted = data[:pos] + b"\x00GARBAGE\xff\r\n" + data[pos:]
    for r in _parse(corrupted, "quarantine"):
        if r[0] == "__warc_error__":
            assert len(r[2]) <= 4096, (kind, pos, len(r[2]))
