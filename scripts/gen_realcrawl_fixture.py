"""Generate the vendored "realistic crawl" fixture (round 5):

* tests/golden/realcrawl.warc.gz — a WARC member exercising, in one
  file, everything the composed crawl_pipeline query turns on: HTTP
  chunked + gzip content encodings, non-200 statuses, Latin-1 (header
  charset) and CP1252 (meta charset) pages, canonical-url duplicate
  crawls, a German page, an under-length page, a junk-language page,
  malformed frames, and a non-response record;
* tests/golden/realcrawl_expected.ldj — the expected post-S0 parse
  (url, warc_ts, html as a DECODED string), computed from what this
  generator put INTO the member — never by the reader under test. The
  DuckDB oracle replays the downstream pipeline over it.

Deterministic: fixed timestamps, gzip mtime=0. Re-run to regenerate
both files together:  python scripts/gen_realcrawl_fixture.py
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path

GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden"

NAV = '<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/b">More</a></div>'
FOOT = '<div class="foot"><a href="/p">Privacy</a> <a href="/t">Terms</a> <a href="/i">Imprint</a></div>'


def page(body_html: str) -> str:
    return f"<html><head><title>T</title></head><body>{NAV}{body_html}{FOOT}</body></html>"


def http(body: bytes, status: str = "200 OK", headers: tuple = ()) -> bytes:
    head = "".join(f"{h}\r\n" for h in ("HTTP/1.1 " + status,) + headers)
    return head.encode("ascii") + b"\r\n" + body


def chunked(body: bytes, size: int = 40) -> bytes:
    out = b""
    for i in range(0, len(body), size):
        c = body[i : i + size]
        out += f"{len(c):x}\r\n".encode() + c + b"\r\n"
    return out + b"0\r\n\r\n"


def warc_record(url: str, ts: str, payload: bytes, wtype: str = "response") -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\nContent-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload + b"\r\n\r\n"


def main() -> None:
    blocks: list[bytes] = []
    expected: list[dict] = []  # what S0 (decode_http + keep 200 + charset decode) must yield

    def good(url: str, ts: str, html_bytes: bytes, decoded: str, headers=("Content-Type: text/html",), body=None):
        blocks.append(warc_record(url, ts, http(body if body is not None else html_bytes, headers=headers)))
        expected.append({"url": url, "warc_ts": ts, "html": decoded})

    # 1+2. canonical-duplicate crawls of the same article (host case +
    # tracking params); the later one must win the dedup
    art_v1 = page("<p>An early draft about the spark engine and the join planner with a table scan strategy.</p>")
    art_v2 = page("<p>The spark engine can join and sort a table or stream of rows and merge the hash window output.</p>")
    good("https://Example.COM/articles/1/", "2024-03-01T08:00:00Z", art_v1.encode(), art_v1)
    good("https://example.com/articles/1?utm_source=feed&utm_medium=rss", "2024-03-02T09:00:00Z", art_v2.encode(), art_v2)

    # 3. gzip content-encoded body
    gz_page = page("<p>The customer report is based on a table scan and a merge of the order stream data.</p>")
    good(
        "https://example.com/gzip", "2024-03-01T10:00:00Z", gz_page.encode(), gz_page,
        headers=("Content-Type: text/html", "Content-Encoding: gzip"),
        body=gzip.compress(gz_page.encode(), mtime=0),
    )

    # 4. chunked transfer-encoded body
    ch_page = page("<p>This is a long page about the window function and the sort order of the scan output rows.</p>")
    good(
        "https://example.com/chunked", "2024-03-01T11:00:00Z", ch_page.encode(), ch_page,
        headers=("Content-Type: text/html", "Transfer-Encoding: chunked"),
        body=chunked(ch_page.encode()),
    )

    # 5. Latin-1 page, charset from the HTTP header
    lat_page = page("<p>The caf\xe9 is near the table by the window and the friendly customer likes it.</p>")
    good(
        "https://example.com/latin1", "2024-03-01T12:00:00Z",
        lat_page.encode("latin-1"), lat_page,
        headers=("Content-Type: text/html; charset=ISO-8859-1",),
    )

    # 6. CP1252 page, charset from the meta tag only
    cp_page = '<html><head><meta charset="windows-1252"></head><body>' + NAV + \
        "<p>The price of the vector engine is \x8099 and the stream is fast \x99 they say.</p>" + FOOT + "</body></html>"
    cp_decoded = cp_page.replace("\x80", "€").replace("\x99", "™")
    good(
        "https://example.com/cp1252", "2024-03-01T13:00:00Z",
        cp_page.encode("latin-1"),  # bytes: \x80 -> 0x80 etc.
        cp_decoded,
    )

    # 7. German page (kept: 'de' is allowed)
    de_page = page("<p>Die Daten sind in der Tabelle und der spark Plan ist mit dem join und einem merge schnell.</p>")
    good("https://example.de/artikel/2", "2024-03-01T14:00:00Z", de_page.encode(), de_page)

    # 8. under-length page (main text < MIN_TOKENS=8 -> dropped by gate)
    short_page = page("<p>Too short spark join mention here.</p>")
    good("https://example.com/short", "2024-03-01T15:00:00Z", short_page.encode(), short_page)

    # 9. junk-language page (no stopword votes -> 'und' -> dropped)
    junk_page = page("<p>zzz qqq xxx vvv kkk jjj www mmm nnn ppp rrr sss</p>")
    good("https://example.com/junk", "2024-03-01T16:00:00Z", junk_page.encode(), junk_page)

    # 10. non-200 responses (dropped by keep_status)
    blocks.append(warc_record(
        "https://example.com/gone", "2024-03-01T17:00:00Z",
        http(b"<html>not found</html>", status="404 Not Found"),
    ))
    blocks.append(warc_record(
        "https://example.com/moved", "2024-03-01T17:30:00Z",
        http(b"", status="301 Moved Permanently",
             headers=("Location: https://example.com/articles/1",)),
    ))

    # 11. malformed frames (quarantined by the reader, excluded downstream)
    blocks.append(b"NOT-A-WARC-LINE garbage\r\n")
    blocks.append(
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://example.com/badlen\r\n"
        b"WARC-Date: 2024-03-01T18:00:00Z\r\nContent-Length: xyz\r\n\r\n"
    )

    # 12. a non-response record readers must skip
    blocks.append(warc_record(
        "https://example.com/articles/1", "2024-03-02T09:00:00Z",
        b"GET /articles/1 HTTP/1.1\r\n\r\n", wtype="request",
    ))

    GOLDEN.mkdir(parents=True, exist_ok=True)
    with gzip.GzipFile(GOLDEN / "realcrawl.warc.gz", "wb", mtime=0) as f:
        f.write(b"".join(blocks))
    with open(GOLDEN / "realcrawl_expected.ldj", "w", encoding="utf-8") as f:
        for row in expected:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    print(f"wrote {len(blocks)} blocks, {len(expected)} expected rows")


if __name__ == "__main__":
    main()
