"""S0 ingest connector: WARC (Web ARChive, ISO 28500) -> the webtext
table shape (url, warc_ts, html, text, lang).

Common-Crawl publishes its corpus as .warc.gz files; the pipeline's
input_hint assumes the pages already sit in a table, and this connector
is the standard way they get there.

Spark-first design — the whole parse is JVM expressions, no Python:

* record splitting via the text reader's ``lineSep`` option set to the
  WARC version line: each DataFrame row is then one WARC record's
  header+payload block;
* header fields (WARC-Type, WARC-Target-URI, WARC-Date) by
  regexp_extract; the payload by a two-stage split on the blank line
  (WARC headers | HTTP headers | body);
* only ``response`` records with a target URI survive.

Scale notes: a gzip member is not splittable, so one .warc.gz = one
input partition — exactly how Common Crawl is laid out (tens of
thousands of ~1 GB files per crawl; parallelism comes from the file
count, as it does for every WARC consumer). The parse itself pipelines
into S1 with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_LINE = "WARC/1.0"
# WARC headers end at the first blank line; the HTTP response block ends
# at the next one. split with a limit keeps the body intact even if it
# contains blank lines itself.
_BLANK = "\r\n\r\n"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) into (url, warc_ts, html, text, lang).

    ``html`` carries the raw response body bytes (binary, like the
    webtext table); ``text``/``lang`` are null — S1 extraction and
    language-ID fill them downstream.
    """
    raw = spark.read.option("lineSep", _VERSION_LINE).text(path)
    rec = F.col("value")
    warc_headers = F.split(rec, F.lit(_BLANK), 2)[0]

    def header(name: str) -> F.Column:
        return F.regexp_extract(warc_headers, rf"(?m)^{name}:\s*(\S+)", 1)

    # payload = everything after the WARC header block; for response
    # records that is the HTTP message, whose body starts after ITS
    # header block
    payload = F.split(rec, F.lit(_BLANK), 2)[1]
    body = F.split(payload, F.lit(_BLANK), 2)[1]

    return (
        raw.where(header("WARC-Type") == "response")
        .where(header("WARC-Target-URI") != "")
        .select(
            header("WARC-Target-URI").alias("url"),
            F.to_timestamp(header("WARC-Date")).alias("warc_ts"),
            # trailing CRLF pair is the record separator, not body bytes
            # (rtrim would only strip spaces)
            F.encode(
                F.coalesce(
                    F.regexp_replace(body, r"(\r\n)+$", ""), F.lit("")
                ),
                "UTF-8",
            ).alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


def write_warc_fixture(path: str, records: list[tuple[str, str, str]]) -> None:
    """Deterministic WARC writer for tests/fixtures: (url, iso_ts, html)
    response records plus one non-response record that readers must
    skip. Writes valid ISO 28500 framing (version line, headers, blank
    line, payload, record separator)."""
    import gzip

    blocks = []
    for url, ts, html in records:
        http = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )
        blocks.append(
            f"{_VERSION_LINE}\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http.encode())}\r\n"
            f"\r\n{http}\r\n\r\n"
        )
    blocks.append(
        f"{_VERSION_LINE}\r\n"
        "WARC-Type: request\r\n"
        "WARC-Target-URI: https://example.org/skipme\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "\r\nGET / HTTP/1.1\r\n\r\n"
    )
    data = "".join(blocks).encode()
    if path.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
