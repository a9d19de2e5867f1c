"""sitemaps.org parsing + fetch-list derivation (round 7): required-core
field extraction, exact permille priority, lastmod-vs-last-crawl
freshness join, cross-engine parity."""

import duckdb

XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <url>
  <loc>https://ex.com/a</loc>
  <lastmod>2024-03-05</lastmod>
  <changefreq>daily</changefreq>
  <priority>0.8</priority>
 </url>
 <url><loc>https://ex.com/b</loc><lastmod>2024-01-02T10:00:00+00:00</lastmod></url>
 <url><loc>https://ex.com/c</loc></url>
 <url><lastmod>2024-01-01</lastmod></url>
 <url><loc>https://ex.com/d</loc><priority>1.0</priority></url>
</urlset>"""


def _fixtures(spark):
    from pyspark.sql import functions as F

    sm = spark.createDataFrame(
        [("ex.com", XML)], "host string, sitemap_xml string"
    )
    crawled = spark.createDataFrame(
        [
            ("https://ex.com/a", "2024-03-01 10:00:00"),  # stale vs 03-05
            ("https://ex.com/a", "2024-02-01 10:00:00"),  # older recrawl
            ("https://ex.com/b", "2024-02-01 10:00:00"),  # fresher than lastmod
            ("https://ex.com/c", "2024-02-01 10:00:00"),  # no lastmod: keep
        ],
        "url string, warc_ts string",
    ).select("url", F.col("warc_ts").cast("timestamp").alias("warc_ts"))
    return sm, crawled


def test_parse_required_core(spark):
    from esmarc_spark.ops.sitemap import parse_sitemaps

    sm, _ = _fixtures(spark)
    rows = {r["url"]: r for r in parse_sitemaps(sm).collect()}
    # loc-less element dropped
    assert set(rows) == {f"https://ex.com/{c}" for c in "abcd"}
    a = rows["https://ex.com/a"]
    assert str(a["lastmod"]) == "2024-03-05"
    assert a["changefreq"] == "daily" and a["priority_permille"] == 800
    # datetime lastmod: date part consumed
    assert str(rows["https://ex.com/b"]["lastmod"]) == "2024-01-02"
    assert rows["https://ex.com/c"]["lastmod"] is None
    assert rows["https://ex.com/d"]["priority_permille"] == 1000


def test_fetch_candidates_freshness(spark):
    from esmarc_spark.ops.sitemap import fetch_candidates, parse_sitemaps

    sm, crawled = _fixtures(spark)
    got = {
        r["url"]: r["reason"]
        for r in fetch_candidates(parse_sitemaps(sm), crawled).collect()
    }
    # a: lastmod 03-05 > latest crawl 03-01 -> modified; b: crawl newer
    # than lastmod -> skip; c: crawled, no lastmod -> conservative skip;
    # d: never crawled -> new
    assert got == {"https://ex.com/a": "modified", "https://ex.com/d": "new"}


def test_duckdb_parity(spark):
    from esmarc_spark.ops.sitemap import (
        fetch_candidates,
        fetch_candidates_sql,
        parse_sitemaps,
        parse_sitemaps_sql,
    )

    sm, crawled = _fixtures(spark)
    entries = parse_sitemaps(sm)
    got_e = sorted(tuple(map(str, r)) for r in entries.collect())
    got_f = sorted(
        tuple(map(str, r)) for r in fetch_candidates(entries, crawled).collect()
    )
    con = duckdb.connect()
    con.register("sm", sm.toPandas())
    con.register("cr", crawled.toPandas())
    esql = parse_sitemaps_sql("SELECT host, sitemap_xml FROM sm")
    want_e = sorted(tuple(map(str, r)) for r in con.execute(esql).fetchall())
    want_f = sorted(
        tuple(map(str, r))
        for r in con.execute(
            fetch_candidates_sql(esql, "SELECT url, warc_ts FROM cr")
        ).fetchall()
    )
    assert got_e == want_e
    assert got_f == want_f
