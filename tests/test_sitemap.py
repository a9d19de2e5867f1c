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


def test_schedule_frontier_waves_and_ranks(spark):
    from pyspark.sql import functions as F

    from esmarc_spark.ops.sitemap import schedule_frontier, schedule_frontier_sql

    cands = spark.createDataFrame(
        [
            # host a: priority order 900 > 500 > NULL; NULL-priority ties
            # broken by lastmod desc then url
            ("a.com", "https://a.com/p1", None, None, 500),
            ("a.com", "https://a.com/p2", None, None, 900),
            ("a.com", "https://a.com/p3", "2024-02-02", None, None),
            ("a.com", "https://a.com/p4", "2024-01-01", None, None),
            ("b.com", "https://b.com/x", None, None, None),
        ],
        "host string, url string, lastmod string, changefreq string,"
        " priority_permille long",
    ).select(
        "host", "url", F.col("lastmod").cast("date").alias("lastmod"),
        "changefreq", "priority_permille",
    )
    ranks = spark.createDataFrame(
        [("a.com", 7_000_000_000)], "host string, rank_scaled long"
    )
    got = {
        r["url"]: (r["wave"], r["rank_scaled"])
        for r in schedule_frontier(cands, ranks).collect()
    }
    assert got == {
        "https://a.com/p2": (1, 7_000_000_000),
        "https://a.com/p1": (2, 7_000_000_000),
        "https://a.com/p3": (3, 7_000_000_000),
        "https://a.com/p4": (4, 7_000_000_000),
        "https://b.com/x": (1, None),  # unranked host: NULL rank, own wave
    }
    # oracle parity, partition invariance
    got_rows = sorted(
        tuple(map(str, r)) for r in schedule_frontier(cands, ranks).collect()
    )
    got13 = sorted(
        tuple(map(str, r))
        for r in schedule_frontier(cands.repartition(13), ranks).collect()
    )
    assert got_rows == got13
    con = duckdb.connect()
    # toArrow(): toPandas() would coerce the nullable int column to
    # float64 and the oracle would print '500.0'
    con.register("c", cands.toArrow())
    con.register("rk", ranks.toArrow())
    want = sorted(
        tuple(map(str, r))
        for r in con.execute(
            schedule_frontier_sql("SELECT * FROM c", "SELECT * FROM rk")
        ).fetchall()
    )
    assert got_rows == want


def test_parse_sitemap_index(spark):
    from esmarc_spark.ops.sitemap import parse_sitemap_index, parse_sitemap_index_sql

    idx = spark.createDataFrame(
        [(
            "ex.com",
            """<sitemapindex>
             <sitemap><loc>https://ex.com/sm1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
             <sitemap><loc>https://ex.com/sm2.xml.gz</loc></sitemap>
             <sitemap><lastmod>2024-01-01</lastmod></sitemap>
            </sitemapindex>""",
        )],
        "host string, sitemap_xml string",
    )
    got = sorted(tuple(map(str, r)) for r in parse_sitemap_index(idx).collect())
    assert got == [
        ("ex.com", "https://ex.com/sm1.xml", "2024-02-01"),
        ("ex.com", "https://ex.com/sm2.xml.gz", "None"),
    ]
    con = duckdb.connect()
    con.register("i", idx.toPandas())
    want = sorted(
        tuple(map(str, r))
        for r in con.execute(
            parse_sitemap_index_sql("SELECT * FROM i")
        ).fetchall()
    )
    assert got == want


def test_polite_frontier_earliest_fetch(spark):
    from pyspark.sql import functions as F

    from esmarc_spark.ops.sitemap import (
        schedule_polite_frontier,
        schedule_polite_frontier_sql,
    )

    cands = spark.createDataFrame(
        [
            ("a.com", "https://a.com/p1", None, None, 900),
            ("a.com", "https://a.com/p2", None, None, 500),
            ("a.com", "https://a.com/p3", None, None, None),
            ("b.com", "https://b.com/x", None, None, None),
            ("b.com", "https://b.com/y", None, None, None),
        ],
        "host string, url string, lastmod string, changefreq string,"
        " priority_permille long",
    ).select(
        "host", "url", F.col("lastmod").cast("date").alias("lastmod"),
        "changefreq", "priority_permille",
    )
    delays = spark.createDataFrame(
        [("a.com", 10)], "host string, crawl_delay_sec long"
    )
    got = {
        r["url"]: (r["wave"], r["crawl_delay_sec"], r["earliest_fetch_sec"])
        for r in schedule_polite_frontier(cands, delays, default_delay_sec=2).collect()
    }
    assert got == {
        "https://a.com/p1": (1, 10, 0),
        "https://a.com/p2": (2, 10, 10),
        "https://a.com/p3": (3, 10, 20),
        "https://b.com/x": (1, 2, 0),   # undeclared host: default delay
        "https://b.com/y": (2, 2, 2),
    }
    con = duckdb.connect()
    con.register("c", cands.toArrow())
    con.register("dl", delays.toArrow())
    want = sorted(
        tuple(map(str, r))
        for r in con.execute(
            schedule_polite_frontier_sql(
                "SELECT * FROM c", "SELECT * FROM dl", 2
            )
        ).fetchall()
    )
    got_rows = sorted(
        tuple(map(str, r))
        for r in schedule_polite_frontier(cands, delays, default_delay_sec=2).collect()
    )
    assert got_rows == want
