"""URL canonicalization: rule-by-rule expression checks and the
latest-crawl-wins canonical dedup."""

import datetime as dt

from pyspark.sql import functions as F

from esmarc_spark.ops.urlnorm import canonical_url, dedup_by_canonical_url

CASES = [
    # (raw, canonical)
    ("https://Example.COM/Path", "https://example.com/Path"),     # host case only
    ("HTTPS://EXAMPLE.com:443/Path", "https://example.com/Path"), # default port
    ("http://a.example:80/x", "http://a.example/x"),
    ("http://a.example:8080/x", "http://a.example:8080/x"),       # real port kept
    ("https://a.example/x#frag", "https://a.example/x"),
    ("https://a.example/x/", "https://a.example/x"),              # trailing slash
    ("https://a.example/", "https://a.example"),                  # root path
    ("https://a.example", "https://a.example"),
    ("https://a.example/x?b=2&a=1", "https://a.example/x?a=1&b=2"),  # sorted
    ("https://a.example/x?utm_source=s&a=1&fbclid=f", "https://a.example/x?a=1"),
    ("https://a.example/x?utm_campaign", "https://a.example/x"),  # valueless tracker
    ("https://a.example/CasePath/B", "https://a.example/CasePath/B"),  # path case kept
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    for (raw, want), g in zip(CASES, got):
        assert g == want, (raw, g, want)


def test_canonical_url_is_pure_codegen(spark):
    df = spark.createDataFrame([("https://x.example/a",)], "url string")
    plan = (
        df.select(canonical_url(F.col("url")).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_dedup_by_canonical_url_latest_wins(spark):
    t0 = dt.datetime(2024, 6, 1)
    rows = [
        ("https://A.example/p/", t0, None, "old", "en"),
        ("https://a.example/p", t0 + dt.timedelta(days=1), None, "new", "en"),
        ("https://b.example/q?utm_source=x", t0, None, "only", "de"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = {r.url: r for r in dedup_by_canonical_url(df).collect()}
    assert set(out) == {"https://a.example/p", "https://b.example/q"}
    assert out["https://a.example/p"].text == "new"  # later crawl wins
    assert out["https://b.example/q"].text == "only"


def test_dedup_by_canonical_url_preserves_extra_columns(spark):
    """ADVICE r4: columns beyond the base webtext five (e.g.
    text_extracted provenance) must survive the dedup regardless of
    compose order."""
    t0 = dt.datetime(2024, 6, 1)
    df = spark.createDataFrame(
        [
            ("https://A.example/p/", t0, "old", True, 1),
            ("https://a.example/p", t0 + dt.timedelta(days=1), "new", False, 2),
        ],
        "url string, warc_ts timestamp, text string, "
        "text_extracted boolean, crawl_seq int",
    )
    out = dedup_by_canonical_url(df).collect()
    assert [r.asDict() for r in out] == [
        {
            "url": "https://a.example/p",
            "warc_ts": t0 + dt.timedelta(days=1),
            "text": "new",
            "text_extracted": False,
            "crawl_seq": 2,
        }
    ]


# ---------------------------------------------------------------------------
# RFC 3986 safe percent-encoding normalization (round 7)
# ---------------------------------------------------------------------------


def test_percent_normalization_rules(spark):
    import duckdb

    from pyspark.sql import functions as F

    from esmarc_spark.ops.urlnorm import (
        normalize_percent_encoding,
        percent_normalize_sql,
    )

    cases = [
        # (raw, expected)
        ("https://ex.com/%2fx%c3%a9", "https://ex.com/%2Fx%C3%A9"),  # upper only
        ("https://ex.com/%41b", "https://ex.com/Ab"),  # unreserved decoded
        ("https://ex.com/caf%7e", "https://ex.com/caf~"),
        ("https://ex.com/%5A%61q", "https://ex.com/Zaq"),
        ("https://ex.com/plain", "https://ex.com/plain"),
        ("https://ex.com/%G1%", "https://ex.com/%G1%"),  # malformed: as-is
        ("%41head", "Ahead"),  # url starting with a triplet
        ("https://ex.com/a?x=%2D", "https://ex.com/a?x=-"),
        ("https://ex.com/%2541", "https://ex.com/%2541"),  # %25 reserved
    ]
    df = spark.createDataFrame(cases, "url string, want string").withColumn(
        "norm", normalize_percent_encoding("url")
    )
    for r in df.collect():
        assert r["norm"] == r["want"], (r["url"], r["norm"], r["want"])
    # oracle runs the generated duckdb dialect over the same rows
    con = duckdb.connect()
    con.register("u", df.select("url").toPandas())
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {percent_normalize_sql('url', 'duckdb')} FROM u"
        ).fetchall()
    ]
    got = [r["norm"] for r in df.collect()]
    assert got == want
    # NULL propagates
    null_df = spark.createDataFrame([(None,)], "url string").withColumn(
        "norm", normalize_percent_encoding("url")
    )
    assert null_df.collect()[0]["norm"] is None


def test_canonical_dedup_with_percent_normalize(spark):
    """percent_normalize collapses /%41b vs /Ab variants into one
    canonical group (latest crawl wins); default OFF keeps them apart."""
    from pyspark.sql import functions as F

    from esmarc_spark.ops.urlnorm import dedup_by_canonical_url

    rows = [
        ("https://ex.com/%41b", "2024-01-01 10:00:00", "older"),
        ("https://ex.com/Ab", "2024-01-02 10:00:00", "newer"),
        ("https://ex.com/other", "2024-01-01 10:00:00", "solo"),
    ]
    wt = spark.createDataFrame(
        rows, "url string, warc_ts string, text string"
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    off = dedup_by_canonical_url(wt)
    assert off.count() == 3  # default: the variants stay distinct rows
    on = dedup_by_canonical_url(wt, percent_normalize=True)
    got = {r["url"]: r["text"] for r in on.collect()}
    assert got == {
        "https://ex.com/Ab": "newer",  # normalized key, max_by survivor
        "https://ex.com/other": "solo",
    }
    # prepare_docs knob reaches the same collapse
    from esmarc_spark.pipeline.run import prepare_docs

    web = wt.withColumn("html", F.lit(None).cast("binary")).withColumn(
        "lang", F.lit("en")
    )
    docs = prepare_docs(
        web, canonical_url_dedup=True, percent_normalize=True
    )
    assert docs.count() == 2
