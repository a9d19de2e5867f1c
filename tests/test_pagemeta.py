"""Round-7 pagemeta ops: meta-robots noindex gate and rel=canonical
declared-duplicate grouping."""

import duckdb


def _pages(spark):
    rows = [
        # (doc_id, url, html)
        (1, "https://a.example/p1",
         '<html><head><meta name="robots" content="noindex, follow">'
         "</head><body>x</body></html>"),
        (2, "https://a.example/p2",
         "<html><head><meta content='noindex' name=robots>"
         "</head><body>x</body></html>"),
        (3, "https://a.example/p3",
         '<html><head><META NAME=ROBOTS CONTENT="NOINDEX">'
         "</head><body>x</body></html>"),
        # robots mentioned in body text only -> kept
        (4, "https://a.example/p4",
         "<html><body>robots love noindex talk</body></html>"),
        # nofollow-only directive -> kept
        (5, "https://a.example/p5",
         '<html><head><meta name="robots" content="nofollow">'
         "</head><body>x</body></html>"),
        (6, "https://a.example/p6", None),
        # canonical declarations, both attribute orders + quote styles
        (7, "https://m.example/p7",
         '<html><head><link rel="canonical" href="https://c.example/one">'
         "</head><body>x</body></html>"),
        (8, "https://print.example/p8",
         "<html><head><link href='https://c.example/one' rel='canonical'>"
         "</head><body>x</body></html>"),
        (9, "https://bare.example/p9",
         "<html><head><link rel=canonical href=https://c.example/two>"
         "</head><body>x</body></html>"),
        # no declaration -> self-canonical
        (10, "https://solo.example/p10", "<html><body>x</body></html>"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, html string")


def test_noindex_gate(spark):
    from esmarc_spark.ops.pagemeta import filter_noindex

    kept = sorted(
        r.doc_id for r in filter_noindex(_pages(spark)).collect()
    )
    # 1-3 dropped (all orders/quote/case variants); body mention, nofollow,
    # NULL html, and canonical-only pages kept
    assert kept == [4, 5, 6, 7, 8, 9, 10]


def test_rel_canonical_extraction(spark):
    from pyspark.sql import functions as F

    from esmarc_spark.ops.pagemeta import rel_canonical

    got = {
        r.doc_id: r.c
        for r in _pages(spark)
        .select("doc_id", rel_canonical(F.col("html")).alias("c"))
        .collect()
    }
    assert got[7] == "https://c.example/one"
    assert got[8] == "https://c.example/one"
    assert got[9] == "https://c.example/two"
    assert got[10] is None and got[4] is None


def test_declared_canonical_groups(spark):
    from esmarc_spark.ops.pagemeta import declared_canonical_groups

    got = {
        r.canonical: (r.n_pages, r.representative)
        for r in declared_canonical_groups(_pages(spark).where("html IS NOT NULL")).collect()
    }
    # the mobile + print pages collapse onto the declared canonical
    assert got["https://c.example/one"] == (2, "https://m.example/p7")
    assert got["https://c.example/two"] == (1, "https://bare.example/p9")
    # undeclared pages self-canonicalize
    assert got["https://solo.example/p10"] == (1, "https://solo.example/p10")
    assert got["https://a.example/p1"] == (1, "https://a.example/p1")


def test_pagemeta_duckdb_parity(spark):
    from esmarc_spark.ops.pagemeta import (
        declared_canonical_groups,
        declared_canonical_groups_sql,
        filter_noindex,
        noindex_sql_predicate,
    )

    df = _pages(spark).where("html IS NOT NULL")
    rows = [(r.doc_id, r.url, r.html) for r in df.collect()]
    vals = ", ".join(
        "({}, '{}', '{}')".format(i, u, h.replace("'", "''"))
        for i, u, h in rows
    )
    src = f"SELECT * FROM (VALUES {vals}) AS t(doc_id, url, html)"

    got_keep = sorted(r.doc_id for r in filter_noindex(df).collect())
    want_keep = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM ({src}) WHERE NOT {noindex_sql_predicate()}"
        ).fetchall()
    )
    assert got_keep == want_keep

    got_groups = sorted(
        (r.canonical, r.n_pages, r.representative)
        for r in declared_canonical_groups(df).collect()
    )
    want_groups = sorted(
        tuple(r)
        for r in duckdb.sql(declared_canonical_groups_sql(src)).fetchall()
    )
    assert got_groups == want_groups


def test_dedup_by_declared_canonical(spark):
    from pyspark.sql import functions as F

    from esmarc_spark.ops.pagemeta import dedup_by_declared_canonical

    rows = [
        # original + print view declaring it; original is newer -> wins
        (1, "https://a.example/art", 1000,
         "<html><body>orig</body></html>"),
        (2, "https://a.example/art/print", 999,
         '<html><head><link rel="canonical" href="https://a.example/art">'
         "</head><body>print</body></html>"),
        # declared target NOT in the crawl: survivor keeps its OWN url
        (3, "https://m.example/amp", 500,
         '<html><head><link rel="canonical" href="https://never.example/x">'
         "</head><body>amp</body></html>"),
        # undeclared page: self-canonical, untouched
        (4, "https://solo.example/p", 100, "<html><body>s</body></html>"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, ts long, html string"
    ).withColumn("warc_ts", F.timestamp_seconds("ts")).drop("ts")
    out = {r.url: r.doc_id for r in dedup_by_declared_canonical(df).collect()}
    assert out == {
        "https://a.example/art": 1,       # print view collapsed away
        "https://m.example/amp": 3,       # own url kept, not the target
        "https://solo.example/p": 4,
    }


def test_prepare_docs_pagemeta_flags(spark):
    # composition through the shared curation front-end: drop_noindex
    # removes the marked page, rel_canonical_dedup collapses the print
    # view, defaults leave both untouched
    from pyspark.sql import functions as F

    from esmarc_spark.pipeline.run import prepare_docs

    rows = [
        ("https://k.example/a", 1000,
         "<html><body>alpha words here</body></html>", None),
        ("https://k.example/a/print", 999,
         '<html><head><link href=\'https://k.example/a\' rel=\'canonical\'>'
         "</head><body>alpha words here</body></html>", None),
        ("https://k.example/b", 1000,
         '<html><head><meta name="robots" content="noindex">'
         "</head><body>beta words here</body></html>", None),
        ("https://k.example/c", 1000,
         "<html><body>gamma words here</body></html>", None),
    ]
    wt = spark.createDataFrame(
        rows, "url string, ts long, h string, text string"
    ).select(
        "url",
        F.timestamp_seconds("ts").alias("warc_ts"),
        F.encode("h", "UTF-8").alias("html"),
        "text",
    )
    gated = sorted(
        r.url
        for r in prepare_docs(
            wt, drop_noindex=True, rel_canonical_dedup=True
        ).collect()
    )
    assert gated == ["https://k.example/a", "https://k.example/c"]
    plain = sorted(r.url for r in prepare_docs(wt).collect())
    assert len(plain) == 4


def test_title_h1_extraction_and_entities(spark):
    import duckdb

    from esmarc_spark.ops.pagemeta import extract_titles, extract_titles_sql

    rows = [
        ("u1", '<html><head><title> Caf&eacute;? No: Tom &amp; Jerry &lt;3 </title></head><h1 class="x">Head&#39;s up</h1>'),
        ("u2", "<TITLE>\n  multi\n  line  \n</TITLE>"),
        ("u3", "<html><body>no title</body>"),
        ("u4", "<title></title><h1>  </h1>"),  # empty -> NULL
        ("u5", "<title>&amp;lt; stays entity</title>"),
        ("u6", None),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["url"]: (r["title"], r["h1"]) for r in extract_titles(df).collect()}
    assert got["u1"] == ("Caf&eacute;? No: Tom & Jerry <3", "Head's up")
    assert got["u2"][0] == "multi\n  line"  # outer trim, inner kept
    assert got["u3"] == (None, None)
    assert got["u4"] == (None, None)
    assert got["u5"][0] == "&lt; stays entity"  # amp decoded LAST
    assert got["u6"] == (None, None)
    con = duckdb.connect()
    con.register("p", df.toPandas())
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            extract_titles_sql("SELECT * FROM p")
        ).fetchall()
    }
    assert got == want


def test_hreflang_links_extraction(spark):
    import duckdb

    from esmarc_spark.ops.pagemeta import hreflang_links, hreflang_links_sql

    rows = [
        ("u1", '<link rel="alternate" hreflang="de" href="https://ex.com/de">'
               "<link hreflang='FR' href='https://ex.com/fr' rel='alternate'>"
               '<link rel="alternate" hreflang="x-default" href="https://ex.com/">'
               '<link rel="stylesheet" href="/css">'      # not alternate
               '<link rel="alternate" type="application/rss+xml" href="/feed">'),  # no hreflang
        ("u2", "<html>no links</html>"),
        ("u3", None),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = sorted(tuple(r) for r in hreflang_links(df).collect())
    assert got == [
        ("u1", "de", "https://ex.com/de"),
        ("u1", "fr", "https://ex.com/fr"),
        ("u1", "x-default", "https://ex.com/"),
    ]
    con = duckdb.connect()
    con.register("p", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(hreflang_links_sql("SELECT * FROM p")).fetchall()
    )
    assert got == want
