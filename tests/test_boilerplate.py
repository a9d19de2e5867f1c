"""Boilerplate removal: block splitting, link-density filtering, and
cross-engine parity of the identical RE2-safe regexes."""

import duckdb
from pyspark.sql import functions as F

from esmarc_spark.ops.boilerplate import extract_main_text, main_text_sql

PAGES = [
    # nav + two content paragraphs + footer -> only the paragraphs
    (
        "<html><head><title>T</title></head><body>"
        "<div class='nav'><a href='/'>Home</a> <a href='/x'>About</a></div>"
        "<p>This is the actual article content with plenty of words to pass the filter.</p>"
        "<p>Second paragraph of real content, also long enough to be kept here.</p>"
        "<div class='footer'><a href='/p'>Privacy</a> <a href='/t'>Terms</a></div>"
        "</body></html>",
        "This is the actual article content with plenty of words to pass the filter.\n"
        "Second paragraph of real content, also long enough to be kept here.",
    ),
    # link list dropped, article kept
    (
        "<body><ul><li><a href='/1'>link one</a></li><li><a href='/2'>link two</a></li></ul>"
        "<article>Main article body that definitely has enough characters to survive.</article></body>",
        "Main article body that definitely has enough characters to survive.",
    ),
    # a block that is mostly prose with ONE inline link is kept
    (
        "<div>A block with a single inline <a href='x'>link</a> inside mostly prose text kept.</div>",
        "A block with a single inline link inside mostly prose text kept.",
    ),
    # short blocks and script/style subtrees vanish
    ("<p>short</p><script>var x = 'long enough but it is code';</script>", ""),
    ("", ""),
    # entities decode inside kept blocks
    (
        "<p>Entities &amp; markers &lt;kept&gt; in a sufficiently long paragraph here.</p>",
        'Entities & markers <kept> in a sufficiently long paragraph here.',
    ),
    # literal non-ASCII whitespace (NBSP, em space, NEL) collapses the
    # same way in BOTH engines — the r5 [\\s\\p{Z}\\x0b\\x85] class; Java's
    # (?U)\\s vs RE2's ASCII \\s used to diverge here
    (
        "<p>Unicode\u00a0whitespace\u2003separated\u0085words in a long enough paragraph kept.</p>",
        "Unicode whitespace separated words in a long enough paragraph kept.",
    ),
]


def test_extract_main_text(spark):
    df = spark.createDataFrame([(h,) for h, _ in PAGES], "html string")
    got = [r.m for r in df.select(extract_main_text(F.col("html")).alias("m")).collect()]
    for (h, want), g in zip(PAGES, got):
        assert g == want, (h, g, want)


def test_pure_codegen_plan(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = (
        df.select(extract_main_text(F.col("html")).alias("m"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_duckdb_parity(spark):
    df = spark.createDataFrame([(h,) for h, _ in PAGES], "html string")
    got = [r.m for r in df.select(extract_main_text(F.col("html")).alias("m")).collect()]
    con = duckdb.connect()
    con.sql("CREATE TABLE pages(html VARCHAR)")
    for h, _ in PAGES:
        con.execute("INSERT INTO pages VALUES (?)", [h])
    duck = [
        d[0] if d[0] is not None else ""
        for d in con.sql("SELECT " + main_text_sql("html") + " FROM pages").fetchall()
    ]
    assert got == duck


def test_s1_main_content_mode(spark):
    """with_extracted_text(main_content=True) fills html-only rows with
    boilerplate-stripped text; text-carrying rows keep their text."""
    from esmarc_spark.pipeline.extract_text import with_extracted_text

    html = (
        "<div><a href='/'>Nav</a> <a href='/b'>More</a></div>"
        "<p>Real content paragraph long enough to survive the block filter.</p>"
    ).encode()
    df = spark.createDataFrame(
        [
            ("u1", None, html, None, "en"),
            ("u2", None, None, "preset text stays", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = {r.url: r for r in with_extracted_text(df, main_content=True).collect()}
    assert out["u1"].text == "Real content paragraph long enough to survive the block filter."
    assert out["u1"].text_extracted is True
    assert out["u2"].text == "preset text stays" and out["u2"].text_extracted is False
