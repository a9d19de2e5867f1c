"""robots.txt REP parsing + URL gate (round 7): RFC 9309 grouped-agent
semantics, wildcard/end-anchor rules, longest-match with Allow winning
ties, and cross-engine parity of the in-engine regex compilation."""

import duckdb
import pytest

ROBOTS = """# example corpus robots
User-agent: specialbot
Disallow: /

User-agent: extra
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp/*.html$
Allow:
Crawl-delay: 10
"""


def _fixtures(spark):
    robots = spark.createDataFrame(
        [
            ("ex.com", ROBOTS),
            # no *-agent block: nothing applies to us
            ("open.com", "User-agent: badbot\nDisallow: /"),
            ("empty.com", ""),
        ],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [
            (1, "https://ex.com/private/x"),
            (2, "https://ex.com/private/ok/y"),  # longer Allow wins
            (3, "https://ex.com/pub"),
            (4, "https://ex.com/tmp/a.html"),  # wildcard + $ hits
            (5, "https://ex.com/tmp/a.html?q=1"),  # $ anchors: no hit
            (6, "https://ex.com"),  # bare host -> path '/'
            (7, "https://open.com/private/z"),
            (8, "https://norobots.com/a"),  # host absent entirely
            (9, "https://empty.com/x"),
        ],
        "doc_id long, url string",
    )
    return robots, pages


def test_rep_semantics(spark):
    from esmarc_spark.ops.robots import parse_robots, robots_verdicts

    robots, pages = _fixtures(spark)
    got = {
        r["key"]: (r["allowed"], r["rule"])
        for r in robots_verdicts(pages, parse_robots(robots)).collect()
    }
    assert got == {
        1: (False, "/private"),
        2: (True, "/private/ok"),
        3: (True, None),
        4: (False, "/tmp/*.html$"),
        5: (True, None),
        6: (True, None),
        7: (True, None),
        8: (True, None),
        9: (True, None),
    }


def test_parse_drops_non_star_blocks_and_empty_rules(spark):
    from esmarc_spark.ops.robots import parse_robots

    robots, _ = _fixtures(spark)
    rules = parse_robots(robots).collect()
    assert {r["host"] for r in rules} == {"ex.com"}
    # specialbot's 'Disallow: /' and the empty 'Allow:' never surface
    assert sorted(r["path"] for r in rules) == [
        "/private",
        "/private/ok",
        "/tmp/*.html$",
    ]


def test_stacked_user_agents_share_block(spark):
    """RFC 9309 §2.1: consecutive UA lines open ONE block; '*' anywhere
    in the stack makes its rules apply. A UA line after rules opens a
    NEW block that does not inherit."""
    from esmarc_spark.ops.robots import parse_robots

    txt = (
        "User-agent: a\nUser-agent: *\nDisallow: /x\n"
        "User-agent: b\nDisallow: /y\n"
    )
    rules = parse_robots(
        spark.createDataFrame([("h.com", txt)], "host string, robots_txt string")
    ).collect()
    assert [(r["directive"], r["path"]) for r in rules] == [("disallow", "/x")]


def test_metachars_in_rule_paths_match_literally(spark):
    """The escape chain: regex specials in a rule path must not act as
    regex — '/a.b' matches '/a.b' but NOT '/axb'."""
    from esmarc_spark.ops.robots import parse_robots, robots_verdicts

    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /a.b(c)+")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [(1, "https://h.com/a.b(c)+/d"), (2, "https://h.com/axb(c)+/d")],
        "doc_id long, url string",
    )
    got = {
        r["key"]: r["allowed"]
        for r in robots_verdicts(pages, parse_robots(robots)).collect()
    }
    assert got == {1: False, 2: True}


def test_robots_gate_filters_pages(spark):
    from esmarc_spark.ops.robots import robots_gate

    robots, pages = _fixtures(spark)
    kept = robots_gate(pages, robots)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 5, 6, 7, 8, 9]
    assert kept.columns == pages.columns  # pass-through schema


def test_duckdb_parity_and_partition_invariance(spark):
    from esmarc_spark.ops.robots import (
        parse_robots,
        robots_verdicts,
        robots_verdicts_sql,
    )

    robots, pages = _fixtures(spark)
    rules = parse_robots(robots)
    got = sorted(tuple(r) for r in robots_verdicts(pages, rules).collect())
    got13 = sorted(
        tuple(r)
        for r in robots_verdicts(pages.repartition(13), rules).collect()
    )
    assert got == got13
    con = duckdb.connect()
    con.register("robots_t", robots.toPandas())
    con.register("pages_t", pages.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            robots_verdicts_sql(
                "SELECT doc_id AS key, url FROM pages_t",
                "SELECT host, robots_txt FROM robots_t",
            )
        ).fetchall()
    )
    assert got == want


def test_crawl_delays_star_scope_and_min(spark):
    import duckdb

    from esmarc_spark.ops.robots import crawl_delays, crawl_delays_sql

    robots = spark.createDataFrame(
        [
            # star block delay 5 (and a repeated 9 -> min wins)
            ("a.com", "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n"
                      "User-agent: *\nCrawl-delay: 9"),
            # delay only in a non-star block: absent for us
            ("b.com", "User-agent: other\nCrawl-delay: 30"),
            # non-integer value ignored
            ("c.com", "User-agent: *\nCrawl-delay: 0.5"),
            ("d.com", "User-agent: *\nDisallow: /"),
        ],
        "host string, robots_txt string",
    )
    got = {r["host"]: r["crawl_delay_sec"] for r in crawl_delays(robots).collect()}
    assert got == {"a.com": 5}
    con = duckdb.connect()
    con.register("r", robots.toPandas())
    want = {
        r[0]: r[1]
        for r in con.execute(
            crawl_delays_sql("SELECT host, robots_txt FROM r")
        ).fetchall()
    }
    assert got == want
