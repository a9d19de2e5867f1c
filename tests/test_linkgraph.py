"""Link-graph construction + scaled-integer PageRank.

The Spark implementation is verified three ways:
  * against an INDEPENDENT pure-Python implementation of the same
    integer recurrence (dict loop, no Spark),
  * against the DuckDB oracle SQL generator (the driver-gate mirror),
  * structural properties (rank-mass conservation, dangling handling).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from esmarc_spark.ops.linkgraph import (
    SCALE,
    extract_outlinks,
    host_pagerank,
    pagerank,
    pagerank_sql,
)


def _python_pagerank(edges, iterations=5, dn=85, dd=100, scale=SCALE):
    """Reference implementation: plain dicts, same floor arithmetic."""
    edges = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    teleport = ((dd - dn) * scale) // dd
    base = teleport // n
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += r[s] // out[s]
        dangling = sum(r[v] for v in nodes if v not in out)
        dshare = dangling // n
        r = {v: base + (dn * (inflow[v] + dshare)) // dd for v in nodes}
    return r


def _toy_edges():
    # deterministic graph: ring + hub + two dangling sinks
    edges = []
    for i in range(24):
        edges.append((f"h{i}", f"h{(i + 1) % 24}"))
        edges.append((f"h{i}", f"h{(i * 7 + 3) % 24}"))
        if i % 3 == 0:
            edges.append((f"h{i}", "hub"))
        if i % 5 == 0:
            edges.append((f"h{i}", f"sink{i % 2}"))
    edges.append(("hub", "h0"))
    return edges


def test_pagerank_matches_python_reference(spark):
    edges = _toy_edges()
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["host"]: r["rank_scaled"] for r in pagerank(df, 5).collect()}
    assert got == _python_pagerank(edges, 5)


def test_pagerank_mass_conservation(spark):
    edges = _toy_edges()
    df = spark.createDataFrame(edges, "src string, dst string")
    total = (
        pagerank(df, 5).agg(F.sum("rank_scaled").alias("t")).collect()[0]["t"]
    )
    # floors only ever LOSE mass, and boundedly so
    assert 0.99 * SCALE < total <= SCALE


def test_pagerank_dangling_receives_rank(spark):
    # a pure sink must still hold rank, and more than the teleport floor
    df = spark.createDataFrame(
        [("a", "sink"), ("b", "sink"), ("a", "b"), ("b", "a")],
        "src string, dst string",
    )
    got = {r["host"]: r["rank_scaled"] for r in pagerank(df, 5).collect()}
    assert got == _python_pagerank(
        [("a", "sink"), ("b", "sink"), ("a", "b"), ("b", "a")], 5
    )
    assert got["sink"] > (15 * SCALE // 100) // 3  # above pure-teleport


def test_pagerank_duckdb_oracle_parity(spark):
    edges = _toy_edges()
    df = spark.createDataFrame(edges, "src string, dst string")
    got = sorted(
        (r["host"], r["rank_scaled"]) for r in pagerank(df, 4).collect()
    )
    vals = ", ".join(f"('{s}', '{d}')" for s, d in sorted(set(edges)))
    sql = pagerank_sql(f"SELECT * FROM (VALUES {vals}) AS e(src, dst)", 4)
    want = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert got == sorted(want)


def test_extract_outlinks(spark):
    rows = [
        (
            "https://a.example/p1",
            '<a href="https://b.example/x">b</a>'
            '<a href="HTTPS://C.EXAMPLE:8443/y">case+port</a>'
            '<a href="/relative">rel</a>'
            '<a href="https://a.example/self">self</a>',
        ),
        ("https://b.example/p2", '<a href="https://a.example/z">back</a>'),
        ("https://d.example/p3", "no links here"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = sorted(tuple(r) for r in extract_outlinks(df).collect())
    assert got == [
        ("a.example", "b.example"),
        ("a.example", "c.example"),
        ("b.example", "a.example"),
    ]


def test_host_pagerank_composition(spark):
    rows = [
        ("https://a.example/1", '<a href="https://b.example/x">.</a>'),
        ("https://b.example/2", '<a href="https://a.example/y">.</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["host"]: r["rank_scaled"] for r in host_pagerank(df, 3).collect()}
    assert got == _python_pagerank(
        [("a.example", "b.example"), ("b.example", "a.example")], 3
    )


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df, 3).count() == 0


def test_harvest_anchor_texts(spark):
    from esmarc_spark.ops.linkgraph import harvest_anchor_texts

    rows = [
        ("https://p1.example/a", '<a href="https://acme.example/x">Acme Corp</a>'),
        ("https://p2.example/b", '<a href="https://acme.example/y" rel="nofollow">acme CORP</a>'),
        # same page repeating the link: one vote per (host, token, page)
        ("https://p3.example/c",
         '<a href="https://acme.example/z">Acme</a><a href="https://acme.example/w">Acme</a>'),
        # self-link: excluded
        ("https://acme.example/d", '<a href="https://acme.example/e">Acme Corp</a>'),
        # relative href: no host, excluded
        ("https://p4.example/f", '<a href="/local">Acme</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = sorted(
        (r.host, r.token, r.n_pages)
        for r in harvest_anchor_texts(df, min_pages=2).collect()
    )
    # "acme" seen from p1, p2, p3 (p3 counted once, self+relative excluded)
    assert got == [("acme.example", "acme", 3), ("acme.example", "corp", 2)]


def test_harvest_anchor_texts_duckdb_parity(spark):
    import duckdb

    from esmarc_spark.ops.linkgraph import (
        harvest_anchor_texts,
        harvest_anchor_texts_sql,
    )

    rows = [
        (
            f"https://p{i}.example/x",
            f'<a href="https://t{i % 5}.example/a">brand {i % 3} name</a>'
            f'<a href="https://t{(i + 2) % 5}.example/b">other label {i % 4}</a>',
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = sorted(
        tuple(r) for r in harvest_anchor_texts(df, min_pages=2).collect()
    )
    vals = ", ".join(f"('{u}', '{h}')" for u, h in rows)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            harvest_anchor_texts_sql(
                f"SELECT * FROM (VALUES {vals}) AS p(url, html)", 2
            )
        ).fetchall()
    )
    assert got == want and len(got) > 10
