"""Composed graph-feature curation gate (round 7 — VERDICT r6 #4):
link farms (degree without closure), link rings (closure without
quality), and organic neighborhoods must get the right verdicts, and
the verdict must hash-match the chained DuckDB oracle."""

import duckdb
from pyspark.sql import functions as F

from esmarc_spark.ops.graph_gate import (
    gate_docs_by_graph,
    graph_gate_hosts,
    graph_gate_hosts_sql,
)

GOOD = (
    "The museum archive publishes digitized manuscripts, and the catalog "
    "links each record to its holding institution with clear provenance "
    "notes for researchers across many collections worldwide."
)
SPAM = "buy cheap buy cheap buy cheap click here click here $$$ !!!"


def _corpus(spark):
    """Three neighborhoods over one graph:

    * farm: satellites s1..s9 all link hub farmhub (star, no closure) —
      farmhub gets deg 9, zero triangles, decent text;
    * ring: r1..r4 complete digraph (dense closure) with spam text;
    * organic: g1,g2,g3 triangle with good text.
    """
    edges = [(f"s{i}", "farmhub") for i in range(1, 10)]
    edges += [
        (f"r{i}", f"r{j}") for i in range(1, 5) for j in range(1, 5) if i != j
    ]
    edges += [("g1", "g2"), ("g2", "g3"), ("g3", "g1")]
    docs = []
    for h in ["farmhub", "g1", "g2", "g3"] + [f"s{i}" for i in range(1, 10)]:
        docs.append((h, GOOD))
    for i in range(1, 5):
        docs.append((f"r{i}", SPAM))
    docs.append(("lonely.example", GOOD))  # not in the graph at all
    edf = spark.createDataFrame(edges, "src string, dst string")
    ddf = spark.createDataFrame(docs, "host string, text string")
    return ddf, edf


def test_graph_gate_verdicts(spark):
    ddf, edf = _corpus(spark)
    v = {r["host"]: r.asDict() for r in graph_gate_hosts(ddf, edf).collect()}
    # farm hub: high degree, zero closure -> dropped
    assert v["farmhub"]["deg"] == 9 and v["farmhub"]["coef_scaled"] == 0
    assert not v["farmhub"]["keep"]
    # ring members: dense closure but junk community quality -> dropped
    for i in range(1, 5):
        r = v[f"r{i}"]
        assert r["coef_scaled"] > 500_000  # clique closes everything
        assert not r["keep"]
    # organic triangle: closure AND quality -> kept
    for h in ("g1", "g2", "g3"):
        assert v[h]["coef_scaled"] == 10**6 and v[h]["keep"]
    # satellites: deg 1, exempt from the farm check, good text -> kept
    assert v["s1"]["keep"]
    # unlinked host: singleton community of itself, judged on own docs
    assert v["lonely.example"]["community"] == "lonely.example"
    assert v["lonely.example"]["keep"]


def test_gate_docs_by_graph_filters_rows(spark):
    ddf, edf = _corpus(spark)
    kept = {
        r["host"] for r in gate_docs_by_graph(ddf, edf).select("host").collect()
    }
    assert "farmhub" not in kept and "r1" not in kept
    assert {"g1", "g2", "g3", "s1", "lonely.example"} <= kept


def test_graph_gate_sql_parity(spark):
    ddf, edf = _corpus(spark)
    got = sorted(tuple(r) for r in graph_gate_hosts(ddf, edf).collect())
    docs_sql = " UNION ALL ".join(
        f"SELECT '{h}' AS host, '{t.replace(chr(39), chr(39) * 2)}' AS text"
        for h, t in [(r["host"], r["text"]) for r in ddf.collect()]
    )
    edges_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{d}' AS dst" for s, d in
        [(r["src"], r["dst"]) for r in edf.collect()]
    )
    want = sorted(duckdb.sql(graph_gate_hosts_sql(docs_sql, edges_sql)).fetchall())
    assert [tuple(str(x) for x in r) for r in got] == [
        tuple(str(x) for x in r) for r in want
    ]


def test_farm_with_closure_survives_farm_check(spark):
    """A hub whose neighborhood genuinely interlinks is NOT a farm —
    the closure term must rescue it."""
    edges = [(f"s{i}", "hub") for i in range(1, 10)]
    edges += [(f"s{i}", f"s{i + 1}") for i in range(1, 9)] + [("s9", "s1")]
    edf = spark.createDataFrame(edges, "src string, dst string")
    ddf = spark.createDataFrame(
        [(h, GOOD) for h in ["hub"] + [f"s{i}" for i in range(1, 10)]],
        "host string, text string",
    )
    v = {r["host"]: r.asDict() for r in graph_gate_hosts(ddf, edf).collect()}
    assert v["hub"]["deg"] == 9 and v["hub"]["coef_scaled"] > 1_000
    assert v["hub"]["keep"]
