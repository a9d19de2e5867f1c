"""Incremental link-graph state (round 7 — VERDICT r6 #2): per-dump
edge deltas + cold re-rank must be byte-identical to from-scratch over
the concatenated dumps, replay-idempotent, and crash-safe; the
exact-integer convergence stop must find a true fixpoint."""

import json

import pytest
from pyspark.sql import functions as F

from esmarc_spark.ops.linkgraph import (
    extract_outlinks,
    host_pagerank,
    pagerank,
    pagerank_converge,
)
from esmarc_spark.ops.linkgraph_incremental import (
    LinkGraphState,
    authority_ranks,
    ingest_pages_dump,
)


def _pages(spark, lo, hi, hosts=23):
    """Deterministic synthetic pages: doc i on host i%hosts links to two
    arithmetic neighbours — overlapping hosts across dumps, new hosts
    appear as ``hosts`` grows."""
    d = F.col("id")
    url = F.concat(
        F.lit("https://h"), F.pmod(d, F.lit(hosts)).cast("string"),
        F.lit(".example/p/"), d.cast("string"),
    )
    html = F.concat(
        F.lit('<a href="https://h'),
        F.pmod(d * 7 + 3, F.lit(hosts)).cast("string"),
        F.lit('.example/x">a</a><a href="https://h'),
        F.pmod(d * 11 + 5, F.lit(hosts + 6)).cast("string"),
        F.lit('.example/y">b</a>'),
    )
    return spark.range(lo, hi).select(url.alias("url"), html.alias("html"))


def _rankmap(df):
    return {r["host"]: r["rank_scaled"] for r in df.collect()}


def test_incremental_equals_from_scratch_per_dump(spark, tmp_path):
    root = str(tmp_path / "lg")
    dumps = [(0, 40), (40, 90), (90, 140)]
    seen = None
    for n, (lo, hi) in enumerate(dumps):
        got = ingest_pages_dump(spark, _pages(spark, lo, hi), root, f"d{n}")
        seen = _pages(spark, 0, hi)
        want = host_pagerank(seen, iterations=5)
        assert _rankmap(got) == _rankmap(want), f"dump {n} diverged"
    # the persisted dim is the same relation the gate will read
    assert _rankmap(authority_ranks(spark, root)) == _rankmap(
        host_pagerank(seen, iterations=5)
    )


def test_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "lg")
    ingest_pages_dump(spark, _pages(spark, 0, 40), root, "d0")
    before = LinkGraphState(root).manifest()
    again = ingest_pages_dump(spark, _pages(spark, 0, 40), root, "d0")
    assert LinkGraphState(root).manifest() == before  # no recommit
    assert _rankmap(again) == _rankmap(
        host_pagerank(_pages(spark, 0, 40), iterations=5)
    )


def test_crash_orphan_edges_dir_is_healed(spark, tmp_path):
    """A crash after the edge write but before the marker leaves an
    orphan edges/dump=<id> dir (possibly from DIFFERENT input if the
    upstream was fixed between runs); the deterministic rerun must
    overwrite it and commit the true content."""
    root = str(tmp_path / "lg")
    ingest_pages_dump(spark, _pages(spark, 0, 40), root, "d0")
    # orphan: wrong edges written under the next dump id, no marker
    extract_outlinks(_pages(spark, 500, 520)).write.mode("overwrite").parquet(
        f"{root}/edges/dump=d1"
    )
    assert LinkGraphState(root).manifest()["dumps"] == ["d0"]
    got = ingest_pages_dump(spark, _pages(spark, 40, 90), root, "d1")
    want = host_pagerank(_pages(spark, 0, 90), iterations=5)
    assert _rankmap(got) == _rankmap(want)


def test_vacuum_keeps_current_version(spark, tmp_path):
    root = str(tmp_path / "lg")
    ingest_pages_dump(spark, _pages(spark, 0, 40), root, "d0")
    ingest_pages_dump(spark, _pages(spark, 40, 90), root, "d1")
    st = LinkGraphState(root)
    assert st.manifest()["ranks_version"] == 2
    st.vacuum()
    import pathlib

    left = sorted(
        p.name for p in pathlib.Path(root, "ranks").iterdir() if p.is_dir()
    )
    assert left == ["version=2"]
    assert _rankmap(st.ranks(spark)) == _rankmap(
        host_pagerank(_pages(spark, 0, 90), iterations=5)
    )


def test_state_feeds_prepare_docs_gate(spark, tmp_path):
    """The verdict's wiring: the persisted authority dim gates
    prepare_docs — hosts ranked below the floor are dropped before S1."""
    from esmarc_spark.pipeline.run import prepare_docs

    root = str(tmp_path / "lg")
    # skewed graph: every page also links the h0 hub, so ranks separate
    d = F.col("id")
    hub_pages = spark.range(0, 200).select(
        F.concat(
            F.lit("https://h"), F.pmod(d, F.lit(11)).cast("string"),
            F.lit(".example/p/"), d.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit('<a href="https://h0.example/">hub</a><a href="https://h'),
            F.pmod(d * 7 + 3, F.lit(11)).cast("string"),
            F.lit('.example/x">a</a>'),
        ).alias("html"),
    )
    ranks = ingest_pages_dump(spark, hub_pages, root, "d0")
    floor = max(r["rank_scaled"] for r in ranks.collect())
    low_hosts = {
        r["host"] for r in ranks.where(F.col("rank_scaled") < floor).collect()
    }
    assert low_hosts
    web = hub_pages.withColumn(
        "warc_ts", F.timestamp_seconds(F.lit(1700000000))
    ).withColumn("html", F.encode("html", "UTF-8")).withColumn(
        "text", F.lit(None).cast("string")
    ).withColumn("lang", F.lit("en"))
    kept = prepare_docs(
        web,
        host_ranks=authority_ranks(spark, root),
        min_rank_scaled=floor,
        keep_unranked=False,
    )
    from esmarc_spark.ops.urlnorm import host_of

    kept_hosts = {
        r["h"] for r in kept.select(host_of(F.col("url")).alias("h")).distinct().collect()
    }
    assert kept_hosts and not (kept_hosts & low_hosts)


def test_pagerank_converge_finds_exact_fixpoint(spark):
    """The early stop fires strictly before the budget on a small graph,
    the result is a true fixpoint (more budget changes nothing), and the
    fixed-budget contract run at the discovered round count reproduces
    it bit-for-bit."""
    edges = extract_outlinks(_pages(spark, 0, 120, hosts=17))
    ranks, rounds = pagerank_converge(edges, max_iterations=80)
    assert 0 < rounds < 80, rounds
    fix = _rankmap(ranks)
    assert fix == _rankmap(pagerank(edges, iterations=rounds))
    assert fix == _rankmap(pagerank(edges, iterations=rounds + 3))


def test_manifest_is_versioned_json(spark, tmp_path):
    root = str(tmp_path / "lg")
    ingest_pages_dump(spark, _pages(spark, 0, 30), root, "2024-01")
    raw = json.loads(open(f"{root}/_STATE").read())
    assert raw == {"dumps": ["2024-01"], "ranks_version": 1}

# ---------------------------------------------------------------------------
# incremental anchor-text gazetteer state
# ---------------------------------------------------------------------------

from esmarc_spark.ops.linkgraph import harvest_anchor_texts  # noqa: E402
from esmarc_spark.ops.linkgraph_incremental import (  # noqa: E402
    AnchorState,
    ingest_anchor_dump,
)


def _apages(spark, lo, hi, hosts=13):
    """Pages whose anchor text varies with doc id: doc i on host i%hosts
    links to host (i*7+3)%hosts calling it 'name<dst> corp' — the same
    (host, token, src) vote recurs across dumps whenever the (i%hosts,
    (i*7+3)%hosts) pair recurs, exercising the distinct-union merge."""
    d = F.col("id")
    dst = F.pmod(d * 7 + 3, F.lit(hosts)).cast("string")
    url = F.concat(
        F.lit("https://h"), F.pmod(d, F.lit(hosts)).cast("string"),
        F.lit(".example/p/"), d.cast("string"),
    )
    html = F.concat(
        F.lit('<a href="https://h'), dst, F.lit('.example/x">name'),
        dst, F.lit(" corp</a>"),
    )
    return spark.range(lo, hi).select(url.alias("url"), html.alias("html"))


def _gazmap(df):
    return {(r["host"], r["token"]): r["n_pages"] for r in df.collect()}


def test_anchor_incremental_equals_from_scratch_per_dump(spark, tmp_path):
    root = str(tmp_path / "gaz")
    dumps = [(0, 30), (30, 70), (70, 120)]
    for n, (lo, hi) in enumerate(dumps):
        got = ingest_anchor_dump(spark, _apages(spark, lo, hi), root, f"d{n}")
        want = harvest_anchor_texts(_apages(spark, 0, hi))
        assert _gazmap(got) == _gazmap(want), f"dump {n} diverged"


def test_anchor_repeat_voter_across_dumps_counts_once(spark, tmp_path):
    """The SAME (host, token, src) vote committed in two dumps is one
    distinct linking-page vote, exactly as from-scratch over the union."""
    root = str(tmp_path / "gaz")
    ingest_anchor_dump(spark, _apages(spark, 0, 26), root, "d0")
    # second dump repeats the same id range: identical votes
    got = ingest_anchor_dump(spark, _apages(spark, 0, 26), root, "d1")
    want = harvest_anchor_texts(_apages(spark, 0, 26))
    assert _gazmap(got) == _gazmap(want)


def test_anchor_threshold_crossed_only_across_dumps(spark, tmp_path):
    """A token below min_pages in every single dump must surface once
    the MERGED distinct votes cross it — per-dump thresholded
    gazetteers would lose it (the reason state = votes, not counts)."""
    def one_vote(src_host, dst_host):
        return spark.range(0, 1).select(
            F.lit(f"https://{src_host}.example/p").alias("url"),
            F.lit(
                f'<a href="https://{dst_host}.example/x">acme widgets</a>'
            ).alias("html"),
        )

    root = str(tmp_path / "gaz")
    g1 = ingest_anchor_dump(spark, one_vote("a", "t"), root, "d0", min_pages=2)
    assert _gazmap(g1) == {}  # one vote, below threshold
    g2 = ingest_anchor_dump(spark, one_vote("b", "t"), root, "d1", min_pages=2)
    assert _gazmap(g2) == {
        ("t.example", "acme"): 2,
        ("t.example", "widgets"): 2,
    }


def test_anchor_replay_idempotent_and_crash_healed(spark, tmp_path):
    from esmarc_spark.ops.linkgraph import anchor_votes

    root = str(tmp_path / "gaz")
    ingest_anchor_dump(spark, _apages(spark, 0, 30), root, "d0")
    before = AnchorState(root).manifest()
    again = ingest_anchor_dump(spark, _apages(spark, 0, 30), root, "d0")
    assert AnchorState(root).manifest() == before
    assert _gazmap(again) == _gazmap(harvest_anchor_texts(_apages(spark, 0, 30)))
    # orphan votes dir without marker: rerun overwrites and commits
    anchor_votes(_apages(spark, 500, 510)).write.mode("overwrite").parquet(
        f"{root}/votes/dump=d1"
    )
    assert AnchorState(root).manifest()["dumps"] == ["d0"]
    got = ingest_anchor_dump(spark, _apages(spark, 30, 70), root, "d1")
    assert _gazmap(got) == _gazmap(harvest_anchor_texts(_apages(spark, 0, 70)))


def test_gate_docs_from_state_equals_from_scratch(spark, tmp_path):
    """The graph-feature gate over per-dump-committed edges must give
    the same surviving docs as the gate over a fresh extraction of the
    full corpus; with no committed dumps it passes everything."""
    from esmarc_spark.ops.graph_gate import gate_docs_by_graph
    from esmarc_spark.ops.linkgraph import extract_outlinks
    from esmarc_spark.ops.linkgraph_incremental import gate_docs_from_state

    docs = spark.createDataFrame(
        [(f"h{i % 23}.example", f"doc body text quality {i}") for i in range(60)],
        "host string, text string",
    )
    root = str(tmp_path / "lg")
    assert gate_docs_from_state(spark, docs, root).count() == 60  # no state yet
    ingest_pages_dump(spark, _pages(spark, 0, 40), root, "d0")
    ingest_pages_dump(spark, _pages(spark, 40, 90), root, "d1")
    # a data-derived floor guarantees a genuine keep/drop split; the
    # ring check is disabled (synthetic text scores below any real
    # quality bar) — the equality of verdicts is the contract here
    ranks = LinkGraphState(root).ranks(spark).collect()
    floor = sorted(r["rank_scaled"] for r in ranks)[len(ranks) // 2]
    kw = dict(
        min_rank_scaled=floor, farm_min_deg=10**9, min_community_quality=0.0
    )
    got = gate_docs_from_state(spark, docs, root, **kw)
    want = gate_docs_by_graph(
        docs, extract_outlinks(_pages(spark, 0, 90)), **kw
    )
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w and 0 < len(g) < 60
