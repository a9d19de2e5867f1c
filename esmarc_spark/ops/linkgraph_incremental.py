"""Incremental link-graph state across crawl dumps (round 7).

A growing crawl should not re-pay link extraction over petabytes of
historical HTML every time a dump lands. This module persists per-dump
HOST EDGE deltas and re-ranks the merged relation, the same
accumulated-state pattern as ``ops.dedup_incremental`` /
``ops.line_dedup`` (reference analogue: the enrichment bots'
anti-join-against-accumulated-state, enrichment/wikidata.py:129-134).

What makes it incremental — and what matters at 100 TB — is the EDGE
layer: ``extract_outlinks`` scans raw HTML (the petabyte side), while
the host graph it produces is ~4 orders of magnitude smaller (~10^8
hosts vs ~10^12 pages). Persisting per-dump (src, dst) host pairs means
a new dump pays HTML extraction ONLY for its own pages; the rank loop
re-runs over the merged host relation, the cheap side by construction
(measured: BENCH/pagerank_incremental.json — per-dump cost stays flat
while the from-scratch run grows with corpus age).

Warm-starting the rank loop from the previous dump's vector was
prototyped and REJECTED with evidence rather than assumed: the
exact-integer PageRank map stabilizes by floor-snapping, not by
distance-from-start. On seeded random digraphs (500 nodes / 4k edges,
scale 1e12, +1% edge delta) a warm start from the previous fixpoint
took MORE rounds to stabilize than the uniform cold start (34 vs 28)
and landed on a DIFFERENT fixpoint (max 3 units of 1e-12 — floored
fixpoints are not unique, so "fewer iterations to the same fixpoint"
does not hold for this arithmetic). Since the bit-identical contract
(north rule: same result at any parallelism, hash-matched by the DuckDB
oracle) is worth more than zero measured savings, published ranks are
always the COLD fixed-budget run over the merged edges — provably
byte-identical to from-scratch ``pagerank`` over the concatenated
dumps. ``ops.linkgraph.pagerank_converge`` exposes the exact-integer
early-stop for budget discovery; its stability count is itself
deterministic.

State layout under ``state_root`` (any fsio-capable URI):

* ``edges/dump=<id>/``   parquet (src, dst) — the dump's distinct host pairs
* ``ranks/version=<N>/`` parquet (host, rank_scaled) over all committed dumps
* ``_STATE``             JSON {"dumps": [...], "ranks_version": N} — the
                         single atomic commit point (fsio.write_text_atomic).
                         A crash before the marker leaves orphan dirs that
                         the deterministic rerun overwrites; a crash after
                         it is a completed dump.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esmarc_spark.ops.linkgraph import extract_outlinks, pagerank
from esmarc_spark.pipeline import fsio


class LinkGraphState:
    """Reader/writer for the persisted link-graph state (see module doc)."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def manifest(self) -> dict:
        raw = fsio.read_text(fsio.join(self.root, "_STATE"))
        if raw is None:
            return {"dumps": [], "ranks_version": 0}
        return json.loads(raw)

    def edges(self, spark: SparkSession) -> DataFrame | None:
        """Merged distinct (src, dst) over every committed dump."""
        dumps = self.manifest()["dumps"]
        if not dumps:
            return None
        paths = [fsio.join(self.root, "edges", f"dump={d}") for d in dumps]
        return spark.read.parquet(*paths).select("src", "dst").distinct()

    def ranks(self, spark: SparkSession) -> DataFrame | None:
        """Current (host, rank_scaled) authority dim — feed this to
        ``prepare_docs(host_ranks=...)`` / ``run_incremental``'s
        curation dict (the gate the verdict wired it for)."""
        v = self.manifest()["ranks_version"]
        if v == 0:
            return None
        return spark.read.parquet(fsio.join(self.root, "ranks", f"version={v}"))

    def _publish(self, dumps: list[str], ranks_version: int) -> None:
        fsio.write_text_atomic(
            fsio.join(self.root, "_STATE"),
            json.dumps({"dumps": dumps, "ranks_version": ranks_version}),
        )

    def vacuum(self) -> None:
        """GC superseded rank versions (never the current one). Split
        from the per-dump publish for the same reason DedupState splits
        commit from vacuum: rank DataFrames handed out earlier are lazy
        reads of their version dir."""
        current = self.manifest()["ranks_version"]
        for name in fsio.list_child_dirs(
            fsio.join(self.root, "ranks"), "version="
        ):
            if int(name.split("=", 1)[1]) < current:
                fsio.delete_dir(fsio.join(self.root, "ranks", name))


def ingest_pages_dump(
    spark: SparkSession,
    pages: DataFrame,
    state_root: str,
    dump_id: str,
    iterations: int = 5,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Commit one new dump of raw pages to the link-graph state and
    return the refreshed (host, rank_scaled) authority dim over ALL
    committed dumps.

    Byte-identical to from-scratch ``host_pagerank`` over the
    concatenated dumps (tested): per-page extraction then distinct is
    the same relation whether the distinct runs per dump + merge or
    once globally. Replaying an already-committed dump_id returns the
    current ranks without recomputing (idempotent); a crash between the
    edge write and the marker is healed by the deterministic rerun
    overwriting the orphan dir."""
    st = LinkGraphState(state_root)
    manifest = st.manifest()
    if dump_id in manifest["dumps"]:
        return st.ranks(spark)
    extract_outlinks(pages, url_col, html_col).write.mode("overwrite").parquet(
        fsio.join(st.root, "edges", f"dump={dump_id}")
    )
    dumps = manifest["dumps"] + [dump_id]
    merged = spark.read.parquet(
        *[fsio.join(st.root, "edges", f"dump={d}") for d in dumps]
    )
    version = manifest["ranks_version"] + 1
    ranks_path = fsio.join(st.root, "ranks", f"version={version}")
    pagerank(merged, iterations).write.mode("overwrite").parquet(ranks_path)
    st._publish(dumps, version)
    return spark.read.parquet(ranks_path)


def authority_ranks(spark: SparkSession, state_root: str) -> DataFrame | None:
    """Convenience: the persisted authority dim for the prepare_docs
    host-authority gate (None before the first committed dump)."""
    return LinkGraphState(state_root).ranks(spark)


# ---------------------------------------------------------------------------
# incremental anchor-text gazetteer (round 7)
# ---------------------------------------------------------------------------
#
# Same per-dump-delta pattern for the anchor-text gazetteer
# (ops.linkgraph.harvest_anchor_texts). The unit of state is the
# DISTINCT (host, token, src) vote relation, NOT the thresholded
# counts: distinct votes union losslessly across dumps (a (host, token,
# src) triple seen in two dumps is still ONE distinct linking-page
# vote), while per-dump counts would double-count repeat voters and
# per-dump thresholded gazetteers would lose tokens that only cross
# min_pages across dumps. The vote relation is host-vocabulary sized
# (~10^8 hosts x short anchor vocab), 4+ orders of magnitude below the
# page corpus, so a new dump pays HTML anchor extraction only for its
# own pages and the merge is cheap by construction — the exact shape
# the edge-delta state above uses.


class AnchorState:
    """Persisted per-dump anchor votes under ``state_root``:

    * ``votes/dump=<id>/`` parquet (host, token, src) — the dump's
      distinct anchor votes
    * ``_STATE``           JSON {"dumps": [...]} — atomic commit point
    """

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def manifest(self) -> dict:
        raw = fsio.read_text(fsio.join(self.root, "_STATE"))
        if raw is None:
            return {"dumps": []}
        return json.loads(raw)

    def votes(self, spark: SparkSession) -> DataFrame | None:
        """Merged distinct votes over every committed dump."""
        dumps = self.manifest()["dumps"]
        if not dumps:
            return None
        paths = [fsio.join(self.root, "votes", f"dump={d}") for d in dumps]
        return (
            spark.read.parquet(*paths).select("host", "token", "src").distinct()
        )

    def _publish(self, dumps: list[str]) -> None:
        fsio.write_text_atomic(
            fsio.join(self.root, "_STATE"), json.dumps({"dumps": dumps})
        )


def ingest_anchor_dump(
    spark: SparkSession,
    pages: DataFrame,
    state_root: str,
    dump_id: str,
    min_pages: int = 2,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Commit one dump's anchor votes and return the refreshed
    (host, token, n_pages) gazetteer over ALL committed dumps —
    byte-identical to from-scratch ``harvest_anchor_texts`` over the
    concatenated dumps (tested): distinct-of-union-of-per-dump-distincts
    is the same relation as one global distinct. Idempotent per
    dump_id; a crash between the vote write and the marker is healed by
    the deterministic rerun overwriting the orphan dir."""
    from esmarc_spark.ops.linkgraph import anchor_votes, gazetteer_from_votes

    st = AnchorState(state_root)
    manifest = st.manifest()
    if dump_id not in manifest["dumps"]:
        anchor_votes(pages, url_col, html_col).write.mode("overwrite").parquet(
            fsio.join(st.root, "votes", f"dump={dump_id}")
        )
        st._publish(manifest["dumps"] + [dump_id])
    return gazetteer_from_votes(st.votes(spark), min_pages)


def gate_docs_from_state(
    spark: SparkSession,
    documents: DataFrame,
    state_root: str,
    host_col: str = "host",
    **thresholds,
) -> DataFrame:
    """The full graph-feature curation gate (``ops.graph_gate``:
    authority floor + link-farm + link-ring checks) driven by the
    PERSISTED link-graph state instead of a fresh extraction pass —
    per-dump edge deltas mean the gate never re-reads historical HTML.
    Since the merged edge relation is provably the from-scratch
    relation (see ``ingest_pages_dump``), the verdicts are identical
    too. Before the first committed dump there is no graph evidence,
    so documents pass through unchanged (the same lenient default as
    ``prepare_docs(keep_unranked=True)``)."""
    from esmarc_spark.ops.graph_gate import gate_docs_by_graph

    edges = LinkGraphState(state_root).edges(spark)
    if edges is None:
        return documents
    return gate_docs_by_graph(
        documents, edges, host_col=host_col, **thresholds
    )
