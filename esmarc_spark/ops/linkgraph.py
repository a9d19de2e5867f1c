"""Web link-graph construction + PageRank-style host authority.

Training-data curation pipelines rank crawl hosts by link authority
(CCNet/RefinedWeb-style quality stratification uses centrality over the
host graph; the reference's analogous signal is its authority-ID link
degree, esmarc.py getsameAs/getentity edges) — this module builds the
host-level graph straight from crawled HTML and computes a deterministic
PageRank over it, all as DataFrame ops.

Two design decisions worth stating:

* **Host level, not page level.** At 100 TB the page graph has ~10^12
  nodes; the host graph (~10^8) is what curation actually consumes, and
  host aggregation is a map-side hash shrink BEFORE the first shuffle
  (`extract_outlinks` distincts (src,dst) host pairs, so edge volume is
  bounded by host-pair cardinality, not link count).

* **Scaled-integer arithmetic.** Ranks are maintained as
  ``rank_scaled = floor(rank * SCALE)`` int64, every operation an exact
  integer floor — because float PageRank is not reproducible across
  engines (sum order changes low bits, so a DuckDB replay can never
  hash-match) and not reproducible across CLUSTER SIZES either (a
  different partitioning changes float sum order run to run). The
  integer formulation makes the result bit-identical at any parallelism
  — the property the north rule's two-cluster-size criterion needs —
  at a rank resolution of 1/SCALE (1e-12), far below anything a
  curation threshold can see. Real-valued ranks are
  ``rank_scaled / SCALE``.

Iteration mechanics (the Spark-shaped parts):

* static relations (edges+outdegree, dangling-host set) are computed
  once, repartitioned on the join key, and localCheckpointed — each
  iteration only shuffles the (small) rank relation;
* ranks are **eagerly** localCheckpointed every round: each round scans
  the previous ranks twice (contribution join + dangling-mass agg), so
  an unbroken lineage grows 2^k (measured in BENCH/cc_skew.json for the
  same pattern in connected components);
* the dangling mass is a one-row aggregate attached via broadcast
  crossJoin — no driver collect in the loop;
* hub in-degrees (the Zipf reality of the web host graph) are absorbed
  by partial aggregation in ``groupBy(dst).sum`` — the skewed side
  never concentrates on one task before a map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops.urlnorm import host_of

SCALE = 10**12

# href attribute values; RE2-safe (no backreferences/lookaround) so the
# DuckDB oracle runs the IDENTICAL pattern
HREF_PATTERN = r'href="([^"]*)"'
_HOST_PATTERN_SQL = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def _fdiv(a: F.Column, b) -> F.Column:
    """Exact floor division for NON-NEGATIVE int64 columns: subtract the
    remainder, then divide — the double division is of an exact multiple
    whose quotient is an integer < 2^53, hence exact. (F.floor(a/b)
    would round through an inexact double; `a DIV b` is Spark-only and
    this construction is mirrored verbatim in the DuckDB oracle.)"""
    return ((a - F.pmod(a, b)) / b).cast("long")


def extract_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst) host-level edges from raw HTML: every absolute
    href on a page links its host to the target host. Relative links
    carry no host signal and are dropped; self-links likewise. The
    distinct() is the map-side shrink that makes the edge relation
    scale with host-pair cardinality instead of raw link count."""
    links = pages.select(
        host_of(F.col(url_col)).alias("src"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(HREF_PATTERN), F.lit(1))
        ).alias("href"),
    )
    return (
        links.select("src", host_of(F.col("href")).alias("dst"))
        .where((F.col("src") != "") & (F.col("dst") != "") & (F.col("src") != F.col("dst")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> DataFrame:
    """Deterministic scaled-integer PageRank over a (src, dst) edge
    relation. Returns (host, rank_scaled) where rank_scaled is int64
    floor(rank * scale); damping d = damping_num/damping_den.

    Update rule (all floors exact int64):
        r0(v)   = scale // N
        contrib = sum over in-edges of  r(u) // outdeg(u)
        dshare  = (sum of r over dangling hosts) // N
        r'(v)   = teleport//N + d*(contrib(v) + dshare) // 1

    Fixed iteration count (no float convergence test) keeps the result
    a pure function of the input — the contract every oracle-checked
    operator in this repo holds.
    """
    ranks, _ = _pagerank_loop(
        edges, iterations, damping_num, damping_den, scale, stop_when_stable=False
    )
    return ranks


def pagerank_converge(
    edges: DataFrame,
    max_iterations: int = 100,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> tuple[DataFrame, int]:
    """((host, rank_scaled), rounds): iterate the same exact-integer
    update, stopping EARLY when a round changes no rank — an exact
    fixpoint of the floored map (measured: uniform cold start reaches
    it in ~30-40 rounds at scale 1e12 on random digraphs, far below the
    geometric worst case, because inflow floors snap before the real-
    valued contraction bottoms out). The stability check is an integer
    row count, so the result AND the round count remain pure functions
    of the input — unlike a float-epsilon test.

    Costs one small count action per round (an equi-join of two
    just-checkpointed host-keyed frames). Use it to DISCOVER the budget
    for a graph family; production re-ranks use ``pagerank`` with the
    discovered fixed budget (the oracle-checked contract). Floored
    fixpoints are start-dependent (see ops.linkgraph_incremental — a
    warm start lands up to a few 1e-12 units away), which is why this
    always starts from the uniform vector."""
    return _pagerank_loop(
        edges, max_iterations, damping_num, damping_den, scale, stop_when_stable=True
    )


def _pagerank_loop(
    edges: DataFrame,
    iterations: int,
    damping_num: int,
    damping_den: int,
    scale: int,
    stop_when_stable: bool,
) -> tuple[DataFrame, int]:
    edges = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # one scalar action up front (bounded lineage scalar, same class as
    # run.py's day lists); everything in the loop stays distributed
    n_nodes = nodes.count()
    if n_nodes == 0:
        return (
            nodes.select("host", F.lit(0).cast("long").alias("rank_scaled")),
            0,
        )

    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # static per-iteration join input: edges carrying their src outdegree,
    # partitioned on the join key so each round only shuffles ranks
    edges_od = (
        edges.join(outdeg, "src")
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    dangling_hosts = (
        nodes.join(outdeg.withColumnRenamed("src", "host"), "host", "anti")
        .localCheckpoint(eager=False)
    )

    teleport = ((damping_den - damping_num) * scale) // damping_den
    base = teleport // n_nodes
    ranks = nodes.select("host", F.lit(scale // n_nodes).alias("r"))

    rounds = 0
    for _ in range(iterations):
        inflow = (
            edges_od.join(ranks.withColumnRenamed("host", "src"), "src")
            .select("dst", _fdiv(F.col("r"), F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
            .withColumnRenamed("dst", "host")
        )
        dang = (
            ranks.join(dangling_hosts, "host", "semi")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dangling"))
        )
        new_ranks = (
            nodes.join(inflow, "host", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                (
                    F.lit(base)
                    + _fdiv(
                        F.lit(damping_num)
                        * (
                            F.coalesce(F.col("inflow"), F.lit(0))
                            + _fdiv(F.col("dangling"), F.lit(n_nodes))
                        ),
                        F.lit(damping_den),
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=True)  # scanned twice next round
        )
        if stop_when_stable:
            changed = (
                new_ranks.join(
                    ranks.withColumnRenamed("r", "r_prev"), "host"
                )
                .where(F.col("r") != F.col("r_prev"))
                .count()
            )
            if changed == 0:
                # new == prev: already at the fixpoint, the round was a
                # no-op — do not count it
                break
        ranks = new_ranks
        rounds += 1
    return ranks.select("host", F.col("r").alias("rank_scaled")), rounds


def host_pagerank(
    pages: DataFrame,
    iterations: int = 5,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """HTML pages -> host authority: compose extraction + PageRank."""
    return pagerank(extract_outlinks(pages, url_col, html_col), iterations)


# ---------------------------------------------------------------------------
# DuckDB oracle generators (same arithmetic, independently composed SQL)
# ---------------------------------------------------------------------------


def outlinks_sql(pages_sql: str) -> str:
    """Host-level edge extraction over a (url, html) relation."""
    return f"""
WITH _pages AS ({pages_sql}),
_links AS (
  SELECT lower(regexp_extract(url, '{_HOST_PATTERN_SQL}', 1)) AS src,
         unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
  FROM _pages
)
SELECT DISTINCT src,
       lower(regexp_extract(href, '{_HOST_PATTERN_SQL}', 1)) AS dst
FROM _links
WHERE src <> '' AND lower(regexp_extract(href, '{_HOST_PATTERN_SQL}', 1)) <> ''
  AND src <> lower(regexp_extract(href, '{_HOST_PATTERN_SQL}', 1))
"""


def pagerank_sql(
    edges_sql: str,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> str:
    """Iteration-unrolled CTE chain computing the identical scaled-integer
    fixpoint steps (floor division spelled the same (a - a%b)/b way)."""
    teleport = ((damping_den - damping_num) * scale) // damping_den
    ctes = [
        f"_edges AS (SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst)",
        "_nodes AS (SELECT src AS host FROM _edges UNION SELECT dst FROM _edges)",
        "_nn AS (SELECT COUNT(*) AS n FROM _nodes)",
        "_od AS (SELECT src, COUNT(*) AS od FROM _edges GROUP BY src)",
        f"_r0 AS (SELECT host, CAST(({scale} - {scale} % _nn.n) / _nn.n AS BIGINT) AS r"
        "  FROM _nodes, _nn)",
    ]
    for k in range(iterations):
        prev, cur = f"_r{k}", f"_r{k + 1}"
        flow = (
            f"({damping_num} * (COALESCE(_inf.inflow, 0) + _dg.dshare))"
        )
        ctes.append(f"""{cur} AS (
  SELECT _nodes.host,
         CAST(({teleport} - {teleport} % _nn.n) / _nn.n AS BIGINT)
         + CAST(({flow} - {flow} % {damping_den}) / {damping_den} AS BIGINT) AS r
  FROM _nodes
  LEFT JOIN (
    SELECT e.dst AS host,
           CAST(SUM(CAST((r.r - r.r % o.od) / o.od AS BIGINT)) AS BIGINT) AS inflow
    FROM _edges e
    JOIN {prev} r ON r.host = e.src
    JOIN _od o ON o.src = e.src
    GROUP BY e.dst
  ) _inf ON _inf.host = _nodes.host
  CROSS JOIN (
    SELECT CAST((d - d % _nn.n) / _nn.n AS BIGINT) AS dshare
    FROM (
      SELECT CAST(COALESCE(SUM(CASE WHEN _od.src IS NULL THEN r.r ELSE 0 END), 0) AS BIGINT) AS d
      FROM _r0_nodes r LEFT JOIN _od ON _od.src = r.host
    ), _nn
  ) _dg
  CROSS JOIN _nn
)""".replace("_r0_nodes", prev))
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT host, r AS rank_scaled FROM _r{iterations} ORDER BY host"
    )


def host_pagerank_sql(pages_sql: str, iterations: int = 5) -> str:
    return pagerank_sql(outlinks_sql(pages_sql), iterations)


# ---------------------------------------------------------------------------
# label-propagation communities (round 6)
# ---------------------------------------------------------------------------
#
# Host communities complement PageRank in curation: authority ranks
# hosts globally, communities group them into topical/link-farm
# neighborhoods (a link ring of spam hosts forms a dense community that
# a per-host rank can miss; the reference's analogous grouping is its
# sameAs-edge canonicalization, re-expressed here over the host graph).
# Synchronous label propagation with a deterministic tie-break: every
# round each node adopts the most frequent label among its neighbors
# PLUS one vote for its own current label (the self-vote damps the
# 2-cycle oscillation synchronous LPA exhibits on bipartite-ish
# components — a bridge pair would otherwise swap labels forever),
# ties broken by MIN label — a pure function of the input (no float,
# no randomized visit order), so a DuckDB unrolled-CTE replay
# hash-matches at any parallelism.


def label_propagation(edges: DataFrame, iterations: int = 4) -> DataFrame:
    """(host, community) from a (src, dst) edge relation, treated as
    undirected. community is the propagated label (a host name).

    Scale shape: the symmetrized neighbor relation is computed once,
    pre-partitioned on the join key, and localCheckpointed — each round
    only shuffles the node-sized label relation; vote counts partial-
    aggregate map-side (Zipf hubs never concentrate pre-combine); the
    winner pick is a row_number window over (host) whose groups are
    bounded by a node's distinct neighbor-label count. Labels are
    eagerly checkpointed per round (iterative-lineage rule measured in
    BENCH/cc_skew.json).
    """
    from pyspark.sql.window import Window

    sym = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("dst")
        .localCheckpoint(eager=False)
    )
    # every node appears as src in the symmetrized relation
    labels = (
        und.select(F.col("src").alias("host"))
        .distinct()
        .select("host", F.col("host").alias("label"))
    )
    w = Window.partitionBy("host").orderBy(F.col("c").desc(), F.col("label").asc())
    for _ in range(iterations):
        votes = (
            und.join(labels.withColumnRenamed("host", "dst"), "dst")
            .select(F.col("src").alias("host"), "label")
            .unionAll(labels)  # self-vote
            .groupBy("host", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("host", "label")
            .localCheckpoint(eager=True)
        )
    return labels.select("host", F.col("label").alias("community"))


def host_communities(
    pages: DataFrame,
    iterations: int = 4,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """HTML pages -> host communities: compose extraction + propagation."""
    return label_propagation(extract_outlinks(pages, url_col, html_col), iterations)


def label_propagation_sql(edges_sql: str, iterations: int = 4) -> str:
    """Iteration-unrolled CTE chain replaying the identical synchronous
    min-tie-break label propagation."""
    ctes = [
        f"_e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst)",
        "_und AS (SELECT src, dst FROM _e UNION SELECT dst, src FROM _e)",
        "_l0 AS (SELECT DISTINCT src AS host, src AS label FROM _und)",
    ]
    for k in range(iterations):
        ctes.append(
            f"""_l{k + 1} AS (
  SELECT host, label FROM (
    SELECT host, label,
           row_number() OVER (PARTITION BY host ORDER BY c DESC, label ASC) AS rn
    FROM (
      SELECT host, label, COUNT(*) AS c FROM (
        SELECT u.src AS host, l.label
        FROM _und u JOIN _l{k} l ON l.host = u.dst
        UNION ALL
        SELECT host, label FROM _l{k}
      ) GROUP BY host, label
    )
  ) WHERE rn = 1
)"""
        )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT host, label AS community FROM _l{iterations} ORDER BY host"
    )


def host_communities_sql(pages_sql: str, iterations: int = 4) -> str:
    return label_propagation_sql(outlinks_sql(pages_sql), iterations)


# ---------------------------------------------------------------------------
# anchor-text surface-form harvesting (round 6)
# ---------------------------------------------------------------------------
#
# The web-scale analogue of the reference's gazetteer construction
# (esmarc builds its authority surface forms from curated dumps;
# web-scale entity linking harvests them from ANCHOR TEXT — the tokens
# other pages use when linking to a host are that host's strongest
# surface forms). Output feeds pipeline/mentions.py as a gazetteer:
# (host, token, n_pages) where n_pages counts DISTINCT linking pages,
# so a single page repeating a link a thousand times casts one vote.
#
# Scale shape: element extraction and per-element group parsing are
# in-array Catalyst (one regexp_extract_all pass over html, then
# row-local transforms); the only shuffle is the distinct + count on
# (dst, token, src) — both partial-aggregate map-side. All-integer
# output: no float determinism caveats in the oracle.

# one RE2-safe pass: whole <a ...>...</a> elements; href + visible text
# re-extracted per element (Spark regexp_extract_all returns ONE group,
# so two groups are pulled row-locally from the matched element)
ANCHOR_PATTERN = r'<a href="[^"]*"[^>]*>[^<]*</a>'


def anchor_votes(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Distinct (host, token, src) anchor votes: linking page host
    ``src`` used ``token`` in anchor text pointing at ``host``. This is
    the per-dump unit of anchor-gazetteer state (the distinct-vote
    relation unions losslessly across dumps, unlike the thresholded
    counts), persisted by ``ops.linkgraph_incremental.AnchorState``."""
    elems = pages.select(
        host_of(F.col(url_col)).alias("src"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_PATTERN), F.lit(0))
        ).alias("elem"),
    )
    toks = elems.select(
        "src",
        host_of(F.regexp_extract("elem", r'href="([^"]*)"', 1)).alias("dst"),
        F.explode(
            F.split(F.lower(F.regexp_extract("elem", r">([^<]*)</a>", 1)), " ")
        ).alias("token"),
    ).where(
        (F.col("dst") != "")
        & (F.col("src") != F.col("dst"))
        & (F.col("token") != "")
    )
    return toks.select(F.col("dst").alias("host"), "token", "src").distinct()


def gazetteer_from_votes(votes: DataFrame, min_pages: int = 2) -> DataFrame:
    """(host, token, n_pages) from a distinct-vote relation — the
    count + threshold half of :func:`harvest_anchor_texts`."""
    return (
        votes.groupBy("host", "token")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .where(F.col("n_pages") >= min_pages)
    )


def harvest_anchor_texts(
    pages: DataFrame,
    min_pages: int = 2,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(host, token, n_pages): lowercased anchor-text tokens pointing at
    a host, counted by distinct linking page, thresholded at min_pages.
    Self-links are excluded (a site's own nav anchors describe its
    layout, not its name)."""
    return gazetteer_from_votes(
        anchor_votes(pages, url_col, html_col), min_pages
    )


def harvest_anchor_texts_sql(pages_sql: str, min_pages: int = 2) -> str:
    """DuckDB mirror: identical element pattern, identical per-element
    group extraction, identical distinct-page counting."""
    return f"""
WITH _pages AS ({pages_sql}),
_elems AS (
  SELECT lower(regexp_extract(url, '{_HOST_PATTERN_SQL}', 1)) AS src,
         unnest(regexp_extract_all(html, '<a href="[^"]*"[^>]*>[^<]*</a>')) AS elem
  FROM _pages
),
_toks AS (
  SELECT src,
         lower(regexp_extract(regexp_extract(elem, 'href="([^"]*)"', 1),
                              '{_HOST_PATTERN_SQL}', 1)) AS dst,
         unnest(string_split(lower(regexp_extract(elem, '>([^<]*)</a>', 1)), ' ')) AS token
  FROM _elems
)
SELECT dst AS host, token, CAST(COUNT(*) AS BIGINT) AS n_pages
FROM (SELECT DISTINCT dst, token, src FROM _toks
      WHERE dst <> '' AND src <> dst AND token <> '')
GROUP BY dst, token
HAVING COUNT(*) >= {min_pages}
"""


# ---------------------------------------------------------------------------
# degree-ordered triangle counting (round 6)
# ---------------------------------------------------------------------------
#
# Triangle participation separates organic neighborhoods (high local
# clustering) from spam farms and scraped link lists (stars/chains with
# near-zero closure) — a standard web-graph quality feature alongside
# PageRank and communities. The naive formulation (self-join edges on a
# shared endpoint) fans out O(deg^2) on every Zipf hub and dies at web
# scale; the classical fix implemented here orients every undirected
# edge from its LOWER-degree endpoint to its higher (ties by name), so
# each node's out-degree is bounded by O(sqrt(m)) and the wedge join's
# worst key costs sqrt(m)^2 = m — hub-proof by construction, no
# salting needed.


def count_triangles(edges: DataFrame) -> DataFrame:
    """(host, n_triangles) — per-host triangle participation over the
    undirected, deduplicated host graph. Every triangle credits all
    three corners. Pure integer output; the DuckDB oracle replays the
    identical orientation and joins."""
    sym = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        sym.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("host"))
        .unionAll(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient low-degree -> high-degree (ties: lexicographic), bounding
    # out-degree at O(sqrt(m))
    da = deg.withColumnRenamed("host", "a").withColumnRenamed("deg", "deg_a")
    db = deg.withColumnRenamed("host", "b").withColumnRenamed("deg", "deg_b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        .localCheckpoint(eager=False)
    )
    # wedges from a shared low-degree source, closed by a third oriented
    # edge in either direction
    w1 = oriented.select(F.col("u").alias("p"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u").alias("p"), F.col("v").alias("y"))
    wedges = w1.join(w2, "p").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"]).select(
        F.col("p").alias("c1"), F.col("x").alias("c2"), F.col("y").alias("c3")
    )
    corners = (
        tris.select(F.col("c1").alias("host"))
        .unionAll(tris.select(F.col("c2").alias("host")))
        .unionAll(tris.select(F.col("c3").alias("host")))
    )
    return corners.groupBy("host").agg(F.count(F.lit(1)).alias("n_triangles"))


def count_triangles_sql(edges_sql: str) -> str:
    """DuckDB oracle: identical orientation, wedge, and closure joins."""
    return f"""
WITH _sym AS (SELECT src, dst FROM ({edges_sql}) WHERE src <> dst),
_und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM _sym
),
_deg AS (
  SELECT host, COUNT(*) AS deg FROM (
    SELECT a AS host FROM _und UNION ALL SELECT b FROM _und
  ) GROUP BY host
),
_oriented AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.a ELSE u.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.b ELSE u.a END AS v
  FROM _und u
  JOIN _deg da ON da.host = u.a
  JOIN _deg db ON db.host = u.b
),
_tris AS (
  SELECT w1.u AS c1, w1.v AS c2, w2.v AS c3
  FROM _oriented w1
  JOIN _oriented w2 ON w2.u = w1.u AND w1.v < w2.v
  JOIN (SELECT least(u, v) AS x, greatest(u, v) AS y FROM _oriented) c
    ON c.x = w1.v AND c.y = w2.v
)
SELECT host, COUNT(*) AS n_triangles FROM (
  SELECT c1 AS host FROM _tris
  UNION ALL SELECT c2 FROM _tris
  UNION ALL SELECT c3 FROM _tris
) GROUP BY host
"""


def clustering_coefficient(edges: DataFrame, scale: int = 10**6) -> DataFrame:
    """(host, deg, n_triangles, coef_scaled) — local clustering
    coefficient per host: coef = 2*T / (deg*(deg-1)), kept as the exact
    int64 floor of coef*scale (the repo's scaled-integer recipe: float
    division would break cross-engine/cross-parallelism hash identity).
    Hosts with deg < 2 get 0. Spam farms and scraped link lists sit
    near 0 (stars close nothing); organic neighborhoods sit high —
    the standard web-graph quality feature next to PageRank and
    communities.

    Scale shape: one extra groupBy (degree) + a left join against the
    hub-proof triangle relation; everything else inherits
    count_triangles' degree-ordered bounds."""
    sym = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = sym.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("host"))
        .unionAll(und.select(F.col("b").alias("host")))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = count_triangles(edges)
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    denom = F.col("deg") * (F.col("deg") - 1)
    return (
        deg.join(tri, "host", "left")
        .select(
            "host",
            "deg",
            t.alias("n_triangles"),
            F.when(F.col("deg") < 2, F.lit(0).cast("long"))
            .otherwise(_fdiv(F.lit(2) * t * F.lit(scale), denom))
            .alias("coef_scaled"),
        )
    )


def clustering_coefficient_sql(edges_sql: str, scale: int = 10**6) -> str:
    """DuckDB oracle: identical degree/triangle relations, identical
    exact floor division."""
    num = f"(2 * COALESCE(t.n_triangles, 0) * {scale})"
    den = "(d.deg * (d.deg - 1))"
    return f"""
WITH _sym AS (SELECT src, dst FROM ({edges_sql}) WHERE src <> dst),
_und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM _sym
),
_deg AS (
  SELECT host, COUNT(*) AS deg FROM (
    SELECT a AS host FROM _und UNION ALL SELECT b FROM _und
  ) GROUP BY host
),
_tri AS ({count_triangles_sql(edges_sql)})
SELECT host, deg,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.deg < 2 THEN 0
            ELSE CAST(({num} - {num} % {den}) / {den} AS BIGINT) END
         AS coef_scaled
FROM _deg d LEFT JOIN _tri t USING (host)
"""
