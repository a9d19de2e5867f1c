"""sitemaps.org XML parsing and fetch-list derivation — the discovery
side of the crawl loop (robots.txt gates what may be fetched,
``ops.robots``; sitemaps declare what SHOULD be fetched and when it
last changed).

Reference analogue: none (esmarc consumes finished dumps); this is the
crawl-scheduling surface a Common-Crawl-style pipeline pairs with
``ops.revisits`` (classify what changed) and the streaming drop-box.

Parsing is the ``ops.linkgraph.ANCHOR_PATTERN`` recipe: one RE2-safe
``regexp_extract_all`` pulls whole ``<url>...</url>`` elements, then
per-element group extraction runs row-locally — no XML library, no
Python, one pass over the document. Supported subset = the sitemaps.org
required core: ``<loc>`` (required; entries without it drop),
``<lastmod>`` (W3C date or datetime, date part consumed), optional
``<changefreq>`` and ``<priority>`` (exposed as an exact permille int —
a float column could not hash-match). ``<sitemapindex>`` nesting is out
of scope by design: index files point at OTHER files to fetch, which is
an I/O concern for the fetcher, not a row transform (feed child
sitemaps back through this parser).

Scale shape: parse is map-only; the fetch-list join is equi on url with
partial-agg max on the crawled side — the sitemap relation is bounded
by declared urls (50k per file by spec), orders of magnitude below the
crawl corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

URL_ELEMENT_PATTERN = r"(?s)<url>.*?</url>"  # (?s): elements span lines


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, url, lastmod date|NULL, changefreq string|NULL,
    priority_permille bigint|NULL) — one row per ``<url>`` element with
    a non-empty ``<loc>``."""
    elems = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(URL_ELEMENT_PATTERN), F.lit(0)
            )
        ).alias("elem"),
    )
    loc = F.regexp_extract("elem", r"<loc>\s*([^<\s]+)\s*</loc>", 1)
    lastmod = F.regexp_extract("elem", r"<lastmod>\s*(\d{4}-\d{2}-\d{2})", 1)
    freq = F.regexp_extract("elem", r"<changefreq>\s*([a-z]+)\s*</changefreq>", 1)
    prio = F.regexp_extract("elem", r"<priority>\s*([01](?:\.\d+)?)\s*</priority>", 1)
    return elems.select(
        "host",
        loc.alias("url"),
        F.when(lastmod != "", F.to_date(lastmod)).alias("lastmod"),
        F.when(freq != "", freq).alias("changefreq"),
        F.when(
            prio != "",
            (prio.cast("decimal(5,3)") * 1000).cast("bigint"),
        ).alias("priority_permille"),
    ).where(F.col("url") != "")


def fetch_candidates(
    entries: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Sitemap entries worth fetching: never crawled, or ``lastmod``
    strictly after the LATEST stored capture date of that url. Entries
    without lastmod count as unchanged when already crawled (the
    conservative read — pair with ``changefreq``-based policies
    upstream if staleness refresh is wanted). Adds ``last_crawled``
    (date|NULL) and ``reason`` ('new' | 'modified')."""
    latest = crawled.groupBy(F.col(url_col).alias("url")).agg(
        F.max(F.to_date(F.col(ts_col))).alias("last_crawled")
    )
    j = entries.join(latest, "url", "left")
    entry_cols = [c for c in entries.columns if c != "url"]
    return j.where(
        F.col("last_crawled").isNull()
        | (F.col("lastmod").isNotNull() & (F.col("lastmod") > F.col("last_crawled")))
    ).select(
        *entry_cols[:1],  # host leads, as in the parse output
        "url",
        *entry_cols[1:],
        "last_crawled",
        F.when(F.col("last_crawled").isNull(), F.lit("new"))
        .otherwise(F.lit("modified"))
        .alias("reason"),
    )


def parse_sitemaps_sql(sitemaps_select: str) -> str:
    """DuckDB replay: identical element pattern and group extraction
    (RE2 lazy ``.*?`` matches Java's here — no backtracking-dependent
    construct in the pattern)."""
    return f"""
WITH _sm AS ({sitemaps_select}),
_elems AS (
  SELECT host,
         unnest(regexp_extract_all(sitemap_xml, '(?s)<url>.*?</url>')) AS elem
  FROM _sm
),
_fields AS (
  SELECT host,
         regexp_extract(elem, '<loc>\\s*([^<\\s]+)\\s*</loc>', 1) AS url,
         regexp_extract(elem, '<lastmod>\\s*(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) AS lastmod_s,
         regexp_extract(elem, '<changefreq>\\s*([a-z]+)\\s*</changefreq>', 1) AS freq_s,
         regexp_extract(elem, '<priority>\\s*([01](\\.\\d+)?)\\s*</priority>', 1) AS prio_s
  FROM _elems
)
SELECT host, url,
       CASE WHEN lastmod_s <> '' THEN CAST(lastmod_s AS DATE) END AS lastmod,
       CASE WHEN freq_s <> '' THEN freq_s END AS changefreq,
       CASE WHEN prio_s <> '' THEN
         CAST(CAST(prio_s AS DECIMAL(5,3)) * 1000 AS BIGINT) END
         AS priority_permille
FROM _fields WHERE url <> ''
"""


def fetch_candidates_sql(entries_sql: str, crawled_select: str) -> str:
    """DuckDB replay of :func:`fetch_candidates` over the parsed
    entries and a (url, warc_ts) crawl log."""
    return f"""
WITH _e AS ({entries_sql}),
_latest AS (
  SELECT url, MAX(CAST(warc_ts AS DATE)) AS last_crawled
  FROM ({crawled_select}) GROUP BY url
),
_j AS (SELECT _e.*, _latest.last_crawled FROM _e LEFT JOIN _latest USING (url))
SELECT *, CASE WHEN last_crawled IS NULL THEN 'new' ELSE 'modified' END AS reason
FROM _j
WHERE last_crawled IS NULL
   OR (lastmod IS NOT NULL AND lastmod > last_crawled)
"""


def schedule_frontier(
    candidates: DataFrame,
    host_ranks: DataFrame | None = None,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Politeness-aware crawl frontier: assign each candidate a per-host
    ``wave`` (1-based FIFO slot — a polite fetcher issues at most one
    request per host per wave, so wave k is the k-th politeness round),
    ordered inside the host by declared priority (DESC, NULLS LAST),
    then lastmod recency (DESC, NULLS LAST), then url (the bytewise
    pin). When ``host_ranks`` (host, rank_scaled — ops.linkgraph.
    pagerank output) is given, ``rank_scaled`` is attached (NULL for
    unranked hosts) so the fetcher can order hosts inside a wave by
    authority.

    Scale shape: one window PARTITIONED BY HOST over that host's
    declared urls (bounded by sitemap size, never a corpus sort) plus a
    left equi-join on host for the authority dim. There is deliberately
    NO global ordering here — a total order over 10^12 candidates is a
    full sort; (wave, rank_scaled, host) gives the fetcher everything a
    global order would."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(host_col).orderBy(
        F.col("priority_permille").desc_nulls_last(),
        F.col("lastmod").desc_nulls_last(),
        F.col(url_col).asc(),
    )
    out = candidates.withColumn("wave", F.row_number().over(w).cast("long"))
    if host_ranks is not None:
        out = out.join(
            host_ranks.select(
                F.col("host").alias(host_col), "rank_scaled"
            ),
            host_col,
            "left",
        )
    return out


def schedule_frontier_sql(
    candidates_sql: str, host_ranks_sql: str | None = None
) -> str:
    """DuckDB replay: identical window and join."""
    rank_join = (
        f"LEFT JOIN ({host_ranks_sql}) r USING (host)" if host_ranks_sql else ""
    )
    rank_col = ", r.rank_scaled" if host_ranks_sql else ""
    return f"""
WITH _c AS ({candidates_sql}),
_w AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY host
      ORDER BY priority_permille DESC NULLS LAST,
               lastmod DESC NULLS LAST, url ASC) AS BIGINT) AS wave
  FROM _c
)
SELECT _w.*{rank_col} FROM _w {rank_join}
"""


SITEMAP_ELEMENT_PATTERN = r"(?s)<sitemap>.*?</sitemap>"


def parse_sitemap_index(
    indexes: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, sitemap_url, lastmod date|NULL) from ``<sitemapindex>``
    files — the fetch WORKLIST of child sitemap files (feed the fetched
    children back through :func:`parse_sitemaps`); same element-regex
    recipe, ``<loc>`` required."""
    elems = indexes.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(SITEMAP_ELEMENT_PATTERN), F.lit(0)
            )
        ).alias("elem"),
    )
    loc = F.regexp_extract("elem", r"<loc>\s*([^<\s]+)\s*</loc>", 1)
    lastmod = F.regexp_extract("elem", r"<lastmod>\s*(\d{4}-\d{2}-\d{2})", 1)
    return elems.select(
        "host",
        loc.alias("sitemap_url"),
        F.when(lastmod != "", F.to_date(lastmod)).alias("lastmod"),
    ).where(F.col("sitemap_url") != "")


def parse_sitemap_index_sql(indexes_select: str) -> str:
    """DuckDB replay of :func:`parse_sitemap_index`."""
    return f"""
WITH _idx AS ({indexes_select}),
_elems AS (
  SELECT host,
         unnest(regexp_extract_all(sitemap_xml, '(?s)<sitemap>.*?</sitemap>')) AS elem
  FROM _idx
)
SELECT host,
       regexp_extract(elem, '<loc>\\s*([^<\\s]+)\\s*</loc>', 1) AS sitemap_url,
       CASE WHEN regexp_extract(elem, '<lastmod>\\s*(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) <> ''
            THEN CAST(regexp_extract(elem,
                 '<lastmod>\\s*(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) AS DATE) END AS lastmod
FROM _elems
WHERE regexp_extract(elem, '<loc>\\s*([^<\\s]+)\\s*</loc>', 1) <> ''
"""


def schedule_polite_frontier(
    candidates: DataFrame,
    delays: DataFrame | None = None,
    default_delay_sec: int = 1,
    host_ranks: DataFrame | None = None,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """:func:`schedule_frontier` plus the politeness CLOCK: joins the
    per-host ``crawl_delays`` dim (``ops.robots.crawl_delays``; hosts
    without a declared delay take ``default_delay_sec``) and adds
    ``earliest_fetch_sec`` = (wave - 1) * delay — the earliest offset,
    in seconds from crawl start, at which this url may be fetched
    without violating the host's declared rate. Same scale shape as the
    base frontier (per-host window + two host-keyed dim joins)."""
    out = schedule_frontier(candidates, host_ranks, host_col, url_col)
    if delays is not None:
        out = out.join(
            delays.select(
                F.col("host").alias(host_col), "crawl_delay_sec"
            ),
            host_col,
            "left",
        )
    else:
        out = out.withColumn(
            "crawl_delay_sec", F.lit(None).cast("long")
        )
    return out.withColumn(
        "crawl_delay_sec",
        F.coalesce(F.col("crawl_delay_sec"), F.lit(default_delay_sec)),
    ).withColumn(
        "earliest_fetch_sec",
        (F.col("wave") - 1) * F.col("crawl_delay_sec"),
    )


def schedule_polite_frontier_sql(
    candidates_sql: str,
    delays_sql: str | None = None,
    default_delay_sec: int = 1,
    host_ranks_sql: str | None = None,
) -> str:
    """DuckDB replay of :func:`schedule_polite_frontier`."""
    base = schedule_frontier_sql(candidates_sql, host_ranks_sql)
    delay_join = (
        f"LEFT JOIN ({delays_sql}) dl USING (host)" if delays_sql else ""
    )
    delay_src = "dl.crawl_delay_sec" if delays_sql else "NULL"
    return f"""
WITH _base AS ({base})
SELECT _base.*,
       coalesce({delay_src}, {default_delay_sec}) AS crawl_delay_sec,
       CAST((wave - 1) * coalesce({delay_src}, {default_delay_sec})
            AS BIGINT) AS earliest_fetch_sec
FROM _base {delay_join}
"""
