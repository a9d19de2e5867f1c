"""robots.txt parsing and URL gating — the politeness/compliance gate a
Common-Crawl-style pipeline applies before (re)fetching or keeping a
page (RFC 9309, the Robots Exclusion Protocol).

Reference analogue: esmarc consumes already-fetched dumps and has no
crawl-compliance surface; a web-scale corpus pipeline needs one (CCBot
itself honors REP, and curation stacks re-check it when licensing
requires post-hoc removal). Implemented REP subset = what RFC 9309
REQUIRES: grouped ``User-agent`` blocks (stacked UA lines share one
block), ``Allow``/``Disallow`` rules for the ``*`` agent, ``#``
comments, ``*`` wildcards and the ``$`` end-anchor in rule paths,
longest-rule-wins specificity with Allow winning length ties, and
unmatched URLs allowed. Out of scope (documented, not silently wrong):
per-bot agent selection (callers wanting a specific UA pre-filter their
robots corpus), percent-encoding normalization (pair with
``ops.urlnorm`` upstream), and ``Sitemap:`` lines (``ops.sitemap``
consumes sitemap files directly). The de-facto ``Crawl-delay``
extension IS consumed — :func:`crawl_delays` below feeds the
politeness interval of ``ops.sitemap.schedule_frontier``.

Cross-engine determinism: rule parsing is pure string/window Catalyst;
rule paths compile to regex IN-ENGINE via a shared escape chain (the
one canonical metachar class below feeds both engines), so the DuckDB
oracle replays parse, compile, match, and tie-break exactly.

Scale shape: parsing windows partition by HOST over a single robots.txt
(≤ a few hundred lines each — RFC 9309 caps parse obligation at 500
KiB), so no window ever sees more than one file. The gate is an
equi-join on host (rules relation ~hosts x tens of rules, orders of
magnitude below the page corpus; broadcast when it fits, AQE handles
host skew otherwise) with per-page fan-out bounded by that host's rule
count, then a partial-agg min(struct) picks the winning rule per page —
no window over pages, no cartesian, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from esmarc_spark.ops.urlnorm import host_of

# regex metachars to escape in rule paths — every special EXCEPT '*'
# (the REP wildcard, translated to '.*' after escaping). One canonical
# string: Spark receives it via F.lit (verbatim through py4j), DuckDB
# embeds it in SQL text (its literals keep backslashes), and both
# engines' regex dialects read the SAME bytes the same way.
_META_CLASS = "([.^$+?(){}\\[\\]|\\\\])"
_WS_TRIM = "^[ \\t\\r]+|[ \\t\\r]+$"


def _path_pattern(path: Column) -> Column:
    """Compile a REP rule path to an anchored regex, in-engine."""
    dollar = path.endswith("$")
    body = F.when(dollar, F.substring(path, 1, F.length(path) - 1)).otherwise(path)
    esc = F.regexp_replace(body, F.lit(_META_CLASS), F.lit("\\\\$1"))
    return F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(dollar, F.lit("$")).otherwise(F.lit("")),
    )


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """(host, directive, path, rule_len, pattern): the ``*``-agent rule
    set of each host's robots.txt. A ``User-agent`` line starts a new
    block unless it directly follows another UA line (stacked agents
    share the block, RFC 9309 §2.1); rules belong to the nearest
    preceding block and survive iff that block names agent ``*``.
    Empty-path rules (``Disallow:`` = allow all) are dropped."""
    w = Window.partitionBy("host").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("pos", "_raw"),
    ).select(
        "host",
        "pos",
        F.regexp_replace(
            F.regexp_replace("_raw", F.lit("#.*$"), F.lit("")),
            F.lit(_WS_TRIM),
            F.lit(""),
        ).alias("line"),
    )
    fields = lines.select(
        "host",
        "pos",
        F.lower(
            F.regexp_replace(
                F.regexp_extract("line", r"^([^:]+):", 1),
                F.lit(_WS_TRIM),
                F.lit(""),
            )
        ).alias("key"),
        F.regexp_replace(
            F.regexp_replace("line", r"^[^:]*:", ""), F.lit(_WS_TRIM), F.lit("")
        ).alias("value"),
    )
    flagged = fields.select(
        "host",
        "pos",
        "key",
        "value",
        (F.col("key") == "user-agent").alias("is_ua"),
    ).select(
        "*",
        (
            F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
        ).alias("_starts_block"),
    )
    marked = flagged.select(
        "*",
        F.sum(F.col("_starts_block").cast("int")).over(run).alias("block_id"),
    )
    with_block = marked.select(
        "*",
        F.max(F.when(F.col("is_ua"), F.col("block_id"))).over(run).alias("rule_block"),
    )
    star_blocks = (
        with_block.where(F.col("is_ua") & (F.col("value") == "*"))
        .select("host", F.col("block_id").alias("rule_block"))
        .distinct()
    )
    rules = with_block.where(
        F.col("key").isin("allow", "disallow") & (F.col("value") != "")
    ).join(star_blocks, ["host", "rule_block"], "semi")
    return rules.select(
        "host",
        F.col("key").alias("directive"),
        F.col("value").alias("path"),
        F.length("value").cast("long").alias("rule_len"),
        _path_pattern(F.col("value")).alias("pattern"),
    )


def url_path_of(url: Column) -> Column:
    """Path + query of a url ('/' when absent) — the string REP rules
    match against (fragments are never sent to servers, but crawl
    corpora rarely carry them; normalize upstream if yours do)."""
    p = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_verdicts(
    pages: DataFrame,
    rules: DataFrame,
    key_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """(key, url, allowed, rule, directive) per page: the winning rule
    under longest-match specificity (ties -> ``allow`` wins, then
    bytewise-min rule path purely to pin the REPORTED rule; the verdict
    is already determined). Pages whose host has no matching rule — or
    no robots at all — are allowed with NULL rule."""
    sel = pages.select(
        F.col(key_col).alias("key"),
        F.col(url_col).alias("url"),
        host_of(F.col(url_col)).alias("host"),
        url_path_of(F.col(url_col)).alias("path"),
    )
    matched = (
        sel.join(rules.withColumnRenamed("path", "rule"), "host")
        .where(F.expr("path rlike pattern"))
        .groupBy("key")
        .agg(
            F.min(
                F.struct(
                    (-F.col("rule_len")).alias("_nl"),
                    F.col("directive").alias("_d"),
                    F.col("rule").alias("_r"),
                )
            ).alias("_win")
        )
        .select(
            "key",
            (F.col("_win._d") == "allow").alias("_allowed"),
            F.col("_win._r").alias("rule"),
            F.col("_win._d").alias("directive"),
        )
    )
    return (
        sel.select("key", "url")
        .join(matched, "key", "left")
        .select(
            "key",
            "url",
            F.coalesce(F.col("_allowed"), F.lit(True)).alias("allowed"),
            "rule",
            "directive",
        )
    )


def robots_gate(
    pages: DataFrame,
    robots: DataFrame,
    key_col: str = "doc_id",
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Drop pages a ``*``-agent robots.txt disallows (anti-join on the
    disallowed keys; page columns pass through untouched)."""
    verdicts = robots_verdicts(
        pages, parse_robots(robots, host_col, robots_col), key_col, url_col
    )
    return pages.join(
        verdicts.where(~F.col("allowed")).select(F.col("key").alias(key_col)),
        key_col,
        "anti",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def parse_robots_sql(robots_select: str) -> str:
    """Replay of :func:`parse_robots`: same trim/comment/first-colon
    parsing, same UA-block windows, same escape chain (RE2 reads the
    identical metachar class; DuckDB regexp_replace needs the 'g' flag
    Spark applies implicitly, and spells group refs ``\\1``)."""
    return f"""
WITH _robots AS ({robots_select}),
_lines AS (
  SELECT host, pos,
         regexp_replace(regexp_replace(raw, '#.*$', ''),
                        '{_WS_TRIM}', '', 'g') AS line
  FROM (
    SELECT host,
           generate_subscripts(string_split(robots_txt, chr(10)), 1) AS pos,
           unnest(string_split(robots_txt, chr(10))) AS raw
    FROM _robots
  )
),
_fields AS (
  SELECT host, pos,
         lower(regexp_replace(regexp_extract(line, '^([^:]+):', 1),
                              '{_WS_TRIM}', '', 'g')) AS key,
         regexp_replace(regexp_replace(line, '^[^:]*:', ''),
                        '{_WS_TRIM}', '', 'g') AS value
  FROM _lines
),
_flagged AS (
  SELECT *, key = 'user-agent' AS is_ua,
         (key = 'user-agent'
          AND NOT coalesce(lag(key = 'user-agent')
              OVER (PARTITION BY host ORDER BY pos), false)) AS starts_block
  FROM _fields
),
_marked AS (
  SELECT *, SUM(CASE WHEN starts_block THEN 1 ELSE 0 END)
           OVER (PARTITION BY host ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS block_id
  FROM _flagged
),
_blocked AS (
  SELECT *, MAX(CASE WHEN is_ua THEN block_id END)
           OVER (PARTITION BY host ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS rule_block
  FROM _marked
),
_star AS (
  SELECT DISTINCT host, block_id AS rule_block FROM _blocked
  WHERE is_ua AND value = '*'
),
_rules AS (
  SELECT b.* FROM _blocked b JOIN _star s USING (host, rule_block)
  WHERE b.key IN ('allow', 'disallow') AND b.value <> ''
)
SELECT host, key AS directive, value AS path,
       CAST(length(value) AS BIGINT) AS rule_len,
       '^' ||
       replace(
         regexp_replace(
           CASE WHEN value LIKE '%$'
                THEN substr(value, 1, length(value) - 1) ELSE value END,
           '{_META_CLASS}', '\\\\\\1', 'g'),
         '*', '.*') ||
       CASE WHEN value LIKE '%$' THEN '$' ELSE '' END AS pattern
FROM _rules
"""


def robots_verdicts_sql(pages_select: str, robots_select: str) -> str:
    """Replay of :func:`robots_verdicts` with the winner picked by a
    row_number window ordered (rule_len DESC, directive ASC, rule ASC)
    — a different formulation of the same deterministic pick."""
    return f"""
WITH _rules AS ({parse_robots_sql(robots_select)}),
_sel AS (
  SELECT key, url,
         lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
           AS host,
         CASE WHEN regexp_replace(url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', '') = '' THEN '/'
              ELSE regexp_replace(url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', '') END AS path
  FROM ({pages_select})
),
_matched AS (
  SELECT key, directive, r.path AS rule,
         row_number() OVER (PARTITION BY key
                            ORDER BY rule_len DESC, directive ASC,
                                     r.path ASC) AS rn
  FROM _sel s JOIN _rules r USING (host)
  WHERE regexp_matches(s.path, r.pattern)
)
SELECT s.key, s.url,
       coalesce(m.directive = 'allow', true) AS allowed,
       m.rule, m.directive
FROM _sel s LEFT JOIN (SELECT * FROM _matched WHERE rn = 1) m USING (key)
"""


def crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """(host, crawl_delay_sec) from the ``*``-agent block's
    ``Crawl-delay`` line (a de-facto extension most crawlers honor;
    RFC 9309 leaves it undefined, so only integer-second values are
    consumed and the MINIMUM wins if a file repeats it). Hosts without
    a star block or without the directive are absent — the fetcher's
    default politeness interval applies. Composes with
    ``ops.sitemap.schedule_frontier``: earliest fetch time of wave k on
    a host is (k - 1) * crawl_delay_sec."""
    w = Window.partitionBy("host").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("pos", "_raw"),
    ).select(
        "host",
        "pos",
        F.regexp_replace(
            F.regexp_replace("_raw", F.lit("#.*$"), F.lit("")),
            F.lit(_WS_TRIM),
            F.lit(""),
        ).alias("line"),
    )
    fields = lines.select(
        "host",
        "pos",
        F.lower(
            F.regexp_replace(
                F.regexp_extract("line", r"^([^:]+):", 1),
                F.lit(_WS_TRIM),
                F.lit(""),
            )
        ).alias("key"),
        F.regexp_replace(
            F.regexp_replace("line", r"^[^:]*:", ""), F.lit(_WS_TRIM), F.lit("")
        ).alias("value"),
    )
    flagged = fields.select(
        "*",
        (
            (F.col("key") == "user-agent")
            & ~F.coalesce(
                F.lag(F.col("key") == "user-agent").over(w), F.lit(False)
            )
        ).alias("_starts_block"),
        (F.col("key") == "user-agent").alias("is_ua"),
    )
    marked = flagged.select(
        "*",
        F.sum(F.col("_starts_block").cast("int")).over(run).alias("block_id"),
    ).select(
        "*",
        F.max(F.when(F.col("is_ua"), F.col("block_id"))).over(run).alias(
            "rule_block"
        ),
    )
    star = (
        marked.where(F.col("is_ua") & (F.col("value") == "*"))
        .select("host", F.col("block_id").alias("rule_block"))
        .distinct()
    )
    return (
        marked.where(
            (F.col("key") == "crawl-delay") & F.col("value").rlike("^[0-9]+$")
        )
        .join(star, ["host", "rule_block"], "semi")
        .groupBy("host")
        .agg(F.min(F.col("value").cast("long")).alias("crawl_delay_sec"))
    )


def crawl_delays_sql(robots_select: str) -> str:
    """DuckDB replay of :func:`crawl_delays` (same block windows as
    parse_robots_sql)."""
    return f"""
WITH _robots AS ({robots_select}),
_lines AS (
  SELECT host, pos,
         regexp_replace(regexp_replace(raw, '#.*$', ''),
                        '{_WS_TRIM}', '', 'g') AS line
  FROM (
    SELECT host,
           generate_subscripts(string_split(robots_txt, chr(10)), 1) AS pos,
           unnest(string_split(robots_txt, chr(10))) AS raw
    FROM _robots
  )
),
_fields AS (
  SELECT host, pos,
         lower(regexp_replace(regexp_extract(line, '^([^:]+):', 1),
                              '{_WS_TRIM}', '', 'g')) AS key,
         regexp_replace(regexp_replace(line, '^[^:]*:', ''),
                        '{_WS_TRIM}', '', 'g') AS value
  FROM _lines
),
_flagged AS (
  SELECT *, key = 'user-agent' AS is_ua,
         (key = 'user-agent'
          AND NOT coalesce(lag(key = 'user-agent')
              OVER (PARTITION BY host ORDER BY pos), false)) AS starts_block
  FROM _fields
),
_marked AS (
  SELECT *, SUM(CASE WHEN starts_block THEN 1 ELSE 0 END)
           OVER (PARTITION BY host ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS block_id
  FROM _flagged
),
_blocked AS (
  SELECT *, MAX(CASE WHEN is_ua THEN block_id END)
           OVER (PARTITION BY host ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS rule_block
  FROM _marked
),
_star AS (
  SELECT DISTINCT host, block_id AS rule_block FROM _blocked
  WHERE is_ua AND value = '*'
)
SELECT b.host, CAST(MIN(CAST(b.value AS BIGINT)) AS BIGINT) AS crawl_delay_sec
FROM _blocked b JOIN _star s USING (host, rule_block)
WHERE b.key = 'crawl-delay' AND regexp_matches(b.value, '^[0-9]+$')
GROUP BY b.host
"""
