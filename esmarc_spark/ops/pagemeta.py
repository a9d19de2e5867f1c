"""Page-level metadata directives — the two HTML signals every serious
crawl pipeline honors before content processing:

* ``<meta name="robots" content="... noindex ...">`` — the publisher
  asked not to be indexed; a training corpus that wants to respect
  publisher intent drops the page (Common Crawl consumers routinely
  filter on it).
* ``<link rel="canonical" href="...">`` — the publisher's OWN statement
  of which URL is authoritative. Grouping by the declared canonical
  catches duplicate pages that URL *normalization* (ops/urlnorm) cannot:
  print views, mobile mirrors, session-id paths — different normalized
  urls, same declared canonical.

Both are single-pass RE2-safe regexes (no backreferences, no lookahead)
shared verbatim between the Spark expression and the DuckDB oracle —
pure whole-stage-codegen, no UDF, no shuffle. Attribute order in real
HTML flips freely (``name`` before ``content`` and vice versa), so each
signal is an alternation of the two orders; quoting styles (double,
single, bare) are covered by optional quote classes.

Reference analogue: none (the reference ingests record dumps, not HTML);
this is crawl-pipeline surface on the S1 side of the webtext path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# meta-robots noindex, either attribute order. [^>]* never crosses the
# tag boundary, so a "robots" mention in page text cannot match.
_NOINDEX_RX = (
    r'(?i)<meta\b[^>]*name\s*=\s*["\x27]?robots["\x27]?[^>]*'
    r'content\s*=\s*["\x27]?[^"\x27>]*noindex'
    r'|(?i)<meta\b[^>]*content\s*=\s*["\x27]?[^"\x27>]*noindex[^"\x27>]*'
    r'["\x27]?[^>]*name\s*=\s*["\x27]?robots'
)

# rel=canonical href, both attribute orders (capture group 1 = the url)
_CANONICAL_REL_FIRST_RX = (
    r'(?i)<link\b[^>]*rel\s*=\s*["\x27]?canonical["\x27]?[^>]*'
    r'href\s*=\s*["\x27]?([^"\x27 >]+)'
)
_CANONICAL_HREF_FIRST_RX = (
    r'(?i)<link\b[^>]*href\s*=\s*["\x27]?([^"\x27 >]+)["\x27]?[^>]*'
    r'rel\s*=\s*["\x27]?canonical'
)


def is_noindex(html: F.Column) -> F.Column:
    """True when the page carries a meta-robots noindex directive.
    Accepts string OR binary html (the pipeline's S0 column is raw
    bytes; cast binary->string does not validate, and the tag bytes the
    patterns touch are ASCII)."""
    return html.cast("string").rlike(_NOINDEX_RX)


def filter_noindex(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Drop pages the publisher marked noindex (NULL html is kept — no
    directive present). Map-only."""
    return df.where(
        F.col(html_col).isNull() | ~is_noindex(F.col(html_col))
    )


def rel_canonical(html: F.Column) -> F.Column:
    """The declared canonical url, or NULL if the page declares none.
    First match wins per order-variant; the rel-first form is preferred
    when both exist (they agree on real pages)."""
    s = html.cast("string")  # string or raw-bytes html, like is_noindex
    first = F.nullif(
        F.regexp_extract(s, _CANONICAL_REL_FIRST_RX, 1), F.lit("")
    )
    second = F.nullif(
        F.regexp_extract(s, _CANONICAL_HREF_FIRST_RX, 1), F.lit("")
    )
    return F.coalesce(first, second)


def declared_canonical_groups(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(canonical, n_pages, representative): pages grouped by their
    DECLARED canonical target — pages with no declaration group under
    their own url (self-canonical, the HTML spec's default). The
    representative is the bytewise-min member url (deterministic at any
    parallelism). One uniform-keyed partial-agg groupBy."""
    keyed = df.select(
        F.coalesce(rel_canonical(F.col(html_col)), F.col(url_col)).alias(
            "canonical"
        ),
        F.col(url_col).alias("_url"),
    )
    return keyed.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.min("_url").alias("representative"),
    )


def dedup_by_declared_canonical(
    webtext: DataFrame,
    group_cols: tuple[str, ...] = (),
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """One row per DECLARED canonical target: latest crawl wins (max_by
    (warc_ts, url) — the same survivor rule as
    urlnorm.dedup_by_canonical_url, so the two dedups compose without a
    second convention). Key = the page's rel=canonical declaration,
    falling back to its own url (the spec default). Unlike the
    url-normalization dedup the key comes from page CONTENT, so it
    collapses print views / mobile mirrors / session-id paths whose
    urls normalize differently. The surviving row keeps its OWN url —
    the declared target may point at a page the crawl never fetched,
    and rewriting would fabricate a url we have no bytes for.

    ``group_cols`` adds grouping keys (the batch backfill passes
    ("pday",) — per-day dedup, byte-identical to the per-day loop).
    Single uniform-keyed shuffle."""
    cols = webtext.columns
    key = F.coalesce(rel_canonical(F.col(html_col)), F.col(url_col))
    return (
        webtext.withColumn("_ckey", key)
        .groupBy("_ckey", *group_cols)
        .agg(
            F.max_by(
                F.struct(*cols), F.struct("warc_ts", url_col)
            ).alias("_row")
        )
        .select(*[F.col(f"_row.{c}").alias(c) for c in cols])
    )


def _sql_quote(rx: str) -> str:
    """Embed a regex as a DuckDB string literal: single quotes doubled,
    backslashes left alone (DuckDB treats them literally)."""
    return "'" + rx.replace("\x27", "\x27\x27") + "'"


def noindex_sql_predicate(html: str = "html") -> str:
    """DuckDB predicate mirroring :func:`is_noindex` (same pattern)."""
    return f"regexp_matches({html}, {_sql_quote(_NOINDEX_RX)})"


def declared_canonical_groups_sql(
    source_select: str, html: str = "html", url: str = "url"
) -> str:
    """DuckDB oracle for :func:`declared_canonical_groups` (identical
    patterns; DuckDB regexp_extract returns '' on no-match like Spark)."""
    rel_first = _sql_quote(_CANONICAL_REL_FIRST_RX)
    href_first = _sql_quote(_CANONICAL_HREF_FIRST_RX)
    return f"""
WITH _keyed AS (
  SELECT coalesce(
           nullif(regexp_extract({html}, {rel_first}, 1), ''),
           nullif(regexp_extract({html}, {href_first}, 1), ''),
           {url}
         ) AS canonical,
         {url} AS _url
  FROM ({source_select})
)
SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_pages,
       MIN(_url) AS representative
FROM _keyed GROUP BY canonical
"""


# ---------------------------------------------------------------------------
# title / h1 extraction (round 7)
# ---------------------------------------------------------------------------
#
# The page title is the cheapest high-precision surface form a crawl
# yields (it seeds gazetteers, labels KG page nodes, and feeds search
# snippets); the first <h1> is its on-page counterpart. Same discipline
# as the directives above: one RE2-safe pattern per signal, shared
# verbatim with the oracle, plus a fixed entity-decode replace chain
# (&amp; decoded LAST so "&amp;lt;" correctly yields the literal
# "&lt;" instead of double-decoding to "<").

_TITLE_RX = r"(?i)<title[^>]*>\s*([^<]*?)\s*</title>"
_H1_RX = r"(?i)<h1[^>]*>\s*([^<]*?)\s*</h1>"

# (entity, replacement) in decode order — &amp; last by construction
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _decode_entities(col: F.Column) -> F.Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _entities_sql(inner: str) -> str:
    e = inner
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        e = f"replace({e}, '{ent}', '{lit}')"
    return e


def page_title(html: F.Column) -> F.Column:
    """The page's <title> text (entity-decoded, edge-trimmed), NULL when
    absent or empty. Accepts string or binary html like is_noindex."""
    raw = F.regexp_extract(html.cast("string"), _TITLE_RX, 1)
    return F.nullif(_decode_entities(raw), F.lit(""))


def page_h1(html: F.Column) -> F.Column:
    """The first <h1> text, same contract as :func:`page_title`."""
    raw = F.regexp_extract(html.cast("string"), _H1_RX, 1)
    return F.nullif(_decode_entities(raw), F.lit(""))


def extract_titles(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, title, h1) per page — map-only codegen."""
    return df.select(
        F.col(url_col).alias("url"),
        page_title(F.col(html_col)).alias("title"),
        page_h1(F.col(html_col)).alias("h1"),
    )


def extract_titles_sql(
    source_select: str, html: str = "html", url: str = "url"
) -> str:
    """DuckDB oracle: identical patterns and decode chain."""
    title = _entities_sql(
        f"regexp_extract({html}, {_sql_quote(_TITLE_RX)}, 1)"
    )
    h1 = _entities_sql(f"regexp_extract({html}, {_sql_quote(_H1_RX)}, 1)")
    return f"""
SELECT {url} AS url,
       nullif({title}, '') AS title,
       nullif({h1}, '') AS h1
FROM ({source_select})
"""


# ---------------------------------------------------------------------------
# hreflang alternate-language links (round 7)
# ---------------------------------------------------------------------------
#
# ``<link rel="alternate" hreflang="de" href="...">`` declares the
# same content in another language — the signal multilingual corpora
# use to build parallel-document pairs (translation training data) and
# to avoid counting a 40-language site as 40 independent documents.
# Element-level extraction (the ANCHOR_PATTERN recipe): pull whole
# <link ...> elements, keep those declaring rel=alternate AND an
# hreflang, then per-element group extraction — attribute order free.

_LINK_ELEMENT_RX = r"(?i)<link\b[^>]*>"
_REL_ALTERNATE_RX = r'(?i)rel\s*=\s*["\x27]?alternate'
_HREFLANG_RX = r'(?i)hreflang\s*=\s*["\x27]?([a-zA-Z-]+)'
_HREF_RX = r'(?i)href\s*=\s*["\x27]?([^"\x27 >]+)'


def hreflang_links(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, hreflang, href) per alternate-language declaration —
    lowercased language tag; self-referential declarations (href ==
    url, the spec-recommended self row) are kept so consumers see the
    full declared cluster. Map-only element explode."""
    elems = df.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col).cast("string"),
                F.lit(_LINK_ELEMENT_RX),
                F.lit(0),
            )
        ).alias("elem"),
    )
    return (
        elems.where(
            F.col("elem").rlike(_REL_ALTERNATE_RX)
            & (F.regexp_extract("elem", _HREFLANG_RX, 1) != "")
            & (F.regexp_extract("elem", _HREF_RX, 1) != "")
        )
        .select(
            "url",
            F.lower(F.regexp_extract("elem", _HREFLANG_RX, 1)).alias("hreflang"),
            F.regexp_extract("elem", _HREF_RX, 1).alias("href"),
        )
    )


def hreflang_links_sql(
    source_select: str, html: str = "html", url: str = "url"
) -> str:
    """DuckDB oracle: identical element pattern and group extraction."""
    link = _sql_quote(_LINK_ELEMENT_RX)
    alt = _sql_quote(_REL_ALTERNATE_RX)
    lang = _sql_quote(_HREFLANG_RX)
    href = _sql_quote(_HREF_RX)
    return f"""
WITH _elems AS (
  SELECT {url} AS url,
         unnest(regexp_extract_all({html}, {link})) AS elem
  FROM ({source_select})
)
SELECT url,
       lower(regexp_extract(elem, {lang}, 1)) AS hreflang,
       regexp_extract(elem, {href}, 1) AS href
FROM _elems
WHERE regexp_matches(elem, {alt})
  AND regexp_extract(elem, {lang}, 1) <> ''
  AND regexp_extract(elem, {href}, 1) <> ''
"""
