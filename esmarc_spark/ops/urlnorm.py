"""URL canonicalization — the standard pre-dedup step for web corpora
(the reference keys everything on record ids; a crawl keys on urls, and
raw crawl urls are noisy: case-variant hosts, default ports, fragments,
tracking params, trailing slashes).

Canonical form (documented, deterministic — each rule is applied by both
the Spark expression and the DuckDB oracle SQL):

1. fragment dropped;
2. scheme and host lowercased (path case is preserved — it is
   significant per RFC 3986);
3. default ports dropped (http:80, https:443);
4. tracking query params removed (utm_*, gclid, fbclid, msclkid);
5. remaining query params sorted bytewise;
6. trailing slashes stripped from non-root paths.

Percent-encoding normalization is intentionally NOT applied (it can
change semantics for reserved characters); a crawl that needs it should
do it at fetch time.

Everything is whole-stage-codegen expressions — no UDF, no shuffle; the
dedup that follows is one uniform-keyed groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRACKING = r"^(utm_[^=]*|gclid|fbclid|msclkid)(=|$)"
_SCHEME_HOST = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"


def canonical_url(url: F.Column) -> F.Column:
    """Pure-JVM canonicalization expression (rules in module docstring)."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    base = F.regexp_replace(no_frag, r"\?.*$", "")
    query = F.when(
        no_frag.contains("?"), F.regexp_extract(no_frag, r"\?(.*)$", 1)
    ).otherwise(F.lit(""))

    raw_sh = F.regexp_extract(base, _SCHEME_HOST, 0)
    rest = F.substring(base, F.length(raw_sh) + 1, F.lit(1 << 30))
    sh = F.lower(raw_sh)
    sh = F.regexp_replace(sh, r"^(http://[^:/?#]+):80$", "$1")
    sh = F.regexp_replace(sh, r"^(https://[^:/?#]+):443$", "$1")

    rest_norm = F.when(rest.isin("", "/"), F.lit("")).otherwise(
        F.regexp_replace(rest, r"/+$", "")
    )

    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        sh,
        rest_norm,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


# the same six rules in DuckDB SQL, parameterized by the url column —
# used to build cross-engine oracles. A staged subquery chain keeps each
# derived term computed once (the scalar-expression form would re-inline
# no_frag/raw_sh several times).
def canonical_sql_select(url_select: str, passthrough: str = "") -> str:
    """DuckDB subquery producing ``curl`` (the canonical form of column
    ``url``) plus any ``passthrough`` columns, over ``url_select`` (a
    SELECT producing at least a ``url`` column). Single source of truth
    for the oracle rendering of the six rules."""
    pt = ("," + passthrough) if passthrough else ""
    return f"""
WITH _raw AS ({url_select}),
 _s1 AS (SELECT regexp_replace(url, '#.*$', '') AS no_frag, url{pt} FROM _raw),
 _s2 AS (SELECT regexp_replace(no_frag, '\\?.*$', '') AS base,
               CASE WHEN contains(no_frag, '?')
                    THEN regexp_extract(no_frag, '\\?(.*)$', 1)
                    ELSE '' END AS query, url{pt}
        FROM _s1),
 _s3 AS (SELECT regexp_extract(base, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0) AS raw_sh,
               base, query, url{pt} FROM _s2),
 _s4 AS (SELECT lower(raw_sh) AS sh0,
               substring(base, length(raw_sh) + 1) AS rest, query, url{pt} FROM _s3),
 _s5 AS (SELECT regexp_replace(regexp_replace(sh0,
                 '^(http://[^:/?#]+):80$', '\\1'),
                 '^(https://[^:/?#]+):443$', '\\1') AS sh,
               CASE WHEN rest IN ('', '/') THEN ''
                    ELSE regexp_replace(rest, '/+$', '') END AS rest_norm,
               coalesce(array_to_string(list_sort(list_filter(
                 string_split(query, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                      '^(utm_[^=]*|gclid|fbclid|msclkid)(=|$)'))), '&'),
                 '') AS qs, url{pt}
        FROM _s4)
SELECT sh || rest_norm || (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS curl,
       url{pt}
FROM _s5"""


def canonical_groups_sql(url_select: str) -> str:
    """DuckDB: canonical-url group counts over ``url_select`` (a SELECT
    producing one ``url`` column)."""
    return f"""
SELECT curl, count(*) AS n
FROM ({canonical_sql_select(url_select)})
GROUP BY curl ORDER BY curl
"""


def dedup_by_canonical_url(
    webtext: DataFrame,
    group_cols: tuple[str, ...] = (),
    percent_normalize: bool = False,
) -> DataFrame:
    """One row per canonical url: latest crawl wins (max_by warc_ts,
    ties broken by the raw url for determinism). Single uniform-keyed
    shuffle; composes in front of the pipeline's dedup_by_url.

    The survivor struct is built from ``webtext.columns`` (like
    dedup_by_url), so extra columns — text_extracted provenance, a
    sniffed charset, anything a caller added — survive the dedup
    regardless of compose order.

    ``group_cols`` adds extra grouping keys: the single-job backfill
    passes ("pday",) so canonical dedup stays PER-DAY, byte-identical
    to running the per-day loop (round 6).

    ``percent_normalize`` (round 7, default OFF to keep the pinned
    byte-identity of existing callers) applies the RFC 3986 safe
    percent normalization (:func:`normalize_percent_encoding`) BEFORE
    the six canonical rules, collapsing /%41b vs /Ab and %c3 vs %C3
    variants of the same page."""
    cols = webtext.columns
    key_src = (
        normalize_percent_encoding("url") if percent_normalize
        else F.col("url")
    )
    return (
        webtext.withColumn("_curl", canonical_url(key_src))
        .groupBy("_curl", *group_cols)
        .agg(
            F.max_by(
                F.struct(*cols), F.struct("warc_ts", "url")
            ).alias("_row")
        )
        .select(
            F.col("_curl").alias("url"),
            *[F.col(f"_row.{c}").alias(c) for c in cols if c != "url"],
        )
    )


# --- host extraction + blocklist filtering (round 5) ------------------------


def host_of(url: F.Column) -> F.Column:
    """Lowercased host of a url (port stripped); '' when there is none."""
    return F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)", 1)
    )


def host_suffixes(host: F.Column) -> F.Column:
    """All dot-suffixes of a host ("a.b.example.com" ->
    [a.b.example.com, b.example.com, example.com, com]) — the equi-join
    key set for subdomain-inclusive blocklist matching (a theta
    endswith-join would be a nested-loop; exploded suffixes keep it a
    broadcast hash join)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.array_join(F.slice(parts, i, n), ".")
    )


def filter_by_host_blocklist(
    webtext: DataFrame, blocked_hosts: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose url host is on the blocklist or is a subdomain of
    a blocked host. ``blocked_hosts`` needs one ``host`` column (small —
    broadcasts). Two joins: a semi join of exploded host-suffixes
    against the blocklist finds the condemned urls, an anti join removes
    them; the fact table is never shuffled."""
    hit = (
        webtext.select(
            F.col(url_col),
            F.explode(host_suffixes(host_of(F.col(url_col)))).alias("host"),
        )
        .join(F.broadcast(blocked_hosts.select(F.lower("host").alias("host"))), "host", "semi")
        .select(url_col)
        .distinct()
    )
    return webtext.join(hit, url_col, "left_anti")


def host_blocklist_sql(
    source_select: str, blocked_values: list[str], url_col: str = "url"
) -> str:
    """DuckDB oracle: identical suffix-set semantics via unnest."""
    vals = ", ".join(f"('{h.lower()}')" for h in blocked_values)
    return f"""
WITH src AS ({source_select}),
hosted AS (
  SELECT *, lower(regexp_extract({url_col},
    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS _host
  FROM src
),
sfx AS (
  SELECT {url_col}, unnest(list_transform(
           range(1, len(string_split(_host, '.')) + 1),
           i -> array_to_string(string_split(_host, '.')[i:], '.')))
         AS host
  FROM hosted
),
bad AS (
  SELECT DISTINCT s.{url_col} FROM sfx s
  JOIN (VALUES {vals}) AS bl(host) ON s.host = bl.host
)
SELECT * EXCLUDE (_host) FROM hosted
WHERE {url_col} NOT IN (SELECT {url_col} FROM bad)
"""


# ---------------------------------------------------------------------------
# RFC 3986 safe percent-encoding normalization (round 7)
# ---------------------------------------------------------------------------
#
# canonical_url deliberately leaves percent-encoding alone: decoding a
# RESERVED character ('/', '?', '&', ...) changes what the url means.
# But RFC 3986 §6.2.2 defines a normalization that is provably
# semantics-preserving, and real crawls need it (the same page is
# fetched as /caf%c3%a9, /caf%C3%A9, /Ab and /%41b):
#
#   1. hex digits in every %XX triplet uppercased;
#   2. %XX decoded ONLY for the 66 unreserved characters
#      (ALPHA / DIGIT / '-' / '.' / '_' / '~').
#
# Implementation is engine-portable expression text from one generator
# (the ops.mojibake recipe): step 1 splits on '%' and uppercases the
# two lead chars of each hex-shaped segment row-locally (a sentinel
# char pins the pre-'%' head so no index-aware lambda is needed —
# DuckDB's list lambdas have no index form); step 2 is a generated
# 66-rule chained replace. Map-only whole-stage codegen, no shuffle.

_UNRESERVED = (
    [chr(c) for c in range(0x41, 0x5B)]  # A-Z
    + [chr(c) for c in range(0x61, 0x7B)]  # a-z
    + [chr(c) for c in range(0x30, 0x3A)]  # 0-9
    + list("-._~")
)


def percent_normalize_sql(inner: str, dialect: str) -> str:
    """Normalization chain over an input expression; ``dialect`` is
    'spark' or 'duckdb' (the two differ only in lambda/join spellings —
    the rule table and ordering are shared)."""
    if dialect == "spark":
        upper = (
            f"substring(array_join(transform(split(concat(char(1), {inner}), '%'),"
            " e -> CASE WHEN e rlike '^[0-9a-fA-F]{2}'"
            " THEN concat(upper(substring(e, 1, 2)), substring(e, 3))"
            " ELSE e END), '%'), 2)"
        )
    elif dialect == "duckdb":
        upper = (
            f"substr(array_to_string(list_transform(string_split(chr(1) || ({inner}), '%'),"
            " e -> CASE WHEN regexp_matches(e, '^[0-9a-fA-F]{2}')"
            " THEN upper(substr(e, 1, 2)) || substr(e, 3)"
            " ELSE e END), '%'), 2)"
        )
    else:
        raise ValueError(f"unknown dialect: {dialect!r}")
    e = upper
    for ch in _UNRESERVED:
        e = f"replace({e}, '%{ord(ch):02X}', '{ch}')"
    return e


def normalize_percent_encoding(url: str) -> F.Column:
    """RFC 3986 §6.2.2 safe normalization as a Spark Column (column
    NAME in, one F.expr — the generated chain is 67 calls deep and
    py4j-per-call plan building is the measured trap)."""
    return F.expr(percent_normalize_sql(f"`{url}`", "spark"))
