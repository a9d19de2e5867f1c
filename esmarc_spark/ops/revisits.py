"""Cross-dump URL revisit classification — what changed between crawls.

An incremental crawl fetches many URLs it has seen in earlier dumps.
Downstream consumers need to know, per (url, dump): is this the first
sighting (``new``), the same bytes as last time (``unchanged``), or a
real content change (``changed``)? The KG refresh then re-extracts
only the latest new/changed rows instead of the whole corpus — the
same skip-already-processed discipline as ``ops.dedup_incremental``
(and the reference's enrichment bots' anti-join against accumulated
state, enrichment/wikidata.py:129-134), but keyed on content identity
per URL over time rather than near-duplicate clusters across URLs.

Shape: content travels as an md5 fingerprint (text never shuffles);
the only wide op is a window partitioned by url and ordered by dump
day, whose sort is bounded by the number of dumps a url appears in
(dozens, not data-sized). ``lag`` gives the previous fingerprint,
``max`` over the url partition marks the latest snapshot. Everything
is deterministic given unique (url, day) — enforced upstream by the
pipeline's per-day url dedup (``pipeline/run.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classify_revisits(
    snapshots: DataFrame,
    url_col: str = "url",
    day_col: str = "pday",
    text: str = "text",
) -> DataFrame:
    """(url, pday, status, is_latest): per-snapshot revisit status.

    ``status`` is ``new`` for a url's first dump, ``changed`` when the
    content fingerprint differs from the previous dump, ``unchanged``
    otherwise; ``is_latest`` marks the most recent snapshot of each
    url (the row an incremental re-extract would read)."""
    fp = F.md5(F.col(text))
    w = Window.partitionBy(url_col).orderBy(day_col)
    prev = F.lag(fp).over(w)
    return snapshots.select(
        F.col(url_col).alias("url"),
        F.col(day_col).alias("pday"),
        F.when(prev.isNull(), F.lit("new"))
        .when(prev != fp, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        (
            F.col(day_col)
            == F.max(day_col).over(Window.partitionBy(url_col))
        ).alias("is_latest"),
    )


def refresh_set(
    snapshots: DataFrame,
    url_col: str = "url",
    day_col: str = "pday",
    text: str = "text",
) -> DataFrame:
    """The incremental work list: latest snapshot per url, only where
    that snapshot is new or changed content (an unchanged refetch costs
    zero downstream work)."""
    return classify_revisits(snapshots, url_col, day_col, text).where(
        F.col("is_latest") & (F.col("status") != "unchanged")
    )


def classify_revisits_sql(
    snapshots_select: str,
    url_col: str = "url",
    day_col: str = "pday",
    text: str = "text",
) -> str:
    """DuckDB oracle: the identical lag/max windows over md5."""
    return f"""
WITH _s AS ({snapshots_select})
SELECT {url_col} AS url, {day_col} AS pday,
       CASE WHEN lag(md5({text})) OVER w IS NULL THEN 'new'
            WHEN lag(md5({text})) OVER w <> md5({text}) THEN 'changed'
            ELSE 'unchanged' END AS status,
       {day_col} = max({day_col}) OVER (PARTITION BY {url_col}) AS is_latest
FROM _s
WINDOW w AS (PARTITION BY {url_col} ORDER BY {day_col})
"""
