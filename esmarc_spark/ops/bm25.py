"""BM25 lexical retrieval over a document corpus.

Complements the embedding-side similarity search (``ops/similarity.py``
brute-force / LSH / IVF) with the standard lexical ranking function —
the retrieval half of a dedup/decontamination/inspection stack wants
both. Uses the Lucene BM25 variant: ``idf = ln((N - df + 0.5) /
(df + 0.5) + 1)`` (always positive), ``tf_norm = tf * (k1 + 1) /
(tf + k1 * (1 - b + b * dl / avgdl))``.

Scale shape (the 100-TB question):

* the query set is TINY by construction — its distinct terms are
  broadcast, and the token explode is filtered to query terms BEFORE
  the only wide shuffle (the ``(doc, term)`` tf count), so shuffle
  volume is proportional to query-term postings, not corpus tokens;
* corpus stats (N, total token count) are one tiny aggregate attached
  via a broadcast single-row cross join — no driver-side collect;
* document frequencies are computed FROM the postings (already
  query-term-only) and broadcast back;
* top-k per query is a window over ``query_id`` — bounded by the
  number of queries, never by corpus size.

Two corpus scans total (stats + postings) — the unavoidable minimum
when idf needs global N.

Contract: documents with null text or zero tokens are excluded from
both the corpus statistics and the ranking. Ties in the rounded score
break on ascending ``doc_id`` so results are deterministic at any
parallelism.

Cross-engine float parity (the repo's standard ladder): idf is ``ln``
of an exact-integer rational (identical doubles in), rounded to 9;
per-term scores are rational arithmetic on identical doubles, rounded
to 9 and summed as DECIMAL(38,9) — exact, order-free — then the
document score is cast back and rounded to 6 at the boundary.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _toks(col):
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


def bm25_topk(
    documents: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries``: small literal list of ``(query_id, query_text)`` —
    broadcast end-to-end. Returns ``(query_id, rnk, doc_id, score)``
    ordered by ``(query_id, rnk)``.
    """
    spark = documents.sparkSession

    d = (
        documents.where(F.col(text).isNotNull())
        .select(F.col(id_col).alias("doc_id"), _toks(F.col(text)).alias("toks"))
        .withColumn("dl", F.size("toks"))
        .where(F.col("dl") > 0)
    )

    qdf = spark.createDataFrame(queries, "query_id string, query_text string")
    qterms = qdf.select(
        "query_id", F.explode(F.array_distinct(_toks(F.col("query_text")))).alias("term")
    )
    terms = qterms.select("term").distinct()

    stats = d.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    )

    postings = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )

    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        9,
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    tf_norm = (
        F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
        )
    )
    term_score = F.round(idf * tf_norm, 9).cast("decimal(38,9)")

    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(term_score).cast("double"), 6).alias("score"))
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "rnk", "doc_id", "score")
        .orderBy("query_id", "rnk")
    )


def bm25_topk_sql(
    source_select: str,
    queries: list[tuple[str, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text: str = "text",
) -> str:
    """DuckDB oracle: the IDENTICAL tokenization, idf/tf arithmetic,
    rounding ladder, decimal summation, and tie-break."""
    qvals = ", ".join(
        "(" + ", ".join("'" + s.replace("'", "''") + "'" for s in q) + ")"
        for q in queries
    )
    return f"""
WITH src AS ({source_select}),
d AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split(lower({text}), ' '), x -> x <> '') AS toks
  FROM src WHERE {text} IS NOT NULL
),
dd AS (SELECT doc_id, toks, len(toks) AS dl FROM d WHERE len(toks) > 0),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dd),
q(query_id, query_text) AS (VALUES {qvals}),
qt AS (
  SELECT DISTINCT query_id, unnest(list_distinct(
    list_filter(string_split(lower(query_text), ' '), x -> x <> ''))) AS term
  FROM q
),
post AS (
  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
  WHERE term IN (SELECT term FROM qt)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY term),
scored AS (
  SELECT qt.query_id, post.doc_id,
         round(cast(sum(
           cast(round(
             round(ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0), 9)
             * (cast(post.tf AS double) * {k1 + 1.0!r}
                / (cast(post.tf AS double)
                   + {k1!r} * ({1.0 - b!r} + {b!r} * cast(post.dl AS double)
                              / (cast(stats.total_dl AS double)
                                 / cast(stats.n_docs AS double)))))
           , 9) AS DECIMAL(38,9))
         ) AS double), 6) AS score
  FROM post
  JOIN dfreq USING (term)
  JOIN qt USING (term)
  CROSS JOIN stats
  GROUP BY qt.query_id, post.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk,
         doc_id, score
  FROM scored
)
SELECT query_id, rnk, doc_id, score FROM ranked
WHERE rnk <= {k}
ORDER BY query_id, rnk
"""
