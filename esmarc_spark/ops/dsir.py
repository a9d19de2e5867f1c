"""DSIR — data selection with importance resampling.

"Data Selection for Language Models via Importance Resampling" (Xie et
al. 2023) picks pretraining documents whose hashed-n-gram distribution
looks like a *target* (in-domain) corpus rather than the raw crawl:
importance weight = log p_target(doc) - log p_raw(doc) under two
bag-of-hashed-ngrams models, then Gumbel-top-k resampling on the
weights. This sits between the pure heuristics (``ops.text`` Gopher
gates) and the trained classifier (``ops.quality_model``) in the
quality ladder, and reuses the hashed-LM machinery of ``ops.lm``.

Re-expression on Spark:

* the TARGET unigram model is the vendored ``lookups/lm_bigram.json``
  (same add-half smoothing and portable-md5 bucketing as
  ``ops.lm``, so one vendored artifact serves both operators);
* the RAW model is estimated from the corpus being scored, the way
  DSIR fits its raw model on the source distribution: hashed unigram
  bucket counts via one partial-aggregated groupBy over int bucket
  ids. The count vector (u_width = 4096 bigints, ~32 KB) is a bounded
  dimension — it rides to executors as a broadcast single-row cross
  join (the mentions-Bloom / ops.lm pattern), so scoring itself stays
  map-only whole-stage codegen;
* per-token log-ratio with the cross-engine rounding ladder of
  ``ops.lm`` (round p to 12 before log10, each log to 7, the document
  sum to 6) so the DuckDB oracle replays the floats bit-for-bit;
* Gumbel-top-k: deterministic noise from the portable md5 hash of the
  document text (u = (h + 0.5) / 16^15 clamped away from {0,1},
  g = -ln(-ln(u))) added to the total
  log-ratio; selection is a global sort + limit (Spark's distributed
  TakeOrdered — no single-partition window).

Scale shape: one tiny shuffle for the raw counts (4096 keys,
partial-aggregated map-side), then map-only scoring and a top-k. At
100 TB the count pass is bounded by scan throughput exactly like
``text_stats``; the collected count vector is a fixed 32 KB regardless
of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.ops.lm import _bucket, load_model

_CT_COL = "__dsir_ct"  # target unigram counts
_CR_COL = "__dsir_cr"  # raw (corpus-estimated) unigram counts
_NR_COL = "__dsir_nr"  # raw corpus total token count

HEX15 = float(16**15)


def _toks(text: str) -> F.Column:
    return F.filter(F.split(F.lower(F.col(text)), " "), lambda t: t != "")


def raw_unigram_counts(
    documents: DataFrame, text: str = "text"
) -> tuple[list[int], int]:
    """Hashed unigram bucket counts of the corpus itself (the DSIR raw
    model), as a dense width-u_width vector + total. The collect is a
    bounded dim (u_width rows), not a data-sized driver pull."""
    model = load_model()
    width = model["u_width"]
    rows = (
        documents.select(F.explode(_toks(text)).alias("tok"))
        .select(_bucket(F.col("tok"), model["salt_u"], width).alias("j"))
        .groupBy("j")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = [0] * width
    total = 0
    for r in rows:
        counts[r.j] = r.n
        total += r.n
    return counts, total


def _lp(tok: F.Column, counts_col: str, total, model: dict) -> F.Column:
    """round(log10(round(p, 12)), 7) under add-half smoothing."""
    j = _bucket(tok, model["salt_u"], model["u_width"])
    c = F.element_at(F.col(counts_col), j + 1).cast("double")
    denom = total + 0.5 * model["u_width"]
    return F.round(F.log10(F.round((c + F.lit(0.5)) / F.lit(denom), 12)), 7)


def dsir_weights(
    documents: DataFrame,
    text: str = "text",
    raw_counts: tuple[list[int], int] | None = None,
) -> DataFrame:
    """Input columns + ``dsir_logratio`` (sum over tokens of the
    target-vs-raw log10 ratio, rounded to 6; null for empty/null text)
    and ``dsir_gumbel_score`` (logratio + deterministic Gumbel noise
    keyed on the text hash — the resampling key)."""
    model = load_model()
    if raw_counts is None:
        raw_counts = raw_unigram_counts(documents, text)
    counts, total = raw_counts
    spark = documents.sparkSession
    mdf = spark.createDataFrame(
        [(model["cu"], counts)],
        f"{_CT_COL} array<bigint>, {_CR_COL} array<bigint>",
    )
    toks = _toks(text)
    n = F.size(toks)
    lr = F.transform(
        toks,
        lambda t: _lp(t, _CT_COL, model["total"], model)
        - _lp(t, _CR_COL, total, model),
    )
    logratio = F.round(F.aggregate(lr, F.lit(0.0), lambda a, x: a + x), 6)
    # deterministic Gumbel: u in (0,1) from the portable 15-hex md5 hash
    h = F.conv(F.substring(F.md5(F.col(text)), 1, 15), 16, 10).cast(
        "double"
    )
    u = F.round((h + F.lit(0.5)) / F.lit(HEX15), 12)
    # clamp: u rounded to exactly 0.0 or 1.0 would send ln to +-inf
    u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    g = F.round(-F.log(-F.log(u)), 7)
    valid = F.col(text).isNotNull() & (n > 0)
    out = documents.crossJoin(F.broadcast(mdf))
    return (
        out.withColumn("dsir_logratio", F.when(valid, logratio))
        .withColumn(
            "dsir_gumbel_score",
            F.when(valid, F.round(F.col("dsir_logratio") + g, 6)),
        )
        .drop(_CT_COL, _CR_COL)
    )


def dsir_sample(
    documents: DataFrame,
    m: int,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-m resample: the ``m`` docs with the highest
    ``dsir_gumbel_score`` (ties to the lowest id), with a 1-based
    ``rank``. Sort + limit keeps the selection distributed; the rank
    window runs on the m-row result only."""
    from pyspark.sql.window import Window

    top = (
        dsir_weights(documents, text)
        .where(F.col("dsir_gumbel_score").isNotNull())
        .orderBy(F.col("dsir_gumbel_score").desc(), F.col(id_col).asc())
        .limit(m)
    )
    w = Window.orderBy(
        F.col("dsir_gumbel_score").desc(), F.col(id_col).asc()
    )
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        id_col,
        "dsir_logratio",
        "dsir_gumbel_score",
    )


def dsir_sample_sql(
    source_select: str,
    m: int,
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle: the raw model is re-estimated with GROUP BY over
    the identical bucket hash, missing buckets zero-filled by a range
    anti-join; scoring replays the identical rounding ladder. NOTE:
    DuckDB ``log`` is log10 — natural log is ``ln``."""
    model = load_model()
    u_w = model["u_width"]
    s_u = model["salt_u"]
    cu = "[" + ", ".join(str(v) for v in model["cu"]) + "]"
    t_denom = model["total"] + 0.5 * u_w

    def bkt(expr: str) -> str:
        return (
            f"cast(cast('0x' || substr(md5({expr} || '{s_u}'), 1, 15) "
            f"AS bigint) % {u_w} AS int)"
        )

    lp_t = (
        f"round(log10(round((cast(ct[1 + {bkt('t')}] AS double) + 0.5)"
        f" / {t_denom!r}, 12)), 7)"
    )
    lp_r = (
        f"round(log10(round((cast(cr[1 + {bkt('t')}] AS double) + 0.5)"
        f" / (rtot + {0.5 * u_w!r}), 12)), 7)"
    )
    return f"""
WITH src AS ({source_select}),
tk AS (
  SELECT src.*, list_filter(string_split(lower({text}), ' '), x -> x <> '') AS toks
  FROM src
),
rawc AS (
  SELECT {bkt('u.t')} AS j, count(*) AS n
  FROM (SELECT unnest(toks) AS t FROM tk) u
  GROUP BY 1
),
rvec AS (
  SELECT list(coalesce(rawc.n, 0) ORDER BY r.range) AS cr,
         cast(sum(coalesce(rawc.n, 0)) AS double) AS rtot
  FROM range({u_w}) r LEFT JOIN rawc ON rawc.j = r.range
),
m AS (SELECT {cu}::BIGINT[] AS ct, rvec.cr, rvec.rtot FROM rvec),
s AS (
  SELECT tk.*, CASE WHEN {text} IS NULL OR len(toks) = 0 THEN NULL ELSE
    round(coalesce(list_sum(list_transform(toks, t -> {lp_t} - {lp_r})), 0), 6)
  END AS dsir_logratio
  FROM tk, m
),
g AS (
  SELECT s.*,
    round(dsir_logratio + round(-ln(-ln(
      least(greatest(round(
        (cast(cast('0x' || substr(md5({text}), 1, 15) AS bigint) AS double)
         + 0.5) / {HEX15!r}, 12), 1e-12), 1.0 - 1e-12))), 7), 6)
      AS dsir_gumbel_score
  FROM s
)
SELECT cast(row_number() OVER (
         ORDER BY dsir_gumbel_score DESC, {id_col} ASC) AS int) AS rank,
       {id_col}, dsir_logratio, dsir_gumbel_score
FROM g
WHERE dsir_gumbel_score IS NOT NULL
ORDER BY dsir_gumbel_score DESC, {id_col} ASC
LIMIT {m}
"""
