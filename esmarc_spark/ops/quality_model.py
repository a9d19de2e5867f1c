"""Model-based document quality scoring (round 6 — VERDICT r5 #4): a
linear classifier over hashed token n-grams (fastText-style), upgrading
the 3-feature heuristic ``ops.text.quality_score``.

The vendored model (``lookups/quality_weights.json``) is trained
offline by the deterministic seeded ``scripts/gen_quality_weights.py``
(regeneration byte-identity tested). Scoring is PURE Catalyst:

* grams  = unigrams + bigrams of ``lower(text)`` split on spaces;
* bucket = the repo's portable md5 hash (same construction as
  ops.sampling) mod ``width`` — identical in Spark and DuckDB, so the
  oracle replays the exact hashing/dot product, not a reimplementation;
* logit  = bias + mean of the bucket weights (mean-pooling matches the
  trainer's featurization: sum_g w[h(g)]/n == w . x for counted
  features);
* score  = sigmoid(logit), rounded at the operator boundary.

The weight array reaches the corpus as a broadcast single-row cross
join (the mentions-Bloom pattern — a 4096-double array literal would
bloat every codegen unit; a broadcast relation ships once per
executor). Map-only, zero shuffle; the per-row cost is ~2n md5 calls.

Cross-engine float parity: the fold sums bucket weights in gram order
in BOTH engines (Spark ``aggregate`` / DuckDB ``list_sum`` are ordered
folds; FP addition is order-sensitive), weights are 6-decimal strings
parsed to the same doubles, and the logit is rounded before the
sigmoid so the exp() ulp gap between libm and the JVM cannot flip a
6-decimal digit of the score.
"""

# NOTE: no `from __future__ import annotations` — keep parity with
# ops.bpe (module may later grow pandas UDFs) and py3.11 needs none.
import json
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WEIGHTS_COL = "__quality_w"


@lru_cache(maxsize=1)
def load_model() -> dict:
    from importlib import resources

    return json.loads(
        resources.files("esmarc_spark.lookups")
        .joinpath("quality_weights.json")
        .read_text()
    )


def _grams(text: Column) -> Column:
    toks = F.filter(F.split(F.lower(text), " "), lambda t: t != "")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def _bucket(gram: Column, salt: str, width: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(gram, F.lit(salt))), 1, 15), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(width)).cast("int")


def quality_model_score(
    documents: DataFrame, text: str = "text", round_n: int = 6
) -> DataFrame:
    """Input columns + ``quality_model`` in [0,1] (null text -> null).
    Higher = more natural-language-like under the vendored model."""
    model = load_model()
    spark = documents.sparkSession
    wdf = spark.createDataFrame(
        [(model["weights"],)], f"{WEIGHTS_COL} array<double>"
    )
    salt, width, bias = model["salt"], model["width"], model["bias"]
    buckets = F.transform(
        _grams(F.col(text)), lambda g: _bucket(g, salt, width)
    )
    wsum = F.aggregate(
        buckets,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(F.col(WEIGHTS_COL), b + 1),
    )
    logit = F.round(
        F.lit(bias)
        + wsum / F.greatest(F.size(buckets), F.lit(1)).cast("double"),
        9,
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), round_n)
    return documents.crossJoin(F.broadcast(wdf)).withColumn(
        "quality_model", score
    ).drop(WEIGHTS_COL)


def quality_model_sql(
    source_select: str, text: str = "text", round_n: int = 6
) -> str:
    """DuckDB oracle: the IDENTICAL hashing, ordered fold, and rounding
    (weights inlined as a literal list — 4096 doubles is fine in a
    one-shot oracle query)."""
    model = load_model()
    salt, width, bias = model["salt"], model["width"], model["bias"]
    weights = "[" + ", ".join(repr(w) for w in model["weights"]) + "]"
    return f"""
WITH src AS ({source_select}),
w AS (SELECT {weights}::DOUBLE[] AS wt),
g AS (
  SELECT src.*, CASE WHEN {text} IS NULL THEN NULL ELSE
    list_concat(
      list_filter(string_split(lower({text}), ' '), t -> t <> ''),
      list_transform(
        range(1, len(list_filter(string_split(lower({text}), ' '), t -> t <> ''))),
        i -> list_filter(string_split(lower({text}), ' '), t -> t <> '')[i]
             || ' ' ||
             list_filter(string_split(lower({text}), ' '), t -> t <> '')[i+1])
    ) END AS grams
  FROM src
),
s AS (
  -- coalesce: DuckDB list_sum([]) is NULL, Spark's empty fold is 0.0
  SELECT g.*, round(
    {bias} + coalesce(list_sum(list_transform(grams, gr ->
        wt[1 + cast(cast('0x' || substr(md5(gr || '{salt}'), 1, 15) AS bigint)
                    % {width} AS int)]
      )), 0) / greatest(len(grams), 1),
    9) AS logit
  FROM g, w
)
SELECT * EXCLUDE (grams, logit),
       round(1.0 / (1.0 + exp(-logit)), {round_n}) AS quality_model
FROM s
"""
