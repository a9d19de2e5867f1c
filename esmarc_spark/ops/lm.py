"""CCNet-style n-gram language-model perplexity scoring.

The standard web-curation stack (CCNet, RefinedWeb, FineWeb) scores
every document with a KenLM n-gram perplexity against an in-domain
corpus and gates on it — far-from-distribution documents (gibberish,
boilerplate floods, wrong-language text) score high. KenLM itself is
not in this sandbox, so the engine ships the same model *family* as a
hashed bigram LM with Jelinek-Mercer interpolation: token and bigram
identity go through the repo's portable md5 bucket (the construction
shared with ``ops.sampling`` / ``ops.quality_model``), which makes the
arithmetic replayable bit-for-bit by the DuckDB oracle — a live
replay, not a golden file.

Model (the vendored counts in ``lookups/lm_bigram.json`` are produced
by the deterministic ``scripts/gen_lm_model.py``; regeneration
byte-identity is tested):

* ``p_u(w)      = (cu[j_u(w)] + 0.5) / (C + 0.5 * U)``  (add-half over
  the hashed unigram space — every bucket has positive mass);
* ``p_ml(w2|w1) = min(cb[j_b(w1,w2)] / cu[j_u(w1)], 1)`` (0 when the
  context bucket is unseen; the ``min`` bounds hash-collision overflow);
* ``p(w2|w1)    = 0.7 * p_ml + 0.3 * p_u(w2)``  — strictly in (0, 1);
* doc score     = ``sum(log10 p)`` over position 0 (unigram) plus all
  adjacent bigrams; ``perplexity = 10 ** (-sum / n_tokens)``.

Scale shape: map-only, ZERO shuffle. The two count arrays (~160 KB)
reach executors once as a broadcast single-row cross join (the
mentions-Bloom pattern — array literals of this size would bloat every
codegen unit). Per-row cost is ~3 md5 calls per token, all inside
whole-stage codegen; at 100 TB this stage is embarrassingly parallel
and bounded by scan throughput, exactly like ``quality_model_score``.

Cross-engine float parity (the quality-model recipe): interpolated
probabilities are pure rational arithmetic on identical doubles and are
rounded to 12 decimals BEFORE the per-position ``log10`` (so both
engines take log10 of the same double), each log10 is rounded to 7,
the ordered in-row fold sums identical addends in identical order, the
document sum is rounded to 6, and the single boundary ``pow(10, -x)``
is rounded to ``round_n``.
"""

import json
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CU_COL = "__lm_cu"
_CB_COL = "__lm_cb"


@lru_cache(maxsize=1)
def load_model() -> dict:
    from importlib import resources

    return json.loads(
        resources.files("esmarc_spark.lookups")
        .joinpath("lm_bigram.json")
        .read_text()
    )


def _bucket(s: Column, salt: str, width: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(s, F.lit(salt))), 1, 15), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(width)).cast("int")


def _p_uni(tok: Column, model: dict) -> Column:
    j = _bucket(tok, model["salt_u"], model["u_width"])
    denom = model["total"] + 0.5 * model["u_width"]
    cu = F.element_at(F.col(_CU_COL), j + 1).cast("double")
    return (cu + F.lit(0.5)) / F.lit(denom)


def _lp_bigram(w1: Column, w2: Column, model: dict) -> Column:
    lam = model["lambda"]
    jb = _bucket(
        F.concat(w1, F.lit(" "), w2), model["salt_b"], model["b_width"]
    )
    jc = _bucket(w1, model["salt_u"], model["u_width"])
    cu_ctx = F.element_at(F.col(_CU_COL), jc + 1).cast("double")
    cb = F.element_at(F.col(_CB_COL), jb + 1).cast("double")
    p_ml = F.when(
        cu_ctx > 0, F.least(cb / cu_ctx, F.lit(1.0))
    ).otherwise(F.lit(0.0))
    q = F.round(F.lit(lam) * p_ml + F.lit(1.0 - lam) * _p_uni(w2, model), 12)
    return F.round(F.log10(q), 7)


def lm_perplexity(
    documents: DataFrame, text: str = "text", round_n: int = 3
) -> DataFrame:
    """Input columns + ``lm_logprob10`` (sum of log10 probabilities,
    rounded to 6) and ``lm_perplexity`` (rounded to ``round_n``).
    Null/empty/whitespace-only text -> null score columns. Lower
    perplexity = closer to the vendored in-domain distribution."""
    model = load_model()
    spark = documents.sparkSession
    mdf = spark.createDataFrame(
        [(model["cu"], model["cb"])],
        f"{_CU_COL} array<bigint>, {_CB_COL} array<bigint>",
    )
    toks = F.filter(
        F.split(F.lower(F.col(text)), " "), lambda t: t != ""
    )
    n = F.size(toks)
    tail_len = F.greatest(n - 1, F.lit(0))
    lps = F.zip_with(
        F.slice(toks, 1, tail_len),
        F.slice(toks, 2, tail_len),
        lambda a, b: _lp_bigram(a, b, model),
    )
    head = F.round(
        F.log10(F.round(_p_uni(F.element_at(toks, 1), model), 12)), 7
    )
    lp_sum = F.round(
        head + F.aggregate(lps, F.lit(0.0), lambda acc, x: acc + x), 6
    )
    out = documents.crossJoin(F.broadcast(mdf))
    valid = F.col(text).isNotNull() & (n > 0)
    out = out.withColumn(
        "lm_logprob10", F.when(valid, lp_sum)
    ).withColumn(
        "lm_perplexity",
        F.when(
            valid,
            F.round(F.pow(F.lit(10.0), -F.col("lm_logprob10") / n), round_n),
        ),
    )
    return out.drop(_CU_COL, _CB_COL)


def lm_perplexity_sql(
    source_select: str, text: str = "text", round_n: int = 3
) -> str:
    """DuckDB oracle: the IDENTICAL hashing, interpolation, rounding
    ladder, and ordered fold (count arrays inlined as literal lists —
    fine in a one-shot oracle query)."""
    model = load_model()
    u_w, b_w = model["u_width"], model["b_width"]
    s_u, s_b = model["salt_u"], model["salt_b"]
    lam = model["lambda"]
    denom = model["total"] + 0.5 * u_w
    cu = "[" + ", ".join(str(v) for v in model["cu"]) + "]"
    cb = "[" + ", ".join(str(v) for v in model["cb"]) + "]"

    def bkt(expr: str, salt: str, width: int) -> str:
        return (
            f"cast(cast('0x' || substr(md5({expr} || '{salt}'), 1, 15) "
            f"AS bigint) % {width} AS int)"
        )

    p_uni = (
        f"(cast(cu[1 + {bkt('{W}', s_u, u_w)}] AS double) + 0.5) / {denom!r}"
    )
    lp_bi = f"""round(log10(round(
        {lam} * (CASE WHEN cu[1 + {bkt('toks[i]', s_u, u_w)}] > 0
           THEN least(cast(cb[1 + {bkt("toks[i] || ' ' || toks[i+1]", s_b, b_w)}] AS double)
                      / cast(cu[1 + {bkt('toks[i]', s_u, u_w)}] AS double), 1.0)
           ELSE 0.0 END)
        + {1.0 - lam} * {p_uni.replace('{W}', 'toks[i+1]')}, 12)), 7)"""
    head = f"round(log10(round({p_uni.replace('{W}', 'toks[1]')}, 12)), 7)"
    return f"""
WITH src AS ({source_select}),
m AS (SELECT {cu}::BIGINT[] AS cu, {cb}::BIGINT[] AS cb),
t AS (
  SELECT src.*, list_filter(string_split(lower({text}), ' '), x -> x <> '') AS toks
  FROM src
),
s AS (
  SELECT t.*, CASE WHEN {text} IS NULL OR len(toks) = 0 THEN NULL ELSE
    -- coalesce: DuckDB list_sum([]) is NULL, Spark's empty fold is 0.0
    round({head} + coalesce(list_sum(list_transform(
        range(1, len(toks)), i -> {lp_bi})), 0), 6)
  END AS lm_logprob10
  FROM t, m
)
SELECT * EXCLUDE (toks),
       CASE WHEN lm_logprob10 IS NULL THEN NULL ELSE
         round(pow(10.0, -lm_logprob10 / len(toks)), {round_n})
       END AS lm_perplexity
FROM s
"""
