"""Distributed BPE tokenizer TRAINING — pair statistics and merge
learning over the corpus word distribution.

``ops.bpe`` ENCODES with a vendored, already-trained merge table; this
module is the other half: learning merges from data. The classic
algorithm (Sennrich et al. 2016) iterates: count adjacent symbol pairs
weighted by word frequency, merge the most frequent pair everywhere,
repeat. The expensive part at 100 TB is exactly one aggregation:

  corpus -> (word, n) counts        one shuffle, partial-agged, output
                                    bounded by vocabulary (~10^7), not
                                    corpus size — after this, training
                                    never touches the corpus again;
  per round: pair counts over the   groupBy on the vocab-sized word
  word relation + one argmax        relation; the argmax is a 1-row
                                    driver scalar (bounded, like the
                                    repo's other lineage scalars);
  merge application                 map-only string replace over the
                                    word relation, checkpointed per
                                    round (the iterative-lineage
                                    recipe from ops.linkgraph).

Symbols travel as a space-separated string (`` t h e ``); "merge
pair (a,b)" is a left-to-right non-overlapping regex replace whose
trailing symbol boundary is a LOOKAHEAD (see ``train_merges``) — the
exact BPE convention. The pair-statistics SQL is engine-shared; the
merge application is Spark-side Java regex (RE2/DuckDB has no
lookahead), so the trainer is pytest-verified against an independent
sequential reference instead of a SQL oracle.
Symbols here are CHARACTERS of the portable whitespace tokenizer's
words (the oracle-friendly demonstration grain); the vendored
production encoder (``ops.bpe``) is byte-level — a byte-grain trainer
only changes the symbolize step.

Determinism: ties on pair count break by pair string ascending, so the
learned merge sequence is a pure function of the corpus in any engine
or partitioning.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SYMBOLIZE = "trim(regexp_replace({word}, '(.)', '$1 '))"
_PAIRS = """
CASE WHEN size({a}) >= 2
     THEN transform(sequence(1, size({a}) - 1),
                    i -> concat(element_at({a}, i), ' ', element_at({a}, i + 1)))
     ELSE array()
END"""


def word_counts(documents: DataFrame, text: str = "text") -> DataFrame:
    """(word, n): the corpus word distribution — the ONLY corpus-sized
    aggregation of BPE training (whitespace grain, matching the repo's
    portable token counts; empty tokens from repeated spaces drop)."""
    return (
        documents.select(
            F.explode(F.split(F.col(text), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def pair_counts(words: DataFrame, top: int | None = None) -> DataFrame:
    """(pair, n_pair): adjacent-symbol pair frequencies weighted by word
    count — one BPE training round's statistics. ``words`` holds
    (word, n) where ``word`` is either a raw word or an already-merged
    symbol string. With ``top``, returns the k most frequent pairs
    (count desc, pair asc — a TakeOrdered, no global sort)."""
    arr = "split(_s, ' ')"
    out = (
        words.select(
            F.expr(_SYMBOLIZE.format(word="word")).alias("_s"), "n"
        )
        .select(F.expr(_PAIRS.format(a=arr)).alias("_pairs"), "n")
        .select(F.explode("_pairs").alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("n_pair"))
    )
    if top is not None:
        out = out.orderBy(F.col("n_pair").desc(), F.col("pair").asc()).limit(top)
    return out


def _sym_pair_counts(sym_words: DataFrame) -> DataFrame:
    """Pair counts over an ALREADY-symbolized (_s, n) relation."""
    arr = "split(trim(_s), ' ')"
    return (
        sym_words.select(F.expr(_PAIRS.format(a=arr)).alias("_pairs"), "n")
        .select(F.explode("_pairs").alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("n_pair"))
    )


def train_merges(
    words: DataFrame, k: int, min_count: int = 1
) -> list[tuple[str, str, int]]:
    """Learn ``k`` merges: [(left, right, count), ...] in merge order.
    Per round: one aggregation over the vocab-sized symbol relation, a
    1-row argmax collect, a map-only replace, an eager checkpoint (the
    two-reads-per-step iterative-lineage rule). Stops early when no
    pair reaches ``min_count``."""
    sym = words.select(
        F.concat(
            F.lit(" "), F.expr(_SYMBOLIZE.format(word="word")), F.lit(" ")
        ).alias("_s"),
        "n",
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(k):
        best = (
            _sym_pair_counts(sym)
            .orderBy(F.col("n_pair").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["n_pair"] < min_count:
            break
        pair, n_pair = best[0]["pair"], int(best[0]["n_pair"])
        left, right = pair.split(" ")
        merges.append((left, right, n_pair))
        # left-to-right non-overlapping == the BPE merge rule. The
        # trailing symbol boundary must be a LOOKAHEAD, not part of the
        # match: a consumed trailing space would break back-to-back
        # merges in runs (" a a a a " must become " aa aa ", and a plain
        # replace of " a a " yields " aa a a " because the second pair
        # lost its leading space to the first match)
        pat = f" {_re.escape(left)} {_re.escape(right)}(?= )"
        rep = " " + (left + right).replace("\\", "\\\\").replace("$", "\\$")
        sym = sym.select(
            F.regexp_replace("_s", pat, rep).alias("_s"), "n"
        ).localCheckpoint(eager=True)
    return merges


def pair_counts_sql(docs_select: str, top: int, text: str = "text") -> str:
    """DuckDB oracle for ``pair_counts(word_counts(docs), top)``: the
    identical word counts, symbolization, adjacent pairs, and ordered
    limit (range(1, len) is [1, len) — exactly the pair starts)."""
    return f"""
WITH _d AS ({docs_select}),
_w AS (SELECT unnest(string_split({text}, ' ')) AS word FROM _d),
_wc AS (SELECT word, COUNT(*) AS n FROM _w WHERE word <> '' GROUP BY 1),
_sym AS (SELECT string_split(trim(regexp_replace(word, '(.)', '\\1 ', 'g')), ' ') AS a, n
         FROM _wc),
_p AS (SELECT unnest(list_transform(range(1, len(a)),
                     i -> a[i] || ' ' || a[i + 1])) AS pair, n
       FROM _sym)
SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pair
FROM _p GROUP BY 1
ORDER BY n_pair DESC, pair ASC
LIMIT {top}
"""
