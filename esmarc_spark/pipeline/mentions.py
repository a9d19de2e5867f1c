"""S2 — gazetteer mention detection over text, in Arrow batches.

Semantics analogue: the reference's get_mentions builds typed mention nodes
from already-structured 6xx fields (/root/reference/esmarc/classifications.py:54-152);
over webtext the structure is gone, so the detector finds gazetteer surface
forms in free text and S3 re-attaches the typed node via a broadcast join.

Two interchangeable physical strategies:

* ``detect_mentions`` — one compiled alternation regex (longest-match-first,
  word-boundary anchored) applied per Arrow batch in a pandas UDF. Scales
  with gazetteer size ~10^5 surface forms; the pattern ships to executors
  once per task via closure capture (Spark broadcasts the serialized UDF).
  Handles multi-word surface forms ("Frankfurt am Main").

* ``detect_mentions_tokenized`` — pure-JVM path: split/explode/join. No
  Python at all, but single-token surface forms only. Used as the
  cross-engine oracle (its plan is directly expressible in ANSI SQL).

Both return one row per mention occurrence:
    url, surface_form, position (0-based char offset), lang
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MENTIONS_SCHEMA = "url string, surface_form string, position long, lang string"


def _compile_pattern(surface_forms: list[str]) -> re.Pattern:
    # longest first so "Frankfurt am Main" wins over "Frankfurt"
    ordered = sorted(set(surface_forms), key=lambda s: (-len(s), s))
    body = "|".join(re.escape(s) for s in ordered)
    return re.compile(rf"(?<!\w)(?:{body})(?!\w)")


def detect_mentions(webtext: DataFrame, surface_forms: list[str]) -> DataFrame:
    """Pandas-UDF scan: (url, text, lang) -> exploded mention rows."""
    pattern = _compile_pattern(surface_forms)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, surfaces, positions, langs = [], [], [], []
            for url, text, lang in zip(pdf["url"], pdf["text"], pdf["lang"]):
                if not text:
                    continue
                for m in pattern.finditer(text):
                    urls.append(url)
                    surfaces.append(m.group(0))
                    positions.append(m.start())
                    langs.append(lang)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="object"),
                    "surface_form": pd.Series(surfaces, dtype="object"),
                    "position": pd.Series(positions, dtype="int64"),
                    "lang": pd.Series(langs, dtype="object"),
                }
            )

    return webtext.select("url", "text", "lang").mapInPandas(
        scan, schema=MENTIONS_SCHEMA
    )


def detect_mentions_ngram(
    webtext: DataFrame,
    gazetteer: DataFrame,
    max_n: int | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """JVM-only multi-word gazetteer scan: token n-grams ⋈ broadcast(surfaces).

    The production hot path (input_hint: no Python in the hot path): tokens
    come from split(), n-grams for every length present in the gazetteer are
    built with pure array expressions, posexplode fans them out, and the
    broadcast join never shuffles the corpus. Longest-match-first overlap
    semantics are enforced afterwards: an n-gram match starting inside a
    longer match at the same or earlier position is kept (both reported) —
    only *nested* shorter matches of the SAME span start are suppressed via
    the greatest-length-per-start rule.

    position = token index of the first token of the match.
    """
    surfaces = [r["surface_form"] for r in gazetteer.select("surface_form").distinct().collect()]
    lengths = sorted({len(s.split(" ")) for s in surfaces})
    if max_n is not None:
        lengths = [n for n in lengths if n <= max_n]

    toks = F.split(F.regexp_replace(F.col("text"), r"(^\W+|\W+$)", ""), " ")
    clean = F.transform(toks, lambda t: F.regexp_replace(t, r"(^\W+|\W+$)", ""))
    base = webtext.where(F.col("text").isNotNull()).select(
        "url", "lang", *extra_cols, clean.alias("_toks")
    )

    # anchor-first candidate generation, all inside array expressions:
    #  1. anchors = token positions whose token can START some surface form
    #     (one cheap isin over the raw tokens — no string concatenation);
    #  2. n-grams are built ONLY at anchor positions (~a few per doc instead
    #     of every position x every length — at 10^12 docs the difference
    #     between allocating ~100 concat strings per doc and ~5);
    #  3. candidates = anchor grams that equal a full surface form.
    surface_set = sorted(set(surfaces))
    anchor_tokens = sorted({s.split(" ")[0] for s in surface_set})
    # NOTE for >10^4-surface gazetteers: swap both isin literal sets for
    # bloom filters (false positives then removed by the broadcast join).
    arr = F.col("_toks")
    size = F.size(arr)
    positions = F.when(size >= 1, F.sequence(F.lit(1), size)).otherwise(
        F.array().cast("array<int>")
    )
    anchors = F.filter(
        positions, lambda i: F.element_at(arr, i).isin(*anchor_tokens)
    )

    def gram_at(i, n: int) -> F.Column:
        gram = F.concat_ws(
            " ", *[F.element_at(arr, (i + j).cast("int")) for j in range(n)]
        )
        return F.when(
            size - (i - 1) >= n,
            F.struct(
                (i - 1).cast("long").alias("position"),
                F.lit(n).alias("n_toks"),
                gram.alias("surface_form"),
            ),
        )

    anchor_grams = F.flatten(
        F.transform(anchors, lambda i: F.array(*[gram_at(i, n) for n in lengths]))
    )
    candidates = F.filter(
        anchor_grams,
        lambda g: g.isNotNull() & g.surface_form.isin(*surface_set),
    )

    # exact leftmost-longest (regex finditer) semantics, computed per doc
    # inside the array: sort candidates by (position asc, length desc) and
    # fold with a consumed-until cursor — a match is kept iff it starts at
    # or after the end of the previously kept match. Chains resolve exactly
    # like the sequential scanner; no suppression shuffle is needed at all.
    ordered = F.array_sort(
        candidates,
        lambda a, b: F.when(a.position < b.position, F.lit(-1))
        .when(a.position > b.position, F.lit(1))
        .when(a.n_toks > b.n_toks, F.lit(-1))
        .when(a.n_toks < b.n_toks, F.lit(1))
        .otherwise(F.lit(0)),
    )
    empty_kept = F.array().cast(
        "array<struct<position:bigint,n_toks:int,surface_form:string>>"
    )
    folded = F.aggregate(
        ordered,
        F.struct(F.lit(-1).cast("long").alias("consumed"), empty_kept.alias("kept")),
        lambda acc, g: F.when(
            g.position >= acc.consumed,
            F.struct(
                (g.position + g.n_toks).cast("long").alias("consumed"),
                F.concat(acc.kept, F.array(g)).alias("kept"),
            ),
        ).otherwise(acc),
        lambda acc: acc.kept,
    )
    matches = base.select(
        "url", "lang", *extra_cols, F.explode(folded).alias("g")
    ).select(
        F.col("g.surface_form").alias("surface_form"),
        "url",
        F.col("g.position").alias("position"),
        "lang",
        *extra_cols,
    )
    # broadcast join keeps the contract uniform with the other detectors
    # (and, with a bloom-filtered candidate set, removes false positives)
    surf_df = gazetteer.select("surface_form").distinct()
    return matches.join(F.broadcast(surf_df), "surface_form").select(
        "url", "surface_form", "position", "lang", *extra_cols
    )


def detect_mentions_tokenized(webtext: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """JVM-only token path: posexplode(split(text)) ⋈ broadcast(gazetteer).

    The whole plan stays in whole-stage codegen; the broadcast join never
    shuffles the fact side. Punctuation is stripped from token edges so
    sentence-final forms still match.
    """
    tokens = webtext.select(
        "url",
        "lang",
        F.posexplode(F.split(F.col("text"), " ")).alias("position", "raw_token"),
    ).withColumn("token", F.regexp_replace("raw_token", r"^\W+|\W+$", ""))
    surfaces = gazetteer.select("surface_form").distinct()
    return (
        tokens.join(
            F.broadcast(surfaces), tokens.token == surfaces.surface_form, "inner"
        )
        .select("url", "surface_form", F.col("position").cast("long"), "lang")
    )
