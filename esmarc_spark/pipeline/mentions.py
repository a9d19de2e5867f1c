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
