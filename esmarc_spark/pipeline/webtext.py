"""Deterministic synthetic webtext (FIXTURES.md §1) + the linking gazetteer.

The webtext table has exactly the BASELINE.json input_hint shape:
    url string, warc_ts timestamp, html binary, text string, lang string

Everything is generated *inside Spark* from ``spark.range`` — no driver-side
row lists — so the same generator scales from 100 rows (tests) to 10^8+
(bench) without touching the driver. Determinism comes from keying every
random choice off the row id via xxhash64, never off RNG state or time.

Generated properties (all exercised by tests):
  * known gazetteer surface forms embedded at known positions -> expected
    mentions are computable exactly;
  * a Zipf-skewed head entity ("Germany") in ~30% of docs -> skew-join test;
  * duplicate urls across partitions -> dedup test;
  * html-only rows, text-only rows, and rows with both -> S1 byte-identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (surface_form, entity_type, authority_prefix, authority_id) — the
# broadcast-dictionary gazetteer (reference analogue: the lookup_sameAs dim +
# fixture entity names; see /root/reference/esmarc/lookup_tables/sameAs.py).
GAZETTEER_ROWS = [
    # geo — incl. the Zipf head entity and a synonym pair (Cologne/Köln)
    ("Germany", "geo", "(DE-588)", "4011882-4"),
    ("Deutschland", "geo", "(DE-588)", "4011882-4"),
    ("Dresden", "geo", "(DE-588)", "4012995-0"),
    ("Leipzig", "geo", "(DE-588)", "4035206-7"),
    ("Frankfurt am Main", "geo", "(DE-588)", "4018118-2"),
    ("Augsburg", "geo", "(DE-588)", "4003614-5"),
    ("Cologne", "geo", "(DE-588)", "4031483-2"),
    ("Köln", "geo", "(DE-588)", "4031483-2"),
    ("Saxony", "geo", "(DE-588)", "4051176-5"),
    ("Berlin", "geo", "(DE-588)", "4005728-8"),
    # persons
    ("Johann Sebastian Bach", "persons", "(DE-588)", "118505556"),
    ("Martin Luther", "persons", "(DE-588)", "118575449"),
    ("Herbert Immenkoetter", "persons", "(DE-588)", "107891174"),
    ("Maria Maddalena", "persons", "(DE-588)", "119188287"),
    # organizations
    ("Catholic Church", "organizations", "(DE-588)", "1013418-8"),
    ("Saxon State Library", "organizations", "(DE-588)", "4519974-7"),
    ("Leipzig University", "organizations", "(DE-588)", "2024343-1"),
    ("Carmelites", "organizations", "(DE-588)", "4163341-6"),
    # topics
    ("Reformation", "topics", "(DE-588)", "4049037-7"),
    ("Monasticism", "topics", "(DE-588)", "4074927-7"),
    ("Church history", "topics", "(DE-588)", "4031575-7"),
    ("Baroque music", "topics", "(DE-588)", "4004885-1"),
    # works
    ("Mass in B minor", "works", "(DE-588)", "300009805"),
    # events
    ("Council of Trent", "events", "(DE-588)", "2025142-2"),
    # ambiguity test: one surface form, two candidate ids (kept both)
    ("Georgia", "geo", "(DE-588)", "4019803-3"),
    ("Georgia", "geo", "(DE-588)", "4156644-0"),
]

# filler vocabulary — never collides with a surface form
_FILLER = [
    "archive", "record", "page", "crawl", "index", "corpus", "study",
    "history", "report", "notes", "volume", "edition", "series", "chapter",
]


def gazetteer_df(spark: SparkSession) -> DataFrame:
    """Gazetteer dim with resolved canonical urls (authority_uri semantics:
    /root/reference/esmarc/id.py:7-37)."""
    from esmarc_spark.lookups.dims import AUTHORITY_PREFIXES

    rows = [
        (
            surface,
            entity_type,
            prefix,
            auth_id,
            AUTHORITY_PREFIXES[prefix]["@id"] + auth_id.upper(),
        )
        for surface, entity_type, prefix, auth_id in GAZETTEER_ROWS
    ]
    # JVM LocalRelation (VALUES) instead of createDataFrame: the latter
    # plans as a Python-RDD scan that re-enters Python inside every
    # broadcast build of the S2/S3 joins (measured ~0.4s per execution,
    # round 8). The dim is trusted static data with no quotes/backslashes
    # (asserted) so the literal rendering is safe.
    assert all(
        "'" not in v and "\\" not in v for r in rows for v in r
    ), "gazetteer values must not contain quotes/backslashes"
    values = ", ".join(
        "(" + ", ".join(f"'{v}'" for v in r) + ")" for r in rows
    )
    return spark.sql(
        f"SELECT * FROM (VALUES {values}) AS gaz(surface_form, entity_type,"
        " authority_prefix, authority_id, canonical_url)"
    )


def synth_webtext(
    spark: SparkSession,
    n_docs: int = 1000,
    partitions: int | None = None,
    dup_fraction: float = 0.02,
    seed: int = 42,
) -> DataFrame:
    """Deterministic webtext DataFrame of n_docs rows (plus ~dup_fraction
    duplicated urls). Pure Spark expressions; no Python in the plan."""
    n_surfaces = len(GAZETTEER_ROWS)
    surfaces = F.array(*[F.lit(s) for s, _, _, _ in GAZETTEER_ROWS])
    fillers = F.array(*[F.lit(w) for w in _FILLER])

    def h(col, salt: int):
        return F.abs(F.xxhash64(col, F.lit(seed), F.lit(salt)))

    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    # pick 2 distinct surface forms per doc + the Zipf head in ~30% of docs
    s1 = F.element_at(surfaces, (h(i, 1) % n_surfaces + 1).cast("int"))
    s2 = F.element_at(surfaces, (h(i, 2) % n_surfaces + 1).cast("int"))
    f1 = F.element_at(fillers, (h(i, 3) % len(_FILLER) + 1).cast("int"))
    f2 = F.element_at(fillers, (h(i, 4) % len(_FILLER) + 1).cast("int"))
    f3 = F.element_at(fillers, (h(i, 5) % len(_FILLER) + 1).cast("int"))
    zipf_head = F.when(h(i, 6) % 10 < 3, F.lit(" Germany ")).otherwise(F.lit(" "))

    text = F.concat(
        f1, F.lit(" "), s1, F.lit(" "), f2, zipf_head, f3, F.lit(" "), s2, F.lit("."),
    )
    html = F.concat(
        F.lit("<html><head><title>doc</title></head><body><p>"),
        f1, F.lit(" "), s1, F.lit(" "), f2, zipf_head, f3, F.lit(" "), s2,
        F.lit(".</p></body></html>"),
    )
    # html-only (text null) for 1/3, text-only (html null) 1/3, both 1/3
    mode = (h(i, 7) % 3).cast("int")
    df = df.select(
        F.concat(F.lit("https://example.org/page/"), i.cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + (i % 86400) * 60).alias("warc_ts"),
        F.when(mode != 1, F.encode(html, "UTF-8")).alias("html"),
        F.when(mode != 0, text).alias("text"),
        F.when(h(i, 8) % 10 < 7, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
    )
    if dup_fraction > 0:
        n_dups = max(1, int(n_docs * dup_fraction))
        dups = df.orderBy("url").limit(n_dups)
        df = df.unionAll(dups)
    return df
