"""S5 — materialize (subj, pred, obj) JSON-LD triples from linked mentions.

Emitted graph (reference-parity vocabulary — mentions / sameAs / @type /
preferredName, cf. /root/reference/esmarc/esmarc.py:39-237 + id.py:40-50):

  page node   subj = url
      (url, "@type", "http://schema.org/CreativeWork")
      (url, "mentions", <entity @id>)            one per detected mention
      (url, "isBasedOn", <source partition uri>) provenance
  entity node subj = minted "{TARGET_ID}{entity_type}/{authority_id}"
      (entity, "@type", schema.org class)
      (entity, "sameAs", canonical authority URI) the linking edge
      (entity, "preferredName", deterministic min surface form)

All shapes are pure DataFrame expressions; the only aggregation
(preferredName) is a min() — skew-immune partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esmarc_spark.lookups.dims import TARGET_ID

TRIPLE_SCHEMA = "subj string, pred string, obj string"

_SCHEMA_CLASS = {
    "persons": "http://schema.org/Person",
    "organizations": "http://schema.org/Organization",
    "geo": "http://schema.org/Place",
    "topics": "http://schema.org/Thing",
    "works": "http://schema.org/CreativeWork",
    "events": "http://schema.org/Event",
    "resources": "http://schema.org/CreativeWork",
}


def entity_id_col() -> F.Column:
    return F.concat(
        F.lit(TARGET_ID), F.col("entity_type"), F.lit("/"), F.col("authority_id")
    )


def _fan_out(
    rel: DataFrame, subj: F.Column, shapes: list[tuple], keys: tuple = ()
) -> DataFrame:
    """Scan an aggregated relation ONCE and fan its triple shapes out via
    an in-row explode — per-shape selects would re-run the distinct /
    groupBy shuffle once per shape (measured: 6 scans + 5 shuffles for
    the same triple set). ``keys`` rides extra partition columns through."""
    po = F.explode(
        F.array(
            *[
                F.struct(F.lit(pred).alias("pred"), obj.alias("obj"))
                for pred, obj in shapes
            ]
        )
    )
    return rel.select(*keys, subj.alias("subj"), po.alias("_po")).select(
        *keys, "subj", F.col("_po.pred").alias("pred"), F.col("_po.obj").alias("obj")
    )


def _schema_class_map() -> F.Column:
    return F.create_map(*[F.lit(x) for kv in _SCHEMA_CLASS.items() for x in kv])


def linked_to_triples(linked: DataFrame, source_index: str = "webtext") -> DataFrame:
    """Linked mention rows -> the full triple set (union of typed shapes).

    One partial-agg pass collapses the linked mention rows to the
    distinct (url, entity) relation — carrying the per-pair min surface
    so the entity aggregate derives from it without a second pass (min
    of per-url mins == global min) — and the lazy localCheckpoint
    materializes THAT small relation once for the three consumers.  The
    round-7 shape checkpointed the full linked set (all 7 columns, one
    row per mention occurrence) and re-shuffled it three times: a url
    distinct, a (url, entity) distinct, and the entity groupBy.  The
    mention shape now needs no distinct at all (the groupBy keys are
    exactly its output grain; canonical_url is functionally dependent on
    (entity_type, authority_id) — the same dependency the round-4 "no
    outer distinct" argument below already relies on).  Batch-only
    caller — streaming builds its shapes directly in
    streaming.stream_page_triples."""
    pairs = (
        linked.groupBy("url", "entity_type", "authority_id", "canonical_url")
        .agg(F.min("surface_form").alias("_s"))
        .localCheckpoint(eager=False)
    )
    entity_id = entity_id_col()

    page_shapes = _fan_out(
        pairs.select("url").distinct(),
        F.col("url"),
        [
            ("@type", F.lit("http://schema.org/CreativeWork")),
            (
                "isBasedOn",
                F.concat(F.lit(f"{TARGET_ID}source/{source_index}/"), F.col("url")),
            ),
        ],
    )
    page_mentions = pairs.select(
        F.col("url").alias("subj"),
        F.lit("mentions").alias("pred"),
        entity_id.alias("obj"),
    )
    entity_shapes = _fan_out(
        pairs.groupBy("entity_type", "authority_id", "canonical_url").agg(
            F.min("_s").alias("preferred_name")
        ),
        entity_id,
        [
            ("@type", _schema_class_map()[F.col("entity_type")]),
            ("sameAs", F.col("canonical_url")),
            ("preferredName", F.col("preferred_name")),
        ],
    )

    # no outer distinct: every shape is internally distinct (pages are
    # unique, page_mentions deduped, entity shapes come out of a groupBy)
    # and the shapes can't collide across the union (disjoint pred/subj
    # combinations) — a global distinct here would shuffle every triple for
    # nothing, which at 10^12 docs is the single biggest avoidable shuffle.
    return page_shapes.unionAll(page_mentions).unionAll(entity_shapes)


def linked_to_triples_partitioned(linked: DataFrame) -> DataFrame:
    """Per-day triple emission for the single-job backfill (round 5 —
    VERDICT r4 #3): ``linked`` carries a ``pday`` column, and every
    aggregation/distinct is additionally keyed by it, so the output is
    byte-identical, day by day, to running ``linked_to_triples(part,
    source_index=pday)`` once per day — but as ONE Spark job over all
    pending days instead of a serialized driver loop. Output columns:
    (pday, subj, pred, obj).

    Scale note: pday joins every shuffle key, so a hot day cannot
    collapse the backfill into one reducer any worse than the per-day
    loop could — and AQE still splits skewed (pday, entity) buckets.

    Same one-pass collapse as ``linked_to_triples`` (round 8): the
    checkpoint holds the small (pday, url, entity) aggregate, not the
    full per-occurrence linked set, and the mention shape needs no
    distinct (the groupBy grain IS its output grain)."""
    pairs = (
        linked.groupBy(
            "pday", "url", "entity_type", "authority_id", "canonical_url"
        )
        .agg(F.min("surface_form").alias("_s"))
        .localCheckpoint(eager=False)
    )
    entity_id = entity_id_col()
    keys = ("pday",)

    page_shapes = _fan_out(
        pairs.select("pday", "url").distinct(),
        F.col("url"),
        [
            ("@type", F.lit("http://schema.org/CreativeWork")),
            (
                "isBasedOn",
                F.concat(
                    F.lit(f"{TARGET_ID}source/"),
                    F.col("pday"),
                    F.lit("/"),
                    F.col("url"),
                ),
            ),
        ],
        keys=keys,
    )
    page_mentions = pairs.select(
        F.col("pday"),
        F.col("url").alias("subj"),
        F.lit("mentions").alias("pred"),
        entity_id.alias("obj"),
    )
    entity_shapes = _fan_out(
        pairs.groupBy("pday", "entity_type", "authority_id", "canonical_url").agg(
            F.min("_s").alias("preferred_name")
        ),
        entity_id,
        [
            ("@type", _schema_class_map()[F.col("entity_type")]),
            ("sameAs", F.col("canonical_url")),
            ("preferredName", F.col("preferred_name")),
        ],
        keys=keys,
    )
    return page_shapes.unionAll(page_mentions).unionAll(entity_shapes)


def sink_triples(
    triples: DataFrame,
    target: str,
    fmt: str = "parquet",
    partition_col: str | None = "pday",
    mode: str = "append",
) -> None:
    """Materialize the triple set (north_star: 'emits (subj, pred, obj)
    JSON-LD triples to Iceberg').

    fmt="iceberg": DataSourceV2 ``writeTo(<catalog.table>)`` append —
    requires an Iceberg catalog on the session (spark.sql.catalog.* +
    iceberg-spark-runtime jars; not present in this sandbox, and the v1
    session catalog rejects DataFrameWriterV2 writes, so the branch is
    executed on real clusters only — its wiring is syntax-verified with
    a mocked catalog in tests/test_sinks.py). Idempotent re-runs use
    ``overwritePartitions()`` instead of append.

    fmt="parquet" (the sandbox stand-in and the tested path): partitioned
    parquet with dynamic partition overwrite — operationally equivalent
    semantics (partition-atomic replace) without the catalog."""
    if fmt == "iceberg":
        w = triples.writeTo(target)
        if mode == "overwrite_partitions":
            w.overwritePartitions()
        else:
            w.append()
        return
    writer = triples.write.mode(
        "overwrite" if mode == "overwrite_partitions" else mode
    )
    if partition_col and partition_col in triples.columns:
        spark = triples.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        writer = writer.partitionBy(partition_col)
    writer.parquet(target)
